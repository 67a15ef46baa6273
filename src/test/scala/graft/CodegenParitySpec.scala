package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Every custom expression with a doGenCode must produce byte-identical
  * results on the interpreted path — a silent divergence would pass unit
  * tests (which run whichever path Spark picks) while corrupting results
  * under codegen fallback, or vice versa. This spec runs the
  * sketch-bearing queries under both factory modes and diffs. */
class CodegenParitySpec extends SparkSpec {

  private def interpreted[A](f: => A): A = {
    val ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val fm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try f finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }

  test("codegen and interpreted paths agree on every sketch query") {
    val names = Seq("q_dedup_minhash_lsh", "q_dedup_simhash",
      "q_dedup_embedding_lsh", "q_similarity_lsh", "q_similarity_ivf",
      "q_doc_winnow", "q_doc_fingerprint", "q_tfidf", "q_sql_fn")
    for (n <- names) {
      val gen = Queries.all(n)(spark, sfDir).collect().toSeq
      val interp = interpreted(Queries.all(n)(spark, sfDir).collect().toSeq)
      assert(gen == interp, s"$n diverges between codegen and interpreted")
    }
  }

  test("JaccardShingles matches the SQL array formulation incl. edge cases") {
    import spark.implicits._
    val cases = Seq(
      ("the quick brown fox jumps over the lazy dog", "the quick brown fox leaps over the lazy dog"),
      ("a b c", "a b c"),
      ("a  b  c d", "a  b c  d"), // double spaces produce empty tokens
      ("x y z w x y z w x y z w", "x y z w"), // duplicate shingles
      ("one two", "one two three"), // left side below n=3 → null
    )
    val df = cases.toDF("ta", "tb")
    val fused = df.select(Sketches.jaccardShingles($"ta", $"tb", 3)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    def sh(c: String) =
      s"""array_distinct(transform(sequence(0, size(split($c, ' '))-3), i ->
         |  concat_ws(' ', split($c, ' ')[i], split($c, ' ')[i+1], split($c, ' ')[i+2])))""".stripMargin
    val sql = df
      .filter(expr("size(split(ta, ' ')) >= 3 and size(split(tb, ' ')) >= 3"))
      .select(expr(
        s"cast(size(array_intersect(${sh("ta")}, ${sh("tb")})) as double) / " +
          s"size(array_union(${sh("ta")}, ${sh("tb")}))")).collect()
      .map(_.getDouble(0))
    assert(fused.takeWhile(_ != null).toSeq == sql.toSeq, s"${fused.toSeq} vs ${sql.toSeq}")
    assert(fused.last == null, "below-n text must yield null")
  }
}
