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
      "q_similarity_pq", "q_doc_winnow", "q_doc_fingerprint", "q_tfidf",
      "q_sql_fn", "q_dedup_chunks_cdc", "q_dedup_substrings", "q_doc_entropy",
      "q_doc_repetition")
    for (n <- names) {
      val gen = Queries.all(n)(spark, sfDir).collect().toSeq
      val interp = interpreted(Queries.all(n)(spark, sfDir).collect().toSeq)
      assert(gen == interp, s"$n diverges between codegen and interpreted")
    }
  }

  test("IdPairs/HammingPairs codegen matches interpreted incl. edge cases") {
    import spark.implicits._
    import graft.functions.Pairs
    def pairs(df: org.apache.spark.sql.DataFrame): Seq[Seq[(Long, Long)]] =
      df.collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1)))).toSeq
    // empty bucket, singleton, and a real bucket — C(n,2) expansion
    val packed = Seq(Seq.empty[Long], Seq(7L), Seq(1L, 2L, 3L, 4L)).toDF("xs")
      .select(Pairs.idPairs($"xs").as("ps"))
    val pGen = pairs(packed)
    val pInt = interpreted(pairs(packed))
    assert(pGen == pInt, "IdPairs diverges between codegen and interpreted")
    assert(pGen(2).size == 6 && pGen(0).isEmpty && pGen(1).isEmpty)

    val ham = Seq(Seq((1L, 0L), (2L, 1L), (3L, 0xFFL)), Seq.empty[(Long, Long)])
      .toDF("xs")
      .select(Pairs.hammingPairs($"xs".cast(
        "array<struct<doc_id:bigint,sig:bigint>>"), 3).as("ps"))
    val hGen = pairs(ham)
    val hInt = interpreted(pairs(ham))
    assert(hGen == hInt, "HammingPairs diverges between codegen and interpreted")
    // (1,2) within hamming 3; pairs with sig 0xFF are filtered in-loop
    assert(hGen.head == Seq((1L, 2L)) && hGen(1).isEmpty)

    // the packed-long form's 2^32 id ceiling is GONE: ids past 32 bits
    // (the ~10^10 regime of the 1000× probe corpus and any 100 TB
    // deployment) pair correctly in both paths
    val wide = Seq(Seq(5L, 1L << 33, (1L << 33) + 1)).toDF("xs")
      .select(Pairs.idPairs($"xs").as("ps"))
    val wGen = pairs(wide)
    val wInt = interpreted(pairs(wide))
    assert(wGen == wInt, "wide-id IdPairs diverges")
    assert(wGen.head == Seq((5L, 1L << 33), (5L, (1L << 33) + 1),
      (1L << 33, (1L << 33) + 1)))
  }

  test("BitInterleave compiles under CODEGEN_ONLY (no silent fallback)") {
    // the original fused one-liner didn't parse under Janino: every use
    // fell back to interpreted eval with only an ERROR log. CODEGEN_ONLY
    // turns a compile failure into a test failure.
    import spark.implicits._
    import graft.functions.PortableMath
    val ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val fm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val z = Seq((3, 5)).toDF("a", "b")
        .select(PortableMath.zValue($"a", $"b", 8)).collect().head.getLong(0)
      // a=3 → z bits 1,3 (odd slots); b=5 → z bits 0,4: 2+8+1+16
      assert(z == 27L)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
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
