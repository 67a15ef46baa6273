package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Laws of content-defined chunking: exact cover of the input, length
  * bounds, determinism, and the property that justifies its existence —
  * chunk identities survive an insertion that re-keys every fixed-width
  * chunk (boundary re-synchronization past the edit).
  */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private val MIN = 16
  private val MAX = 256

  private def chunksOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      Sketches.cdcChunks(col("text"), MIN, 6, MAX).as("cs"))

  test("chunks exactly cover the text; lengths bounded; starts contiguous") {
    val rows = chunksOf(Tables.load(spark, sfDir, "documents")
      .withColumn("text", concat(col("text"), lit(" "), col("text"))))
      .join(Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), length(col("text")).as("n0")), "doc_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cs = r.getSeq[Row](1)
      val total = 2 * r.getInt(2) + 1
      assert(cs.map(_.getInt(1)).sum == total, s"cover: ${r.getLong(0)}")
      // contiguous, in order, starting at 0
      cs.foldLeft(0) { (expect, c) =>
        assert(c.getInt(0) == expect, s"starts: ${r.getLong(0)}")
        expect + c.getInt(1)
      }
      // every chunk but the last obeys [MIN, MAX]; the tail may run short
      cs.dropRight(1).foreach(c =>
        assert(c.getInt(1) >= MIN && c.getInt(1) <= MAX, s"bounds: $c"))
      assert(cs.last.getInt(1) <= MAX)
    }
  }

  test("an insertion at the front preserves most chunk identities (CDC resync)") {
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("text", concat(col("text"), lit(" "), col("text")))
    val orig = chunksOf(docs)
      .select(col("doc_id"), expr("transform(cs, c -> c.hash)").as("hs"))
    val edited = chunksOf(docs.withColumn("text", concat(lit("zzz inserted "), col("text"))))
      .select(col("doc_id"), expr("transform(cs, c -> c.hash)").as("hs_e"))
    val stats = orig.join(edited, "doc_id")
      .select(
        (size(array_intersect(col("hs"), col("hs_e"))).cast("double")
          / size(col("hs"))).as("shared"),
        (element_at(col("hs"), -1) === element_at(col("hs_e"), -1)).as("tail_same"))
      .agg(avg(col("shared")).as("avg_shared"),
        avg(col("tail_same").cast("double")).as("tail_rate"))
      .head()
    // a front insertion disturbs O(1) leading chunks; the rest re-align.
    // Fixed-width chunking shares ~0 chunk identities under the same edit.
    assert(stats.getDouble(0) > 0.5, s"avg shared fraction ${stats.getDouble(0)}")
    assert(stats.getDouble(1) > 0.9, s"final-chunk survival rate ${stats.getDouble(1)}")
  }

  test("deterministic across partitionings; identical docs chunk identically") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = chunksOf(docs).orderBy("doc_id").collect().toSeq
    val b = chunksOf(docs.repartition(13)).orderBy("doc_id").collect().toSeq
    assert(a == b)
    // duplicate the corpus under new ids: every copy's chunk hash list
    // equals its original's (content-defined ⇒ content-determined)
    val dup = chunksOf(docs.withColumn("doc_id", col("doc_id") + 1000000))
      .orderBy("doc_id").collect().toSeq
    assert(a.map(r => r.getSeq[Row](1)) == dup.map(r => r.getSeq[Row](1)))
  }
}
