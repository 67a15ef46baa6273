package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Merge

/** Partition-scoped upsert: only partitions holding updated keys rewrite;
  * untouched partitions keep their physical files byte-for-byte. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(dir: String): Map[String, Set[String]] =
    new java.io.File(dir).listFiles().filter(_.getName.startsWith("day="))
      .map(d => d.getName ->
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${f.getName}:${f.lastModified}").toSet)
      .toMap

  test("upsert rewrites only affected partitions; updates replace, inserts add") {
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    Seq(
      (1L, "a", 1), (2L, "b", 1),
      (3L, "c", 2), (4L, "d", 2),
      (5L, "e", 3))
      .toDF("id", "v", "day")
      .write.partitionBy("day").parquet(dir)
    val before = dataFiles(dir)

    // update id=3, insert id=6 — both in day=2
    val updates = Seq((3L, "C2", 2), (6L, "f", 2)).toDF("id", "v", "day")
    Merge.upsertPartitioned(spark, dir, updates, Seq("id"), "day")

    val after = dataFiles(dir)
    assert(after("day=1") == before("day=1"), "day=1 was rewritten")
    assert(after("day=3") == before("day=3"), "day=3 was rewritten")
    assert(after("day=2") != before("day=2"), "day=2 should have been rewritten")

    val rows = spark.read.parquet(dir)
      .select($"id", $"v", $"day".cast("int"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq(
      (1L, "a", 1), (2L, "b", 1),
      (3L, "C2", 2), (4L, "d", 2),
      (5L, "e", 3), (6L, "f", 2)))

    // idempotent: replaying the same updates changes nothing
    Merge.upsertPartitioned(spark, dir, updates, Seq("id"), "day")
    val rows2 = spark.read.parquet(dir).count()
    assert(rows2 == 6)
  }

  test("keyed upsert: updates win, survivors stay, inserts add, one row per key") {
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "name", "v")
    val updates = Seq((2L, "B", 21), (4L, "d", 40)).toDF("k", "name", "v")
    val merged = Merge.upsertKeyed(base, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(merged == Map(
      1L -> ("a", 10),   // survivor
      2L -> ("B", 21),   // update wins
      3L -> ("c", 30),   // survivor
      4L -> ("d", 40)))  // insert
    // idempotent: applying the same updates again changes nothing
    val again = Merge.upsertKeyed(
      Merge.upsertKeyed(base, updates, Seq("k")), updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(again == merged)
  }

  test("contiguous id assignment equals global-order numbering at any nPart") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "lang")
    val expect = docs.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    for (n <- Seq(1, 7, 32)) {
      val ids = operators.Ids.contiguous(docs, "doc_id", n)
        .orderBy("seq_id").collect()
      assert(ids.map(_.getLong(0)).toSeq == expect, s"order broken at nPart=$n")
      assert(ids.map(_.getLong(2)).toSeq == expect.indices.map(_.toLong),
        s"ids not dense at nPart=$n")
    }
  }
}
