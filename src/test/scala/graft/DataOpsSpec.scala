package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality

/** Quarantine split and keyed snapshot diff semantics. */
class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  test("quarantine: clean+bad partition the input; reasons name the rules") {
    val df = Seq((1L, 10.0, "x"), (2L, -1.0, "y"), (3L, 5.0, null),
      (4L, -2.0, null)).toDF("id", "price", "tag")
    val (clean, bad) = DataQuality.quarantine(df, Seq(
      "neg_price" -> (col("price") < 0),
      "null_tag" -> col("tag").isNull))
    assert(clean.collect().map(_.getLong(0)).toSet == Set(1L))
    assert(clean.columns.toSeq == df.columns.toSeq, "clean keeps the schema")
    val reasons = bad.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](r.fieldIndex("dq_failed")).toSet)
      .toMap
    assert(reasons == Map(
      2L -> Set("neg_price"), 3L -> Set("null_tag"),
      4L -> Set("neg_price", "null_tag")))
    assert(clean.count() + bad.count() == df.count())
  }

  test("diffKeyed: added/removed/changed only; unchanged keys absent") {
    val before = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "name", "v")
    val after = Seq((2L, "b", 20), (3L, "c", 31), (4L, "d", 40))
      .toDF("k", "name", "v")
    val diff = DataQuality.diffKeyed(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    // column order must not matter for the fingerprint
    val shuffled = after.select("v", "k", "name")
    val diff2 = DataQuality.diffKeyed(before, shuffled, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff2 == diff)
  }
}
