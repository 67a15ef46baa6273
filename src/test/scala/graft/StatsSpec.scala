package graft

import org.apache.spark.sql.functions._

/** Accuracy check for the approximate-distinct sketch (rows-only in the
  * oracle gate — HLL estimates are engine-specific). */
class StatsSpec extends SparkSpec {
  test("approx_count_distinct within 10% of exact") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Queries.all("q_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx $a vs exact $e")
    }
  }

  test("hll_sketch estimate within 10% of exact") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Queries.all("q_hll_sketch")(spark, sfDir).collect().foreach { r =>
      val (k, a) = (r.getString(0), r.getLong(1))
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: hll $a vs exact $e")
    }
  }
}
