package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopK

/** The custom physical operator must (a) plan as TopKPerKeyExec with no
  * WindowExec/SortExec over the data, (b) agree with the window+row_number
  * formulation row-for-row, (c) respect the total-order tie-break. */
class TopKPerKeySpec extends SparkSpec {

  test("plans as TopKPerKeyExec without a window sort") {
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val df = TopK.perKey(ord, Seq("o_custkey"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("agrees with window+row_number top-3 per customer") {
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val viaExec = TopK.perKey(ord, Seq("o_custkey"),
        Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaExec == viaWindow)
    assert(viaExec.nonEmpty)
  }

  test("keeps exactly k rows with deterministic tie-break") {
    import spark.implicits._
    // five rows, all the same price → tie-break on id keeps ids 1..3
    val df = Seq((1L, 1L, 9.0), (1L, 2L, 9.0), (1L, 3L, 9.0),
      (1L, 4L, 9.0), (1L, 5L, 9.0), (2L, 6L, 1.0))
      .toDF("k", "id", "price")
    val got = TopK.perKey(df, Seq("k"), Seq("price" -> true, "id" -> false), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 6L)))
  }
}
