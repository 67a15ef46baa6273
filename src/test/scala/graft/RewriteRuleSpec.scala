package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.plans.RewriteToDatePredicates

/** The to_date-predicate rewrite must (a) preserve results and (b) restore
  * parquet pushdown (PushedFilters on the raw timestamp column). */
class RewriteRuleSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(RewriteToDatePredicates)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("to_date(ts) == d rewrites to a pushed range with identical result") {
    val ev = Tables.load(spark, sfDir, "events")
    val wrapped = ev.filter(to_date(col("ts")) === lit("2024-01-15").cast("date"))
    val baseline = wrapped.count()
    withRule {
      val df = Tables.load(spark, sfDir, "events")
        .filter(to_date(col("ts")) === lit("2024-01-15").cast("date"))
      assert(df.count() == baseline)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("cast(ts"), s"cast survived:\n$plan")
      // the predicate must reach the parquet scan on the RAW nanos column
      // (to_date unwrap + ns→µs conversion pushdown composing)
      assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
        s"no pushdown:\n$plan")
    }
  }

  test("all comparison shapes preserve results") {
    val d = lit("2024-01-15").cast("date")
    def q() = Tables.load(spark, sfDir, "events")
    val shapes = Seq[org.apache.spark.sql.Column](
      to_date(col("ts")) === d, to_date(col("ts")) <= d, to_date(col("ts")) < d,
      to_date(col("ts")) >= d, to_date(col("ts")) > d,
      d <= to_date(col("ts")), d < to_date(col("ts")),
      d >= to_date(col("ts")), d > to_date(col("ts")))
    val expected = shapes.map(c => q().filter(c).count())
    val got = withRule(shapes.map(c => q().filter(c).count()))
    assert(got == expected)
    // sanity: the slices are non-trivial (not all zero / not all full)
    assert(expected.distinct.size > 1)
  }
}
