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
      // the FILTER must compare the raw column — no per-row cast/to_date
      // left in the predicate (the projection's normalization cast on the
      // output column is fine and expected for the NTZ representation)
      val filterLines = plan.linesIterator.filter(_.contains("Filter ")).toSeq
      assert(filterLines.nonEmpty && filterLines.forall(l =>
        !l.contains("cast(") && !l.contains("to_date")),
        s"cast survived in Filter:\n$plan")
      // the predicate must reach the parquet scan on the RAW stored column
      // (to_date unwrap + representation-conversion pushdown composing)
      assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
        s"no pushdown:\n$plan")
    }
  }

  test("ns→µs rewrite is exact for pre-epoch (negative) nanos") {
    // IntegralDivide truncates toward zero, so e.g. -500 div 1000 = 0: the
    // rewritten bound must be u*1000 - 999 for u <= 0, not u*1000.
    import spark.implicits._
    val xs = Seq(-2500L, -2000L, -1999L, -1500L, -1001L, -1000L, -999L,
      -500L, -1L, 0L, 1L, 500L, 999L, 1000L, 1001L, 1500L, 2000L, 2500L)
    val df = xs.toDF("x")
    val cmps = Seq("=", "<=", "<", ">=", ">")
    for (u <- -3L to 3L; op <- cmps; flip <- Seq(false, true)) {
      val (l, r) =
        if (flip) (s"timestamp_micros($u)", "timestamp_micros(x div 1000)")
        else ("timestamp_micros(x div 1000)", s"timestamp_micros($u)")
      val cond = s"$l $op $r"
      val expected = df.filter(expr(cond)).count()
      val got = withRule(df.filter(expr(cond)).count())
      assert(got == expected, s"mismatch for `$cond`: got $got want $expected")
    }
    // and the rewrite actually fires (no timestamp_micros left in the plan)
    withRule {
      val plan = df.filter(expr("timestamp_micros(x div 1000) >= timestamp_micros(0)"))
        .queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("micros"), s"rewrite did not fire:\n$plan")
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
