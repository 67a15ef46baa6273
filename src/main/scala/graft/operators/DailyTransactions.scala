package graft.operators

import java.time.LocalDate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline-1 parity: count trips whose pickup date equals one processing
  * day, producing `(transaction_date DATE, total_transactions BIGINT)`.
  *
  * Reference: `dags/spark_jobs/calculate_daily_transactions.py:52-57`
  * (withColumn(to_date) → filter == day → groupBy(date).count), driven at
  * `:80-106` with `process_date = execution_date − 1 day` (`:85`).
  *
  * Scale design (SURVEY.md §4): the reference filters on
  * `to_date(pickup_datetime) == day`, which wraps the column in a function
  * and defeats parquet predicate pushdown. We express the identical
  * semantics as a half-open raw-timestamp range `[day, day+1)`, so the
  * predicate reaches row-group stats (and, on a date-partitioned layout,
  * prunes partitions). At 100 TB that is the difference between scanning one
  * day and scanning everything.
  *
  * Like the reference's D3 guard (`:101-103`), an empty day yields one row
  * with count 0 (global aggregate, not groupBy — same ≤1-group result
  * without depending on any row surviving the filter).
  */
object DailyTransactions {
  /** Typed variant over `Dataset[Trip]` (SURVEY.md §1.1: the compile-time-
    * checked surface). Same plan as [[dayCount]] — the Dataset lowers to
    * identical catalyst once the filter/agg are column expressions. */
  def dayCountTyped(trips: org.apache.spark.sql.Dataset[graft.model.Trip],
                    day: LocalDate): DataFrame =
    dayCount(trips.toDF(), "pickup_datetime", day)

  def dayCount(trips: DataFrame, tsCol: String, day: LocalDate): DataFrame = {
    val lo = lit(day.toString).cast("timestamp")
    val hi = lit(day.plusDays(1).toString).cast("timestamp")
    trips
      .filter(col(tsCol) >= lo && col(tsCol) < hi)
      .agg(count(lit(1)).as("total_transactions"))
      .select(
        to_date(lit(day.toString)).as("transaction_date"),
        col("total_transactions"))
  }

  /** Backfill range variant (the Airflow-catchup use case, Spark-first):
    * ONE pushdown-friendly range scan computes every day in
    * [start, endExclusive) instead of N per-day jobs each rescanning the
    * input. Days with no rows still appear with count 0 (join against a
    * generated calendar — the reference's D3 zero-row guard, extended to
    * a range), so a backfill rerun replaces exactly its day set. */
  def dayCountRange(trips: DataFrame, tsCol: String,
                    start: LocalDate, endExclusive: LocalDate): DataFrame = {
    require(start.isBefore(endExclusive), s"empty range [$start, $endExclusive)")
    val lo = lit(start.toString).cast("timestamp")
    val hi = lit(endExclusive.toString).cast("timestamp")
    val counted = trips
      .filter(col(tsCol) >= lo && col(tsCol) < hi)
      .groupBy(to_date(col(tsCol)).as("transaction_date"))
      .agg(count(lit(1)).as("total_transactions"))
    val calendar = org.apache.spark.sql.functions.broadcast(
      trips.sparkSession.range(1).select(explode(sequence(
        lit(start.toString).cast("date"),
        lit(endExclusive.minusDays(1).toString).cast("date"),
        expr("interval 1 day"))).as("transaction_date")))
    calendar.join(counted, Seq("transaction_date"), "left_outer")
      .select(col("transaction_date"),
        coalesce(col("total_transactions"), lit(0L)).as("total_transactions"))
  }
}
