package graft

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DailyTransactions, TopZones}
import graft.sources.{JdbcConfig, JdbcSink}

/** Orchestration shell: the reference's two pipelines as injectable-config
  * CLI jobs (SURVEY.md §3, §7.2 step 5) — replaces the Airflow DAG +
  * `BaseHook` surface with plain argv/env, and never hard-codes a master
  * (the reference's `.master("local[*]")` silently idled its own cluster,
  * SURVEY.md §3.1).
  *
  * Usage:
  *   runMain graft.JobRunner daily_transactions <executionDate> <dataDir> <sinkUri> <table>
  *   runMain graft.JobRunner top_zones          <executionDate> <dataDir> <sinkUri> <table>
  *
  * `sinkUri`: `jdbc:...` → JDBC sink (append for daily, overwrite+truncate
  * for top zones, matching the reference's modes); anything else → parquet
  * directory. Processing date is `executionDate − 1 day` (reference X6,
  * `calculate_daily_transactions.py:85`).
  *
  * Driver-side guards mirror the reference (D1/D3/D4,
  * `calculate_daily_transactions.py:91-103`): empty input raises; an empty
  * day still writes a 0-count row with a warning.
  */
object JobRunner {
  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "args: <job> <executionDate> <dataDir> <sinkUri> <table>")
    val Array(job, execDate, dataDir, sinkUri, table) = args.take(5)
    val spark = SparkSession.builder() // master comes from spark-submit / env
      .appName(s"graft-$job")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, job, LocalDate.parse(execDate), dataDir, sinkUri, table)
    finally spark.stop()
  }

  def run(spark: SparkSession, job: String, executionDate: LocalDate,
          dataDir: String, sinkUri: String, table: String): Unit = {
    val processDate = executionDate.minusDays(1) // X6
    val events = Tables.load(spark, dataDir, "events")
    if (events.isEmpty) // D1 (df.isEmpty, not the reference's rdd.isEmpty)
      throw new IllegalStateException(s"no input rows under $dataDir")

    val result: DataFrame = job match {
      case "daily_transactions" =>
        val r = DailyTransactions.dayCount(events, "ts", processDate)
          .withColumn("calculated_at", current_timestamp())
        val n = r.head().getLong(1) // D2/D3
        if (n < 0) throw new IllegalStateException(s"negative count $n")
        if (n == 0)
          System.err.println(s"[graft] warning: no rows for $processDate, writing 0")
        r
      case "top_zones" =>
        TopZones.topZones(events, "ts", "user_id", processDate, 5)
          .withColumn("calculated_at", current_timestamp())
      case other => throw new IllegalArgumentException(s"unknown job $other")
    }

    if (sinkUri.startsWith("jdbc:")) {
      val conf = JdbcConfig(sinkUri)
      job match {
        case "daily_transactions" => JdbcSink.append(result, conf, table)
        case "top_zones" => JdbcSink.overwriteTruncate(result, conf, table)
      }
    } else {
      result.write.mode("overwrite").parquet(s"$sinkUri/$table")
    }
  }
}
