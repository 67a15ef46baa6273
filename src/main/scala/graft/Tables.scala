package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Uniform loader for the driver corpus (TESTDATA.md):
  * `region nation customer supplier part orders lineitem events documents
  * embeddings`, one parquet file (or directory) per table under the
  * scale-factor dir.
  *
  * Scale note: these are plain `spark.read.parquet` scans — Catalyst column
  * pruning + predicate pushdown apply; at cluster scale the same call reads a
  * partitioned directory tree and gets partition pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * schema converter rejects (PARQUET_TYPE_ILLEGAL). Read it as epoch-nano
    * Long (`spark.sql.legacy.parquet.nanosAsLong`) and convert to
    * TimestampType at microsecond precision — the same truncation DuckDB
    * applies on `CAST(ts_ns AS TIMESTAMP)`, keeping oracle comparisons exact.
    */
  /** Register the engine's predicate-rewrite rule (to_date unwrap + ns→µs
    * conversion pushdown, graft.plans.RewriteToDatePredicates) in this
    * session if absent — load-bearing for events queries, whose `ts` is a
    * derived column that otherwise blocks all parquet pushdown. Sessions
    * built with `GraftExtensions` already have it; this covers
    * caller-provided sessions (e.g. the driver's). */
  private def ensureOptimizerRule(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(plans.RewriteToDatePredicates))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.RewriteToDatePredicates

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    ensureOptimizerRule(spark)
    loadRaw(spark, sfDir, name)
  }

  private def loadRaw(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(sfDir, name))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case _ => spark.read.parquet(path(sfDir, name))
  }
}
