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

  /** Register the engine's predicate-rewrite rule (to_date unwrap + ns→µs /
    * NTZ-cast conversion pushdown, graft.plans.RewriteToDatePredicates) in
    * this session if absent — load-bearing for events queries, whose `ts` is
    * a derived column that otherwise blocks all parquet pushdown. Sessions
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

  /** `events.ts` has shipped in three physical representations across
    * corpus generations; normalize all of them to TimestampType (the session
    * is pinned UTC, so NTZ→LTZ is value-preserving):
    *  - parquet TIMESTAMP(NANOS): Spark's converter rejects it
    *    (PARQUET_TYPE_ILLEGAL) — read as epoch-nano Long
    *    (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to µs, the
    *    same truncation DuckDB applies on `CAST(ts_ns AS TIMESTAMP)`.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): read as
    *    TIMESTAMP_NTZ — cast to TimestampType.
    *  - TimestampType: pass through.
    * The branch is decided from the parquet footer (one driver-side schema
    * read), so the engine keeps working when the corpus is regenerated with
    * a different writer — exactly what silently broke 27 queries in round 6.
    */
  def normalizeTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.DateType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }

  /** Embedding vectors normalize to `array<float>` for the same reason
    * [[normalizeTs]] exists: the custom similarity expressions type-check
    * against ArrayType(FloatType), and a corpus regenerated with double
    * (or decimal) elements would otherwise fail ANALYSIS on every
    * embedding query at once — the failure mode that silently wiped 27
    * events queries in round 6. A widening regeneration costs one
    * narrowing cast here (values that were floats once round-trip
    * losslessly); today's corpus is already float and this is a no-op. */
  def normalizeEmbedding(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => df
      case _: org.apache.spark.sql.types.ArrayType =>
        df.withColumn(c, col(c).cast("array<float>"))
      case _ => df
    }

  private def loadRaw(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(path(sfDir, name)), "ts")
    case "embeddings" =>
      normalizeEmbedding(spark.read.parquet(path(sfDir, name)), "embedding")
    case _ => spark.read.parquet(path(sfDir, name))
  }
}
