package graft.operators

import java.time.LocalDate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-2 parity: top-N pickup zones by all-time trip count up to a
  * cutoff date (inclusive), dense-ranked descending — tie-inclusive, so the
  * result may exceed N rows (deliberately NOT `limit(N)`).
  *
  * Reference: `dags/spark_jobs/calculate_top_taxi_zones.py:29-35`
  * (filter to_date ≤ cutoff → groupBy(PULocationID).count → dense_rank over
  * global desc window → rank ≤ 5), orchestrated per monthly file with a
  * union afterwards (`:65-79`).
  *
  * Divergences from the reference, by design (SURVEY.md §4):
  *  - ONE scan + ONE global aggregate + ONE rank, instead of the reference's
  *    per-file rank-then-union (which mixes per-file ranks — a semantic bug —
  *    and costs O(files) scans).
  *  - the cutoff predicate is a raw-timestamp bound `ts < cutoff+1d`
  *    (equivalent to `to_date(ts) <= cutoff`) so parquet pushdown applies.
  *  - the rank window runs over the POST-aggregation frame (#zones rows,
  *    ~265 in the HVFHV domain) — the single-partition global window is
  *    cheap there and never touches pre-aggregation data. This is the shape
  *    that survives 100 TB: shuffle is bounded by zone cardinality.
  */
object TopZones {
  def topZones(trips: DataFrame, tsCol: String, zoneCol: String,
               cutoff: LocalDate, topN: Int): DataFrame = {
    val hi = lit(cutoff.plusDays(1).toString).cast("timestamp")
    val counts = trips
      .filter(col(tsCol) < hi)
      .groupBy(col(zoneCol).as("taxi_zone_id"))
      .agg(count(lit(1)).as("trip_count"))
    counts
      .withColumn("rank",
        dense_rank().over(Window.orderBy(col("trip_count").desc)).cast("long"))
      .filter(col("rank") <= topN)
      .orderBy(col("rank"), col("taxi_zone_id"))
  }
}
