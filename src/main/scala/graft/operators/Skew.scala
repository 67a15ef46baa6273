package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation for joins whose key distribution is hot (SURVEY.md §7.4:
  * "similarity join blow-up control (bucket skew)").
  *
  * AQE's skew-join handles sort-merge cases automatically (leave
  * `spark.sql.adaptive.skewJoin.enabled` on); explicit salting is for the
  * cases AQE can't split — e.g. a broadcast-side explosion or aggregations
  * over a hot key. `saltedJoin` spreads each hot key over `salts`
  * sub-partitions of the big side and replicates the small side once per
  * salt: shuffle skew S/salts at the cost of a `salts`× small-side blowup.
  */
object Skew {
  /** Join types where replicating the small side is sound. For right/full
    * outer joins each UNMATCHED small-side row would surface once per salt
    * — `salts`× duplicated output — so they are rejected. */
  private val saltableJoinTypes = Set(
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti", "cross")

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(saltableJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin: joinType '$joinType' would emit unmatched small-side " +
        s"rows once per salt; use one of $saltableJoinTypes")
    // row-dependent (not key-dependent!) salt on the big side — same-key
    // rows must scatter across salts; monotonic id is deterministic per
    // partition layout and needs no extra shuffle
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase aggregation over a possibly-hot group key: partial aggregate
    * on (key, salt), then final on key. Spark's hash aggregate already does
    * map-side partials; this is the explicit variant for agg functions
    * whose partials stay large (e.g. collect-like states). */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("n"))

  /** Key-distribution diagnostic — the numbers that decide WHETHER to salt
    * (and how many salts) before a shuffle on `key`: key cardinality, the
    * hottest key's share, max/mean skew ratio, and the coefficient of
    * variation of per-key counts. Two bounded aggregates (per-key counts,
    * then one summary row); moments come from exact BIGINT sums (counts are
    * integers — sums of n and n² are exact in 64 bits far beyond 100 TB
    * key cardinalities), so the derived doubles are order-independent and
    * cross-engine reproducible after rounding. */
  def skewReport(df: DataFrame, key: Column): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val nKeys = count(lit(1))
    val sx = sum(col("n"))
    val sxx = sum(col("n") * col("n"))
    counts.agg(
      nKeys.as("n_keys"),
      sx.as("total_rows"),
      max(col("n")).as("max_per_key"),
      round(max(col("n")).cast("double") * nKeys.cast("double")
        / sx.cast("double"), 6).as("skew_ratio"),
      round(sqrt((sxx.cast("double") - sx.cast("double") * sx.cast("double")
          / nKeys.cast("double")) / (nKeys.cast("double") - 1))
        / (sx.cast("double") / nKeys.cast("double")), 6).as("cv"))
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_skew_report" -> ((s, dir) =>
      skewReport(Tables.load(s, dir, "events"), col("user_id"))),
  )

  val oracle: Map[String, String] = Map(
    "q_skew_report" ->
      """WITH c AS (SELECT user_id AS key, COUNT(*) AS n FROM events GROUP BY 1)
        |SELECT COUNT(*) AS n_keys,
        |  CAST(SUM(n) AS BIGINT) AS total_rows,
        |  MAX(n) AS max_per_key,
        |  round(CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n), 6) AS skew_ratio,
        |  round(sqrt((CAST(SUM(n*n) AS DOUBLE)
        |      - CAST(SUM(n) AS DOUBLE) * SUM(n) / COUNT(*))
        |      / (COUNT(*) - 1))
        |    / (CAST(SUM(n) AS DOUBLE) / COUNT(*)), 6) AS cv
        |FROM c""".stripMargin,
  )
}
