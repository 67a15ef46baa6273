package graft

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central query registry: every operator in SURVEY.md §2 (+§7 extensions)
  * appears here as a named query over the test corpus, with a matching
  * DuckDB oracle SQL where the semantics are SQL-expressible.
  *
  * Each family lives in its own module under `graft.operators` /
  * `graft.functions`; this object only assembles the maps the driver
  * contract (`SparkEntry`) exposes.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed processing dates for the reference-parity queries (events table
    * spans 2024-01-01 .. 2024-01-30; FIXTURES.md §C maps events→HVFHV). */
  val processDate: LocalDate = LocalDate.parse("2024-01-15")
  val cutoffDate: LocalDate = LocalDate.parse("2024-01-20")

  // ---------------------------------------------------------------- parity
  private val parity: Map[String, Q] = Map(
    "q_daily_transactions" -> ((s, dir) =>
      operators.DailyTransactions.dayCount(Tables.load(s, dir, "events"), "ts", processDate)),
    "q_top5_zones" -> ((s, dir) =>
      operators.TopZones.topZones(Tables.load(s, dir, "events"), "ts", "user_id", cutoffDate, 5)),
    // backfill (Airflow catchup, Spark-first): the whole date range in ONE
    // range-pushdown scan — incl. a zero-count row for any silent day —
    // instead of N per-day jobs; pairs with dynamic partition overwrite
    // for idempotent reruns (BackfillSpec)
    "q_backfill_range" -> ((s, dir) =>
      operators.DailyTransactions.dayCountRange(Tables.load(s, dir, "events"),
        "ts", processDate, processDate.plusDays(7))
        .orderBy("transaction_date")),
  )

  private val parityOracle: Map[String, String] = Map(
    "q_daily_transactions" ->
      """SELECT DATE '2024-01-15' AS transaction_date,
        |       count(*) AS total_transactions
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'""".stripMargin,
    "q_backfill_range" ->
      """WITH cal AS (
        |  SELECT CAST(unnest(generate_series(DATE '2024-01-15', DATE '2024-01-21',
        |                                      INTERVAL 1 DAY)) AS DATE) AS transaction_date),
        |c AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |             COUNT(*) AS n
        |      FROM events
        |      WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-22'
        |      GROUP BY 1)
        |SELECT transaction_date, COALESCE(n, 0) AS total_transactions
        |FROM cal LEFT JOIN c ON c.d = cal.transaction_date
        |ORDER BY transaction_date""".stripMargin,
    "q_top5_zones" ->
      """SELECT taxi_zone_id, trip_count, rank FROM (
        |  SELECT taxi_zone_id, trip_count,
        |         dense_rank() OVER (ORDER BY trip_count DESC) AS rank
        |  FROM (
        |    SELECT user_id AS taxi_zone_id, count(*) AS trip_count
        |    FROM events
        |    WHERE ts < TIMESTAMP '2024-01-21'
        |    GROUP BY user_id
        |  )
        |) WHERE rank <= 5
        |ORDER BY rank, taxi_zone_id""".stripMargin,
  )

  // ------------------------------------------------------------- assembled
  def all: Map[String, Q] =
    parity ++ operators.Relational.queries ++ operators.TextAnalysis.queries ++
      operators.Dedup.queries ++ operators.Similarity.queries ++
      operators.Multimodal.queries ++ streaming.Streams.queries ++
      operators.Stats.queries ++ operators.Temporal.queries ++
      operators.Sampling.queries ++ operators.PipelineOps.queries ++
      operators.SqlSurface.queries ++ operators.Ids.queries ++
      operators.DataQuality.queries ++ operators.Evolution.queries ++
      operators.SimilarityJoins.queries ++ operators.Skew.queries ++
      operators.Graph.queries ++ operators.Retrieval.queries ++
      streaming.Tws.queries
  def oracle: Map[String, String] =
    parityOracle ++ operators.Relational.oracle ++ operators.TextAnalysis.oracle ++
      operators.Dedup.oracle ++ operators.Similarity.oracle ++
      operators.Multimodal.oracle ++ streaming.Streams.oracle ++
      operators.Stats.oracle ++ operators.Temporal.oracle ++
      operators.Sampling.oracle ++ operators.PipelineOps.oracle ++
      operators.SqlSurface.oracle ++ operators.Ids.oracle ++
      operators.DataQuality.oracle ++ operators.Evolution.oracle ++
      operators.SimilarityJoins.oracle ++ operators.Skew.oracle ++
      operators.Graph.oracle ++ operators.Retrieval.oracle ++
      streaming.Tws.oracle
}
