package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** State-evolution operators over a keyed change log: SCD2 history build,
  * MERGE-style upsert diffing, exponentially-decayed activity, and a
  * z-score outlier gate. These are the warehouse-maintenance primitives the
  * reference's Postgres-loading DAGs imply but never get to
  * (`dags/spark_jobs/calculate_daily_transactions.py:65-78` overwrites a
  * whole table each run — SCD2/merge is what that becomes once history and
  * idempotent increments matter at 100 TB).
  *
  * Scale notes, per operator, live on each query. The common discipline:
  * per-key windows only (never a global sort), partial-aggregatable
  * `max_by`/moment sums, and exact arithmetic (dyadic weights, decimal
  * moment sums) so results are reproducible run-to-run — which is also
  * what makes them oracle-checkable cross-engine.
  */
object Evolution {
  type Q = (SparkSession, String) => DataFrame

  /** MERGE cutoff: state before vs on/after this instant. */
  val mergeCutoff: LocalDate = LocalDate.parse("2024-01-20")

  val queries: Map[String, Q] = Map(
    // SCD2 (type-2 slowly-changing dimension) build from a change log:
    // collapse consecutive equal states per user, emit validity intervals
    // [valid_from, valid_to) + version + current flag. Both windows share
    // the (user_id | ts, event_id) partitioning/ordering, so Catalyst plans
    // ONE shuffle + ONE sort and runs lag, lead and row_number in the same
    // Window node — per-key state, no global ordering anywhere.
    "q_scd2_build" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("version", row_number().over(w).cast("long"))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"), col("version"),
          col("valid_to").isNull.cast("int").as("is_current"))
        .orderBy(col("user_id"), col("valid_from"))
    }),

    // MERGE-style upsert diff: latest state per user before the cutoff
    // (the warehouse) full-outer-joined with latest state on/after it (the
    // increment), classifying every key as keep / update / insert — the
    // pure-relational core of `MERGE INTO`. Each side is a
    // partial-aggregatable max_by (one candidate row per key per map
    // task), so the exchange carries |keys| rows, not the event log; the
    // join then co-locates on the same key. At 100 TB the increment side
    // is usually small → AQE broadcasts it automatically.
    "q_merge_upsert" -> ((s, dir) => {
      val cut = lit(java.sql.Timestamp.valueOf(mergeCutoff.atStartOfDay))
      def latest(df: DataFrame, side: String) = df
        .groupBy(col("user_id"))
        .agg(max_by(struct(col("ts"), col("event_type")),
          struct(col("ts"), col("event_id"))).as("x"))
        .select(col("user_id"), col("x.ts").as(s"${side}_ts"),
          col("x.event_type").as(s"${side}_state"))
      val ev = Tables.load(s, dir, "events")
      val target = latest(ev.filter(col("ts") < cut), "t")
      val source = latest(ev.filter(col("ts") >= cut), "s")
      target.join(source, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          when(col("s_state").isNull, "keep")
            .when(col("t_state").isNull, "insert")
            .otherwise("update").as("action"),
          coalesce(col("s_state"), col("t_state")).as("state"),
          coalesce(col("s_ts"), col("t_ts")).as("last_ts"),
          col("t_state").as("prev_state"))
        .orderBy(col("user_id"))
    }),

    // exponentially-decayed daily activity (EWMA, decay 1/2 per day):
    // decayed(u, d) = Σ_{i≤d} n_i · 0.5^(d−i). The recurrence is
    // re-expressed as a prefix sum of n_i·2^i (window, per-user, rows
    // unbounded preceding) rescaled by 2^−d — every term is an integer,
    // every weight dyadic, the whole computation EXACT in double (terms
    // span < 53 bits: counts < 2^20, day offsets ≤ 30), so it is
    // order-independent and bit-identical cross-engine with NO rounding.
    // One shuffle to daily counts, one per-user window over ≤31 rows.
    "q_ewma" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("dd", datediff(col("day"), lit("2024-01-01").cast("date")))
        .withColumn("decayed",
          sum(col("n_events") * pow(lit(2.0), col("dd"))).over(w)
            * pow(lit(0.5), col("dd")))
        .select(col("user_id"), col("day"), col("n_events"), col("decayed"))
        .orderBy(col("user_id"), col("day"))
    }),

    // z-score outlier gate per event_type: mean/stddev from EXACT decimal
    // moment sums (value has 2 decimals → DECIMAL(18,2) sums are
    // order-independent), derived stats rounded (the q_stats_agg
    // discipline), then a second pass counts rows outside mean ± 3σ using
    // the ROUNDED fences so both engines compare identical doubles. The
    // aggregate is one bounded row per type, broadcast back onto the scan.
    "q_zscore_outliers" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val n = count(lit(1)).cast("double")
      val sx = sum(col("value").cast(DecimalType(18, 2))).cast("double")
      val sxx = sum(col("value").cast(DecimalType(18, 2))
        * col("value").cast(DecimalType(18, 2))).cast("double")
      val stats = ev.groupBy(col("event_type")).agg(
        n.cast("long").as("n_total"),
        round(sx / n, 6).as("mean_value"),
        round(sqrt((sxx - sx * sx / n) / (n - 1)), 6).as("stddev_value"))
      ev.join(broadcast(stats), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("n_total")).as("n_total"),
          first(col("mean_value")).as("mean_value"),
          first(col("stddev_value")).as("stddev_value"),
          sum(when(col("value") > col("mean_value") + lit(3.0) * col("stddev_value"), 1L)
            .otherwise(0L)).as("n_above"),
          sum(when(col("value") < col("mean_value") - lit(3.0) * col("stddev_value"), 1L)
            .otherwise(0L)).as("n_below"))
        .orderBy(col("event_type"))
    }),

    // corpus snapshot diff — the "what changed between dataset versions"
    // audit every dataset release pipeline runs (added / removed /
    // changed doc sets between v1 and v2), as a registered query over the
    // [[DataQuality.diffKeyed]] utility (tested in DataOpsSpec, until now
    // query-less). Versions derive deterministically from the corpus (v1
    // drops doc_id%10==7, v2 drops %10==3 and rewrites text for %5==0 —
    // arrival and edit churn); a real pipeline reads two snapshot paths
    // with identical plan shape. Scale shape (diffKeyed's contract):
    // content compares by md5 computed IN-SCAN, so only (doc_id, 16-byte
    // hash) crosses the one full-outer exchange — never the payload; the
    // output is churn-sized, not table-sized.
    "q_snapshot_diff" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val v1 = d.filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id"), col("text"))
      val v2 = d.filter(col("doc_id") % 10 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      DataQuality.diffKeyed(v1, v2, Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents
        |            WHERE doc_id % 10 <> 7),
        |v2 AS (SELECT doc_id,
        |         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |                  ELSE text END) AS h2
        |       FROM documents WHERE doc_id % 10 <> 3)
        |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |       CASE WHEN v1.doc_id IS NULL THEN 'added'
        |            WHEN v2.doc_id IS NULL THEN 'removed'
        |            WHEN v1.h1 <> v2.h2 THEN 'changed' END AS change
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |WHERE (v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.h1 <> v2.h2)
        |ORDER BY doc_id""".stripMargin,
    "q_scd2_build" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  event_type FROM events),
        |c AS (SELECT *, lag(event_type) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |f AS (SELECT user_id, event_id, ts, event_type FROM c
        |      WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type AS state, ts AS valid_from,
        |        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS valid_to,
        |        CAST(row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS BIGINT) AS version
        |      FROM f)
        |SELECT user_id, state, valid_from, valid_to, version,
        |       CAST(valid_to IS NULL AS INTEGER) AS is_current
        |FROM v ORDER BY user_id, valid_from""".stripMargin,
    "q_merge_upsert" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  event_type FROM events),
        |t AS (SELECT user_id, ts AS t_ts, event_type AS t_state FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM e WHERE ts < TIMESTAMP '2024-01-20') WHERE rn = 1),
        |s AS (SELECT user_id, ts AS s_ts, event_type AS s_state FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM e WHERE ts >= TIMESTAMP '2024-01-20') WHERE rn = 1)
        |SELECT COALESCE(t.user_id, s.user_id) AS user_id,
        |  CASE WHEN s_state IS NULL THEN 'keep'
        |       WHEN t_state IS NULL THEN 'insert'
        |       ELSE 'update' END AS action,
        |  COALESCE(s_state, t_state) AS state,
        |  COALESCE(s_ts, t_ts) AS last_ts,
        |  t_state AS prev_state
        |FROM t FULL JOIN s ON t.user_id = s.user_id
        |ORDER BY user_id""".stripMargin,
    "q_ewma" ->
      """WITH d AS (SELECT user_id,
        |             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |             COUNT(*) AS n_events
        |           FROM events GROUP BY 1, 2),
        |x AS (SELECT *, date_diff('day', DATE '2024-01-01', day) AS dd FROM d)
        |SELECT user_id, day, n_events,
        |  SUM(n_events * power(2.0, dd)) OVER (PARTITION BY user_id
        |    ORDER BY day ROWS UNBOUNDED PRECEDING) * power(0.5, dd) AS decayed
        |FROM x ORDER BY user_id, day""".stripMargin,
    "q_zscore_outliers" ->
      """WITH s AS (
        |  SELECT event_type,
        |    COUNT(*) AS n_total,
        |    round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |          / COUNT(*), 6) AS mean_value,
        |    round(sqrt((CAST(SUM(CAST(value AS DECIMAL(18,2))
        |                         * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |      - CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |        * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |        / COUNT(*)) / (COUNT(*) - 1)), 6) AS stddev_value
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, s.n_total, s.mean_value, s.stddev_value,
        |  CAST(SUM(CASE WHEN e.value > s.mean_value + 3.0 * s.stddev_value
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(SUM(CASE WHEN e.value < s.mean_value - 3.0 * s.stddev_value
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        |FROM events e JOIN s USING (event_type)
        |GROUP BY e.event_type, s.n_total, s.mean_value, s.stddev_value
        |ORDER BY e.event_type""".stripMargin,
  )
}
