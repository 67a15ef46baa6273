package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality validation — the rule-check / freshness surface an ETL
  * platform runs before trusting a load (the reference has only the binary
  * input-presence sensor; `daily_transactions_dag.py:58-65`):
  *
  *  - `q_dq_checks`: declarative rules → violation counts. All row-level
  *    rules evaluate in ONE conditional-aggregate scan of the fact table
  *    (not one pass per rule), then unpivot via `stack`; the referential
  *    rule is a broadcast-able anti join. 100 TB cost = one read.
  *  - `q_partition_gaps`: the expected daily calendar (driver-free:
  *    `sequence(min, max)` inside the plan) left-joined against actual
  *    per-day counts — missing or thin partitions surface as rows, the
  *    check behind "did yesterday's load actually arrive?".
  */
object DataQuality {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_dq_checks" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val rowRules = li.agg(
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)
          .otherwise(0)).as("qty_out_of_range"),
        sum(when(col("l_shipdate").isNull, 1).otherwise(0)).as("null_shipdate"),
        sum(when(col("l_extendedprice") <= 0, 1).otherwise(0)).as("neg_price"),
        sum(when(col("l_discount") > 0.08, 1).otherwise(0)).as("discount_over_8pct"),
        sum(when(col("l_quantity") > 45, 1).otherwise(0)).as("qty_over_45"))
        .selectExpr("""stack(5,
          'qty_out_of_range', qty_out_of_range,
          'null_shipdate', null_shipdate,
          'neg_price', neg_price,
          'discount_over_8pct', discount_over_8pct,
          'qty_over_45', qty_over_45) as (rule, n_violations)""")
      val orphans = li.join(ord,
          li("l_orderkey") === ord("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("orphan_lineitem").as("rule"), col("n_violations"))
      rowRules.unionByName(orphans).orderBy(col("rule"))
    }),

    "q_partition_gaps" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(to_date(col("ts")).as("event_day"))
      val daily = ev.groupBy(col("event_day")).agg(count(lit(1)).as("n"))
      val cal = ev.agg(min(col("event_day")).as("lo"), max(col("event_day")).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("event_day"))
      cal.join(daily, Seq("event_day"), "left_outer")
        .select(col("event_day"), coalesce(col("n"), lit(0L)).as("n_events"))
        .orderBy(col("event_day"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_dq_checks" ->
      """SELECT * FROM (
        |  SELECT 'qty_out_of_range' AS rule,
        |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |  FROM lineitem
        |  UNION ALL SELECT 'null_shipdate',
        |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'neg_price',
        |    CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'discount_over_8pct',
        |    CAST(SUM(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'qty_over_45',
        |    CAST(SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'orphan_lineitem', CAST(COUNT(*) AS BIGINT)
        |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |) ORDER BY rule""".stripMargin,
    "q_partition_gaps" ->
      """WITH b AS (SELECT CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) lo,
        |                  CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE) hi FROM events),
        |cal AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL '1 day')) AS DATE) AS event_day FROM b),
        |d AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) event_day, COUNT(*) n FROM events GROUP BY 1)
        |SELECT cal.event_day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
        |FROM cal LEFT JOIN d USING (event_day) ORDER BY event_day""".stripMargin,
  )
}
