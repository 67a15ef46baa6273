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

  /** Quarantine split: one scan tags each row with the names of the rules
    * it violates (a rule is `name -> violation predicate`); returns
    * (clean rows, quarantined rows + `dq_failed` array column). Both
    * outputs derive from the same tagged plan — with the tagged frame
    * cached (caller's call), the split costs one read, not one per rule,
    * and the quarantine keeps WHY each row failed for triage. */
  def quarantine(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)])
      : (DataFrame, DataFrame) = {
    val failed = array_compact(array(rules.map { case (name, pred) =>
      when(pred, lit(name)).otherwise(lit(null).cast("string"))
    }: _*))
    val tagged = df.withColumn("dq_failed", failed)
    (tagged.filter(size(col("dq_failed")) === 0).drop("dq_failed"),
      tagged.filter(size(col("dq_failed")) > 0))
  }

  /** Keyed snapshot diff: classify every key as added / removed / changed
    * between two versions of a table (`changed` compares the non-key
    * columns' md5 over a canonical concat — one full outer join, no
    * row-by-row driver work). Unchanged keys are dropped — at 100 TB the
    * diff output is proportional to the churn, not the table. */
  def diffKeyed(before: DataFrame, after: DataFrame,
                keys: Seq[String]): DataFrame = {
    def fp(df: DataFrame) = {
      val others = df.columns.filterNot(keys.contains).sorted
      df.select(keys.map(col) :+
        md5(concat_ws("\u0001",
          others.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
          .as("fp"): _*)
    }
    val b = fp(before).withColumnRenamed("fp", "fp_before")
    val a = fp(after).withColumnRenamed("fp", "fp_after")
    b.join(a, keys, "full_outer")
      .withColumn("change", when(col("fp_before").isNull, "added")
        .when(col("fp_after").isNull, "removed")
        .when(col("fp_before") =!= col("fp_after"), "changed"))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }

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

    // corpus datasheet: the one-shot curation report a training-data
    // pipeline publishes with every release — size, duplication, source
    // and language mix, length and token statistics — as (metric, value)
    // long-format rows. Scale shape: ONE corpus pass computes every
    // per-doc-derived aggregate map-side combined (distinct texts via a
    // 16-byte md5 fingerprint, the dedup discipline — the text itself
    // never crosses an exchange); the language mode comes from a second
    // |langs|-row aggregate; the two one-row frames cross-join (bounded)
    // and unpivot via stack(). p50 length shares q_percentile's
    // percentile/quantile_cont cross-engine parity; ratios divide exact
    // integers in widened doubles on both engines.
    "q_corpus_card" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      val base = d.agg(
        count(lit(1)).cast("double").as("n_docs"),
        countDistinct(md5(col("text").cast("binary"))).cast("double")
          .as("n_distinct_texts"),
        countDistinct(col("source")).cast("double").as("n_sources"),
        countDistinct(col("lang")).cast("double").as("n_langs"),
        round(avg(col("n_chars")), 6).as("mean_chars"),
        round(expr("percentile(n_chars, 0.5)"), 6).as("p50_chars"),
        sum(size(split(col("text"), " "))).cast("double").as("total_tokens"))
      val topLang = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).cast("double").as("top_lang_n"))
      base.crossJoin(topLang)
        .withColumn("dup_ratio",
          round(lit(1.0) - col("n_distinct_texts") / col("n_docs"), 6))
        .withColumn("mean_tokens",
          round(col("total_tokens") / col("n_docs"), 6))
        .withColumn("top_lang_share",
          round(col("top_lang_n") / col("n_docs"), 6))
        .selectExpr("""stack(10,
          'dup_ratio', dup_ratio,
          'mean_chars', mean_chars,
          'mean_tokens', mean_tokens,
          'n_distinct_texts', n_distinct_texts,
          'n_docs', n_docs,
          'n_langs', n_langs,
          'n_sources', n_sources,
          'p50_chars', p50_chars,
          'top_lang_share', top_lang_share,
          'total_tokens', total_tokens) AS (metric, value)""")
        .orderBy(col("metric"))
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
    "q_corpus_card" ->
      """WITH b AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |  CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) AS n_distinct_texts,
        |  CAST(COUNT(DISTINCT source) AS DOUBLE) AS n_sources,
        |  CAST(COUNT(DISTINCT lang) AS DOUBLE) AS n_langs,
        |  round(AVG(n_chars), 6) AS mean_chars,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS total_tokens
        |  FROM documents),
        |tl AS (SELECT CAST(MAX(n) AS DOUBLE) AS top_lang_n FROM (
        |         SELECT COUNT(*) AS n FROM documents GROUP BY lang))
        |SELECT metric, value FROM (
        |  SELECT 'dup_ratio' AS metric,
        |    round(1.0 - n_distinct_texts / n_docs, 6) AS value FROM b
        |  UNION ALL SELECT 'mean_chars', mean_chars FROM b
        |  UNION ALL SELECT 'mean_tokens', round(total_tokens / n_docs, 6) FROM b
        |  UNION ALL SELECT 'n_distinct_texts', n_distinct_texts FROM b
        |  UNION ALL SELECT 'n_docs', n_docs FROM b
        |  UNION ALL SELECT 'n_langs', n_langs FROM b
        |  UNION ALL SELECT 'n_sources', n_sources FROM b
        |  UNION ALL SELECT 'p50_chars', p50_chars FROM b
        |  UNION ALL SELECT 'top_lang_share',
        |    round((SELECT top_lang_n FROM tl) / n_docs, 6) FROM b
        |  UNION ALL SELECT 'total_tokens', total_tokens FROM b
        |) ORDER BY metric""".stripMargin,
  )
}
