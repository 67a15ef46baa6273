package graft

import org.apache.spark.sql.functions._

/** Semantics of the state-evolution operators (SCD2 build, MERGE diff,
  * dyadic EWMA, z-score gate) and the unigram LM score. The DuckDB oracle
  * covers value equality; these freeze the algebraic invariants. */
class EvolutionSpec extends SparkSpec {

  private def q(name: String) = Queries.all(name)(spark, sfDir)

  test("scd2: contiguous intervals, one current row per user, states alternate") {
    val out = q("q_scd2_build").cache()
    try {
      val users = Tables.load(spark, sfDir, "events")
        .select("user_id").distinct().count()
      assert(out.filter(col("is_current") === 1).count() == users,
        "exactly one open interval per user")
      // per user: valid_to(version k) == valid_from(version k+1), and the
      // state must actually change between consecutive versions
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("version")
      val seq = out
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
        .withColumn("next_state", lead(col("state"), 1).over(w))
      assert(seq.filter(col("next_from").isNotNull &&
        col("valid_to") =!= col("next_from")).count() == 0,
        "intervals must tile the timeline with no gaps/overlaps")
      assert(seq.filter(col("next_state").isNotNull &&
        col("state") === col("next_state")).count() == 0,
        "consecutive versions must differ in state")
      // versions are 1..n dense per user
      assert(out.filter(col("version") === 1).count() == users)
    } finally out.unpersist()
  }

  test("merge diff agrees with log compaction on the merged state") {
    val merged = q("q_merge_upsert").select("user_id", "state", "last_ts")
    val compact = q("q_log_compact")
      .select(col("user_id"), col("last_type").as("state"),
        col("last_ts"))
    assert(merged.exceptAll(compact).count() == 0 &&
      compact.exceptAll(merged).count() == 0,
      "COALESCE(source, target) must equal the overall latest state")
    // action classes are consistent with prev_state nullability
    val out = q("q_merge_upsert")
    assert(out.filter(col("action") === "insert" && col("prev_state").isNotNull)
      .count() == 0)
    assert(out.filter(col("action") =!= "insert" && col("prev_state").isNull)
      .count() == 0)
    assert(out.filter(col("action") === "keep" &&
      col("state") =!= col("prev_state")).count() == 0,
      "keep rows carry the unchanged target state")
  }

  test("ewma satisfies its recurrence exactly (no floating-point drift)") {
    val rows = q("q_ewma").orderBy("user_id", "day").collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      var prevDay: java.time.LocalDate = null
      var prevDecayed = 0.0
      rs.sortBy(_.getDate(1).toLocalDate.toEpochDay).foreach { r =>
        val (day, n, d) =
          (r.getDate(1).toLocalDate, r.getLong(2), r.getDouble(3))
        val gap = if (prevDay == null) 0L else day.toEpochDay - prevDay.toEpochDay
        val expect =
          if (prevDay == null) n.toDouble
          else n + prevDecayed * math.pow(0.5, gap.toDouble)
        assert(d == expect, s"decayed($day) = $d, recurrence gives $expect")
        prevDay = day; prevDecayed = d
      }
    }
  }

  test("z-score gate: rounded moments match exact driver-side computation") {
    val out = q("q_zscore_outliers").collect()
    val vals = Tables.load(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2)))
      .groupBy(_._1)
    out.foreach { r =>
      val (t, n) = (r.getString(0), r.getLong(1))
      val xs = vals(t).map(_._2)
      assert(n == xs.length.toLong)
      val mean = (xs.sum.toDouble / n)
      assert(r.getDouble(2) == math.rint(mean * 1e6) / 1e6 ||
        math.abs(r.getDouble(2) - mean) < 1e-6)
      assert(r.getLong(4) + r.getLong(5) < n,
        "mean ± 3σ cannot fence out everything")
      assert(r.getDouble(3) > 0)
    }
  }

  test("lm score: negative scores, token totals tie out, uniform corpus scores ln(1/V)") {
    val out = q("q_lm_score").cache()
    try {
      assert(out.filter(col("avg_logprob") >= 0).count() == 0,
        "every token probability is < 1, so every score is negative")
      val totalTokens = out.agg(sum("n_tokens")).head().getLong(0)
      val direct = Tables.load(spark, sfDir, "documents")
        .select(size(split(lower(col("text")), " ")).cast("long").as("n"))
        .agg(sum("n")).head().getLong(0)
      assert(totalTokens == direct, "token mass must equal the corpus token count")
      // sanity of the model itself: a doc repeating one token that makes up
      // fraction p of the corpus must score exactly round(ln(p), 6)
      import spark.implicits._
      val tiny = Seq(1L -> "a a a a", 2L -> "b b b b").toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
      tiny.write.parquet(s"$dir/documents.parquet")
      val scored = Queries.all("q_lm_score")(spark, dir).collect()
      scored.foreach { r =>
        assert(r.getDouble(2) == math.rint(math.log(0.5) * 1e6) / 1e6 ||
          math.abs(r.getDouble(2) - math.log(0.5)) < 1e-6,
          s"uniform two-token corpus: score must be ln(1/2), got ${r.getDouble(2)}")
      }
    } finally out.unpersist()
  }
}
