package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-3 event-log operators: hopping-window
  * aggregation and log compaction. The DuckDB oracle covers value
  * equality; these freeze the structural invariants. */
class TemporalOpsSpec extends SparkSpec {

  private def q(name: String) = Queries.all(name)(spark, sfDir)

  test("hopping window: every event lands in exactly width/slide windows") {
    val ev = Tables.load(spark, sfDir, "events")
    val out = q("q_hopping_window").cache()
    try {
      val nEvents = ev.count()
      val windowed = out.agg(sum("n_events")).head().getLong(0)
      assert(windowed == 2 * nEvents,
        s"2h/1h hop must double-count: $windowed != 2 * $nEvents")
      // windows are slide-aligned (whole hours) and exactly width long
      val misaligned = out.filter(
        unix_timestamp(col("w_start")) % 3600 =!= 0 ||
        unix_timestamp(col("w_end")) - unix_timestamp(col("w_start")) =!= 7200)
        .count()
      assert(misaligned == 0)
      // distinct users per window never exceeds the event count
      assert(out.filter(col("n_users") > col("n_events")).count() == 0)
    } finally out.unpersist()
  }

  test("streaming hop counts equal the batch hopping window") {
    val batch = q("q_hopping_window").select("w_start", "w_end", "n_events")
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    val stream = q("q_stream_hop_counts")
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(stream == batch,
      "finite stream must agree with the batch window aggregation")
  }

  test("concurrency: bounded by day volume, positive, one row per active day") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(to_date(col("ts")).as("day"))
    val perDay = ev.groupBy("day").count()
    val out = q("q_concurrency")
    val joined = out.join(perDay, "day").cache()
    try {
      assert(out.count() == perDay.count())
      assert(joined.filter(col("peak_concurrent") < 1).count() == 0)
      assert(joined.filter(col("peak_concurrent") > col("count")).count() == 0,
        "peak concurrency cannot exceed the day's session count")
    } finally joined.unpersist()
  }

  test("funnel stages are monotone and stage 1 matches viewing users") {
    val r = q("q_funnel").head()
    val (nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv >= nc && nc >= np && np >= 0)
    val viewers = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(nv == viewers)
  }

  test("retention: week 0 is the full cohort; later weeks never exceed it") {
    val out = q("q_retention").cache()
    try {
      val w0 = out.filter(col("week_offset") === 0)
      assert(w0.filter(col("n_active") =!= col("cohort_size")).count() == 0,
        "every user is active in their own first week by construction")
      assert(out.filter(col("n_active") > col("cohort_size")).count() == 0)
      assert(out.filter(col("retention") > 1.0 || col("retention") <= 0.0).count() == 0)
      // cohort sizes partition the user base
      val users = Tables.load(spark, sfDir, "events")
        .select("user_id").distinct().count()
      val sized = out.select("cohort_wk", "cohort_size").distinct()
        .agg(sum("cohort_size")).head().getLong(0)
      assert(sized == users)
    } finally out.unpersist()
  }

  test("log compaction: one row per key, latest version, counts conserve") {
    val ev = Tables.load(spark, sfDir, "events").cache()
    val out = q("q_log_compact").cache()
    try {
      assert(out.count() == ev.select("user_id").distinct().count())
      assert(out.agg(sum("n_versions")).head().getLong(0) == ev.count())
      // the compacted ts is the max ts per key
      val maxTs = ev.groupBy("user_id").agg(max("ts").as("max_ts"))
      val stale = out.join(maxTs, "user_id")
        .filter(col("last_ts") =!= col("max_ts")).count()
      assert(stale == 0, s"$stale keys compacted to a non-latest version")
    } finally { out.unpersist(); ev.unpersist() }
  }

  test("interpolate: dense grid, observed edges, fills bounded by brackets") {
    import org.apache.spark.sql.expressions.Window
    val out = q("q_interpolate").cache()
    try {
      assert(out.filter(col("value_filled").isNull).isEmpty,
        "gap-fill left a null behind")
      // grid density: per user, row count == hours between first and last + 1
      val span = out.groupBy("user_id").agg(
        count(lit(1)).as("n"),
        ((unix_timestamp(max(col("hr"))) - unix_timestamp(min(col("hr")))) / 3600 + 1)
          .as("expect"))
      assert(span.filter(col("n") =!= col("expect")).isEmpty, "grid not dense")
      // both series edges are observed by construction
      val w = Window.partitionBy("user_id").orderBy("hr")
      val rn = out.withColumn("rn", row_number().over(w))
        .withColumn("rmax", count(lit(1)).over(Window.partitionBy("user_id")))
      assert(rn.filter((col("rn") === 1 || col("rn") === col("rmax")) &&
        !col("is_observed")).isEmpty, "series edge was not an observation")
      // every interpolated value lies between its bracketing observations
      val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsV = when(col("is_observed"), col("value_filled"))
      val bad = out
        .withColumn("vp", last(obsV, ignoreNulls = true).over(wp))
        .withColumn("vn", first(obsV, ignoreNulls = true).over(wn))
        .filter(!col("is_observed") &&
          (col("value_filled") < least(col("vp"), col("vn")) - 1e-6 ||
           col("value_filled") > greatest(col("vp"), col("vn")) + 1e-6))
      assert(bad.isEmpty, "an interpolated value escaped its bracket")
      // the corpus really has gaps — the op must be doing work
      assert(out.filter(!col("is_observed")).count() > 0)
    } finally out.unpersist()
  }
}
