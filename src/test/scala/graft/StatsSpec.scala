package graft

import org.apache.spark.sql.functions._

/** Accuracy check for the approximate-distinct sketch (rows-only in the
  * oracle gate — HLL estimates are engine-specific). */
class StatsSpec extends SparkSpec {
  test("Misra-Gries: bounded state; candidates cover all true heavy hitters") {
    import spark.implicits._
    val toks = Tables.load(spark, sfDir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("token"))
    val k = 29
    val sketch: Map[String, Long] = toks.as[String]
      .select(new operators.Stats.MisraGries(k).toColumn).head()
    assert(sketch.size <= k, s"sketch must hold at most $k counters")
    val n = toks.count()
    val trueHeavy = toks.groupBy("token").count()
      .filter(col("count") * (k + 1) > n)
      .collect().map(_.getString(0)).toSet
    assert(trueHeavy.subsetOf(sketch.keySet),
      s"MG guarantee violated: ${trueHeavy -- sketch.keySet} missing")
    // and the registered query's verified output IS the exact heavy set
    val out = Queries.all("q_heavy_hitters")(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    assert(out == trueHeavy)
  }

  test("MG verified output is partition-invariant (merge order doesn't leak)") {
    import spark.implicits._
    val toks = Tables.load(spark, sfDir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("token"))
    val n = toks.count()
    val trueHeavy = toks.groupBy("token").count()
      .filter(col("count") * 30 > n).collect().map(_.getString(0)).toSet
    for (parts <- Seq(1, 7, 32)) {
      val sketch: Map[String, Long] = toks.repartition(parts).as[String]
        .select(new operators.Stats.MisraGries(29).toColumn).head()
      // the CANDIDATE set may vary with merge order; the guarantee may not
      assert(trueHeavy.subsetOf(sketch.keySet),
        s"parts=$parts lost ${trueHeavy -- sketch.keySet}")
    }
  }

  test("streaming heavy hitters == batch heavy hitters (sketch state merges across batches)") {
    val stream = Queries.all("q_stream_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Queries.all("q_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream.nonEmpty && stream == batch)
  }

  test("streaming MG sketch state merges across micro-batches (sliced feed)") {
    // three id-ordered slices, one file per trigger: nominees from the
    // cross-batch merged sketch must still cover every true heavy hitter,
    // and the verified output must equal the batch query's
    val base = TestFeeds.slicedDocs(spark, sfDir, 3)
    val docs = Tables.load(spark, sfDir, "documents")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(base)
    val nominees = streaming.Streams.heavyHitterNominees(spark, stream, 29)
    assert(nominees.size <= 29)
    val got = streaming.Streams.verifyHeavyHitters(spark, sfDir, nominees, 29)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Queries.all("q_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch)
  }

  test("approx_count_distinct within 10% of exact") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Queries.all("q_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx $a vs exact $e")
    }
  }

  test("hll_sketch estimate within 10% of exact") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Queries.all("q_hll_sketch")(spark, sfDir).collect().foreach { r =>
      val (k, a) = (r.getString(0), r.getLong(1))
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: hll $a vs exact $e")
    }
  }

  test("hll union of daily sketches matches exact weekly distincts within 10%") {
    val ev = Tables.load(spark, sfDir, "events")
    val exact = ev
      .groupBy(date_trunc("week", to_date(col("ts"))).cast("date").as("week"))
      .agg(countDistinct(col("user_id")).as("x"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val rows = Queries.all("q_hll_union")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (wk, est) = (r.getDate(0).toString, r.getLong(2))
      val e = exact(wk)
      assert(math.abs(est - e).toDouble / e < 0.1, s"$wk: union est $est vs exact $e")
    }
    // re-aggregation safety: unioning the daily sketches must equal
    // sketching the week directly (register-max is associative)
    val direct = ev
      .groupBy(date_trunc("week", to_date(col("ts"))).cast("date").as("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("d"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getLong(2) == direct(r.getDate(0).toString),
        s"union != direct sketch for ${r.getDate(0)}"))
  }

  test("quantile sketch: ε-rank guarantee at LOW accuracy, under repartitioning") {
    // the q_quantile_approx oracle proves exactness in the uncompressed
    // regime; this pins the sketch's actual contract where compression IS
    // active: a returned value's true rank within ε·n = n/accuracy of the
    // target, regardless of how the data is partitioned (merge path)
    import spark.implicits._
    val li = Tables.load(spark, sfDir, "lineitem")
    val vals = li.select(col("l_extendedprice").as("x")) // high-cardinality col
    val n = vals.count()
    val sorted = vals.as[Double].collect().sorted
    val acc = 50
    for (parts <- Seq(1, 7)) {
      val got = vals.repartition(parts)
        .agg(expr(s"percentile_approx(x, array(0.1, 0.5, 0.9), $acc)"))
        .as[Seq[Double]].head()
      for ((q, v) <- Seq(0.1, 0.5, 0.9).zip(got)) {
        // rank band of v among the sorted values
        val lo = sorted.indexWhere(_ >= v)
        val hi = sorted.lastIndexWhere(_ <= v) + 1
        val target = q * n
        val eps = n.toDouble / acc
        assert(lo - 1 <= target + eps && hi >= target - eps,
          s"parts=$parts q=$q: value $v rank band [$lo,$hi] vs target $target ±$eps")
      }
    }
  }
}
