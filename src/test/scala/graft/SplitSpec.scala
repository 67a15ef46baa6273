package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Leakage-safety laws for q_split_leakage_safe: the split unit is the
  * near-dup cluster, so no verified near-dup pair may straddle subsets,
  * assignment is a pure function of the unit id, and the 80/10/10 shape
  * holds. Runs at sf0.01 (the smallest corpus with planted near-dup
  * clusters — sf0.001 has none, which would make the straddle check
  * vacuous). */
class SplitSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private lazy val split = Queries.all("q_split_leakage_safe")(spark, dir)
    .cache()

  test("every document is assigned exactly once") {
    val n = Tables.load(spark, dir, "documents").count()
    assert(split.count() == n)
    assert(split.select($"doc_id").distinct().count() == n)
  }

  test("no verified near-dup pair straddles subsets") {
    val pairs = Dedup.minhashNearDupPairs(spark, dir)
    assert(pairs.count() > 0, "vacuous: corpus has no near-dup pairs")
    val a = split.select($"doc_id".as("doc_a"), $"subset".as("sub_a"),
      $"split_unit".as("unit_a"))
    val b = split.select($"doc_id".as("doc_b"), $"subset".as("sub_b"),
      $"split_unit".as("unit_b"))
    val straddling = pairs.join(a, "doc_a").join(b, "doc_b")
      .filter($"sub_a" =!= $"sub_b" || $"unit_a" =!= $"unit_b")
    assert(straddling.isEmpty,
      s"near-dup pairs split across subsets: ${straddling.head(5).toSeq}")
  }

  test("assignment is the pure mod-10 function of the unit id") {
    val bad = split.filter(
      $"subset" =!= when($"split_unit" % 10 < 8, "train")
        .when($"split_unit" % 10 === 8, "val").otherwise("test"))
    assert(bad.isEmpty)
    // the unit is the cluster representative = min doc_id, so it never
    // exceeds the member's own id
    assert(split.filter($"split_unit" > $"doc_id").isEmpty)
  }

  test("80/10/10 shape: all three subsets present, train the majority") {
    val counts = split.groupBy($"subset").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"), s"got $counts")
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9,
      s"train fraction off: $counts")
  }

  test("DSIR model: store == rebuild, incremental twin is the full scoring's restriction") {
    // the mixture-axis ingest factoring (r13 verdict #3): the persisted
    // ≤4096-row log-ratio table must equal a fresh in-plan fit value for
    // value, and the incremental query must agree with the full scoring
    // pass on every arrival doc it ranks
    import graft.operators.Sampling
    val p = java.nio.file.Files.createTempDirectory("graft_dsir_spec").toString
    Sampling.writeDsirModel(spark, sfDir, p)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val stored = toMap(Sampling.readDsirModel(spark, p))
    val rebuilt = toMap(Sampling.dsirModelOf(spark, sfDir))
    assert(stored.nonEmpty && stored == rebuilt, "DSIR model store/rebuild drift")
    // scoring consistency: every (doc, n_grams, weight) the incremental
    // twin emits must appear identically in an unlimited full-pool scoring
    val inc = Queries.all("q_mix_dsir_incremental")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Queries.all("q_mix_dsir")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._1 % 10 == 0).toSet
    assert(inc.nonEmpty, "incremental DSIR vacuous")
    // the full query's top-100 restricted to arrivals is a subset of the
    // arrival-only top-100 (both rank by the same persisted-equal model)
    assert(full.subsetOf(inc),
      s"incremental scoring disagrees with the full pass on ${(full -- inc).size} docs")
  }

  test("streaming DSIR scoring equals the batch scoring of the arrival slice") {
    // the mixture axis's streaming form (r14): per-micro-batch scoring
    // against the persisted model must be indistinguishable from one
    // batch scoring pass over the same arrivals — each arrival lives in
    // exactly one micro-batch, so per-batch score tables concatenate to
    // the global scoring
    import graft.operators.Sampling
    import org.apache.spark.sql.functions.col
    val stream = Queries.all("q_stream_mix_dsir")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val p = java.nio.file.Files.createTempDirectory("graft_dsir_stream_spec").toString
    Sampling.writeDsirModel(spark, sfDir, p)
    val batch = Sampling.dsirScoreAll(
        Sampling.dsirGrams(Tables.load(spark, sfDir, "documents")
          .filter(col("doc_id") >= 50 && col("doc_id") % 10 === 0)),
        Sampling.readDsirModel(spark, p))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "vacuous: no arrival docs scored")
    assert(stream == batch,
      s"missing ${(batch -- stream).size}, spurious ${(stream -- batch).size}")
  }
}
