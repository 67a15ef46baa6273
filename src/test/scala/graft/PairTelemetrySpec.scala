package graft

/** The pair-form telemetry fence (r9 verdict #6): every OUTPUT-QUADRATIC
  * pair query must surface its emitted pair count as a
  * `graft.pair_count.<query>` observe metric, so a consumer who picks a
  * pair form at scale gets a loud signal instead of a silent multi-
  * billion-row job (the clusters/decision form of each family is the
  * linear-output alternative). The metric must equal the true row count.
  */
class PairTelemetrySpec extends SparkSpec {

  private val pairQueries = Seq(
    "q_dedup_minhash_lsh", "q_dedup_minhash_auto", "q_dedup_simhash",
    "q_dedup_ngram", "q_dedup_embedding", "q_dedup_embedding_lsh",
    "q_multimodal_perceptual", "q_cosine_pairs", "q_editdist_pairs",
    "q_block_sorted")

  test("every pair-form query reports pairs_emitted == its row count") {
    for (name <- pairQueries) {
      val df = Queries.all(name)(spark, sfDir)
      // collect() (not count()) so the observed plan itself executes —
      // count() spawns a separate query execution with fresh metrics
      val n = df.collect().length.toLong
      val metrics = df.queryExecution.observedMetrics
        .collect { case (k, v) if k == s"graft.pair_count.$name" => v }
      assert(metrics.size == 1, s"$name: expected one pair_count metric")
      assert(metrics.head.getAs[Long]("pairs_emitted") == n,
        s"$name: metric != emitted rows")
    }
  }
}
