package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Convergence plumbing for the iterative operators (r14 optimization,
  * guide §2.4 "remove shuffles outright" applied to ACTIONS): every round
  * of an iterative dataflow (connected components, k-core peeling) already
  * pays one materialization job for its per-round `localCheckpoint`; the
  * convergence DECISION can ride that same job as observe metrics instead
  * of paying separate `count()` / `isEmpty` / `except(...).isEmpty`
  * actions per round. Each eliminated action is a driver round-trip plus
  * its own AQE stage chain (for `except`: two extra shuffles of the
  * compared frames per round) — at sf0.1 the q_dedup_joint family spent
  * more wall in these checks than in all its task compute combined, and
  * at cluster scale every saved action is a full scheduler barrier.
  *
  * Soundness contract: metrics computed by `observe` are exact aggregates
  * of the materialized rows, so equal frames ALWAYS produce equal metrics.
  * Callers that compare hash-based metric triples must treat "metrics
  * equal" as a trigger for an exact confirmation (set equality can in
  * principle collide), and "metrics differ" as proof of inequality —
  * convergence semantics stay exact; only the price of the common
  * not-yet-converged round changes.
  */
private[operators] object IterConverge {

  /** Eagerly localCheckpoint `df`, computing aggregate `metrics` during
    * the SAME materialization job (the observe accumulators piggy-back on
    * the checkpoint action — zero extra passes, zero extra jobs). Returns
    * the checkpointed frame (lineage truncated, metrics node consumed)
    * and the metric row as a name→value map. */
  def checkpointWithMetrics(df: DataFrame, metrics: Seq[Column])
      : (DataFrame, Map[String, Any]) = {
    val obs = Observation()
    val out = df.observe(obs, metrics.head, metrics.tail: _*).localCheckpoint()
    (out, obs.get)
  }
}
