package graft

import org.apache.spark.sql.functions._

/** Laws of the distribution-position window family (q_window_ntile) the
  * value-equality oracle can't articulate: bucket balance, range bounds,
  * and the cume_dist fixed point at each partition's end. */
class RelationalWindowSpec extends SparkSpec {

  test("ntile buckets are balanced; pct_rank/cume bounded; last row cume=1") {
    val out = Queries.all("q_window_ntile")(spark, sfDir).cache()
    try {
      assert(out.filter(col("quartile") < 1 || col("quartile") > 4).isEmpty)
      assert(out.filter(col("pct_rank") < 0 || col("pct_rank") > 1 ||
        col("cume") <= 0 || col("cume") > 1).isEmpty)
      // ntile law: within a key, bucket sizes differ by at most 1 and are
      // non-increasing in bucket index (ntile gives earlier buckets the
      // remainder rows)
      val sizes = out.groupBy(col("o_custkey"), col("quartile"))
        .agg(count(lit(1)).as("n"))
      val spread = sizes.groupBy(col("o_custkey"))
        .agg((max(col("n")) - min(col("n"))).as("d"))
      assert(spread.filter(col("d") > 1).isEmpty, "ntile buckets unbalanced")
      // cume_dist of each key's max-position row is exactly 1.0
      val lastCume = out.groupBy(col("o_custkey")).agg(max(col("cume")).as("c"))
      assert(lastCume.filter(col("c") =!= 1.0).isEmpty)
    } finally out.unpersist()
  }
}
