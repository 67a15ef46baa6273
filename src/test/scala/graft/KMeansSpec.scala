package graft

import org.apache.spark.sql.functions._

/** Laws for the distributed Lloyd's k-means (`Similarity.kmeansAssign`).
  * The oracle proves exact cross-engine agreement at gate scale; these pin
  * the algorithmic invariants the oracle can't see (monotone convergence,
  * partitioning invariance, assignment optimality against the centroids
  * actually in play). */
class KMeansSpec extends SparkSpec {

  private def embeddings = {
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
  }

  private def ss(iters: Int): Double =
    operators.Similarity.kmeansAssign(embeddings, k = 8, iters = iters)
      .agg(sum(col("dist2"))).head.getDouble(0)

  test("every vector is assigned exactly once, to a live cluster id") {
    val a = operators.Similarity.kmeansAssign(embeddings, k = 8, iters = 2)
    val n = embeddings.count()
    assert(a.count() == n)
    assert(a.select(col("vec_id")).distinct().count() == n)
    val ids = a.select(col("cid")).distinct().collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf((0L until 8L).toSet), ids)
  }

  test("Lloyd monotonicity: total within-cluster SS never increases") {
    // recenter minimizes SS for a fixed assignment; reassign minimizes it
    // per-vector for fixed centroids — so SS is non-increasing across
    // iterations (up to the 6-dp distance rounding, hence the epsilon)
    val s1 = ss(1); val s2 = ss(2); val s3 = ss(3)
    assert(s2 <= s1 + 1e-3, s"iter1 $s1 -> iter2 $s2")
    assert(s3 <= s2 + 1e-3, s"iter2 $s2 -> iter3 $s3")
  }

  test("assignment is invariant to input partitioning") {
    def run(nPart: Int) =
      operators.Similarity.kmeansAssign(embeddings.repartition(nPart), 8, 2)
        .select(col("vec_id"), col("cid"), col("dist2"))
        .orderBy(col("vec_id")).collect().toSeq
    assert(run(1) == run(7))
  }

  test("final assignment is argmin over the final centroid set") {
    // re-derive centroids from the final assignment's OWN clusters and
    // check every vector sits no farther from its assigned centroid than
    // from any other (with the same 6-dp rounded-distance tie discipline)
    val a = operators.Similarity.kmeansAssign(embeddings, 8, 2)
      .select(col("vec_id"), col("v"), col("cid"), col("dist2"))
    val rows = a.collect()
    // the centroids a(iters=2) was assigned against are recenter(a(iters=1))
    val a1 = operators.Similarity.kmeansAssign(embeddings, 8, 1)
      .select(col("cid"), col("v")).collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rs) =>
        val vs = rs.map(_.getSeq[Double](1).toArray)
        val dim = vs.head.length
        cid -> Array.tabulate(dim) { i =>
          // mirror recenter: 9-dp decimal sum, cast to double, double
          // division, round 12 half-up
          val s = vs.map(v => BigDecimal(v(i)).setScale(9, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble
          BigDecimal(s / vs.length).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      def d2(c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val best = a1.minBy { case (cid, c) => (d2(c), cid) }
      assert(best._1 == r.getLong(2), s"vec ${r.getLong(0)}")
      assert(math.abs(d2(a1(r.getLong(2))) - r.getDouble(3)) < 1e-6)
    }
  }
}
