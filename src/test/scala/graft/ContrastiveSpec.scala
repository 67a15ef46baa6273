package graft

import org.apache.spark.sql.functions._

/** Laws for `Similarity.contrastiveTriples` (q_contrastive_triples) — the
  * invariants the DuckDB oracle proves numerically at gate scale, pinned
  * here structurally, plus the one thing the oracle CANNOT see: the loud
  * failure on a non-contiguous vec_id corpus (the oracle only ever runs on
  * the contiguous test corpus).
  */
class ContrastiveSpec extends SparkSpec {

  private lazy val out =
    Queries.all("q_contrastive_triples")(spark, sfDir).collect()

  /** Exact symmetric near-dup map at sf0.001 (50 vectors — the quadratic
    * driver-side recompute is the independent ground truth, not the LSH
    * path the query itself uses). */
  private lazy val exactSym: Map[Long, Seq[(Long, Double)]] = {
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val pairs = for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      c = cos(va, vb) if c >= 0.45
    } yield (ia, ib, c)
    (pairs.map { case (a, b, c) => (a, (b, c)) } ++
      pairs.map { case (a, b, c) => (b, (a, c)) })
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
  }

  test("one row per anchor with a near-dup; positive = min-id exact partner") {
    assert(out.nonEmpty, "corpus has near-dups; output must too")
    assert(out.map(_.getLong(0)).toSet == exactSym.keySet)
    out.foreach { r =>
      val (anchor, posId, posCos) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val expect = exactSym(anchor).minBy(_._1)
      assert(posId == expect._1, s"anchor $anchor: pos $posId != ${expect._1}")
      assert(math.abs(posCos - expect._2) < 2e-6, s"anchor $anchor cos")
    }
  }

  test("negative: LCG formula with stepping; never the anchor or positive") {
    val n = Tables.load(spark, sfDir, "embeddings").count()
    out.foreach { r =>
      val (anchor, posId, negId) = (r.getLong(0), r.getLong(2), r.getLong(4))
      val cands = (0 to 2).map(s => ((anchor * 48271L + 7L) % n + s) % n)
      val expect = cands.find(c => c != anchor && c != posId).get
      assert(negId == expect, s"anchor $anchor: neg $negId != $expect")
      assert(negId != anchor && negId != posId)
    }
  }

  test("negative label/cosine come from the looked-up embedding row") {
    val byId = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(r.getInt(5) == byId(r.getLong(4)),
        s"anchor ${r.getLong(0)}: neg_label mismatch")
      assert(!r.isNullAt(6) && r.getDouble(6) <= 1.0 + 1e-9)
    }
  }

  test("hard negatives: never a true near-dup; true argmax below threshold") {
    val hard = Queries.all("q_contrastive_hard")(spark, sfDir).collect()
    assert(hard.nonEmpty)
    assert(hard.map(_.getLong(0)).toSet == exactSym.keySet,
      "hard variant mines every anchor")
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    hard.foreach { r =>
      val (anchor, negId, negCos, margin) =
        (r.getLong(0), r.getLong(3), r.getDouble(4), r.getDouble(5))
      // soundness: strictly below the near-dup threshold, so by the
      // threshold's own definition never a true near-dup of the anchor
      assert(negCos < 0.45, s"anchor $anchor: hard neg at $negCos")
      assert(!exactSym(anchor).exists(_._1 == negId),
        s"anchor $anchor: hard neg $negId IS a near-dup")
      // hardness: the driver-side quadratic recompute agrees it's argmax
      val best = vecs.view.filterKeys(_ != anchor)
        .mapValues(v => cos(vecs(anchor), v)).toSeq
        .filter(_._2 < 0.45).minBy { case (id, c) => (-c, id) }
      assert((negId, negCos) == best, s"anchor $anchor: $negId/$negCos != $best")
      assert(math.abs(margin - BigDecimal(r.getDouble(2) - negCos)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("non-contiguous vec_ids fail LOUDLY, not by silent anchor drop") {
    import spark.implicits._
    // two identical vectors (cos 1.0 → a guaranteed anchor pair) plus a
    // spectator, with a gap in the id space: n_total=3 but ids {0,1,9}
    // ⇒ the computed neg_id has no row and must raise, not drop
    val e = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(1.0f, 0.0f), 0),
      (9L, Seq(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val pairs = Seq((0L, 1L, 1.0)).toDF("vec_a", "vec_b", "cos")
    val ex = intercept[Exception] {
      operators.Similarity.contrastiveTriples(e, pairs).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("not contiguous")), ex.toString)
  }
}
