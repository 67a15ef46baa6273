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

  test("positivesQuotiented == positivesOf(expanded pairs) on a dup-rich corpus") {
    import spark.implicits._
    // exact-dup classes {0,3,7} and {1,5} (near-dups of each other),
    // a singleton {2} near class B, a zero-vector class {4,6} (no cosine
    // → never an anchor), and an isolated singleton {8}. Exercises every
    // quotient branch: intra m1/m2 election, inter min-rep election,
    // least() across both, null self-cos, and anchorless classes.
    val a = Seq(1.0f, 0.0f, 0.0f); val b = Seq(0.9f, 0.1f, 0.0f)
    val c = Seq(0.8f, 0.2f, 0.05f); val z = Seq(0.0f, 0.0f, 0.0f)
    val iso = Seq(0.0f, 0.0f, 1.0f)
    val e = Seq(
      (0L, a, 0), (3L, a, 0), (7L, a, 0),
      (1L, b, 0), (5L, b, 0),
      (2L, c, 0),
      (4L, z, 0), (6L, z, 0),
      (8L, iso, 1)).toDF("vec_id", "embedding", "label")
    val (clusters, _) = operators.Dedup.embeddingRepCandidatesOf(e)
    // brute-force EXACT rep pairs (isolates the quotient algebra from LSH
    // recall) and their member expansion — the pair-set ground truth
    val reps = clusters.select(col("rep"), col("embedding"), col("members"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getSeq[Long](2)))
    def cos(x: Array[Double], y: Array[Double]): Option[Double] = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
      if (nx == 0.0 || ny == 0.0) None
      else Some(BigDecimal(d / (math.sqrt(nx) * math.sqrt(ny)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val repPairRows = for {
      (ra, va, _) <- reps; (rb, vb, _) <- reps if ra < rb
      cv <- cos(va, vb) if cv >= 0.45
    } yield (ra, rb, cv)
    val repPairs = repPairRows.toSeq.toDF("vec_a", "vec_b", "cos")
    val memberOf = reps.map(r => r._1 -> r._3).toMap
    val expanded = (repPairRows.flatMap { case (ra, rb, cv) =>
      for (ma <- memberOf(ra); mb <- memberOf(rb))
        yield (math.min(ma, mb), math.max(ma, mb), cv)
    } ++ reps.flatMap { case (r, v, ms) =>
      for {
        cv <- cos(v, v).toSeq if cv >= 0.45
        ma <- ms; mb <- ms if ma < mb
      } yield (ma, mb, cv)
    }).toSeq.toDF("vec_a", "vec_b", "cos")
    val viaPairs = operators.Similarity.positivesOf(expanded)
      .orderBy(col("anchor_id")).collect().toSeq
    val viaQuotient = operators.Similarity.positivesQuotiented(clusters, repPairs)
      .orderBy(col("anchor_id")).collect().toSeq
    assert(viaQuotient == viaPairs)
    // sanity on the construction itself: dup-class members ARE anchors,
    // zero vectors and the isolated singleton are NOT
    val anchors = viaQuotient.map(_.getLong(0)).toSet
    assert(Set(0L, 3L, 7L, 1L, 5L, 2L).subsetOf(anchors))
    assert(!anchors.contains(4L) && !anchors.contains(6L) && !anchors.contains(8L))
    // election branches: anchor 0's min partner is INTER-class rep 1
    // (1 < its intra m2=3 — the least() across candidates); anchors 3,7
    // elect their INTRA m1=0 (0 < any other class's rep)
    val posOf = viaQuotient.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(posOf(0L) == 1L && posOf(3L) == 0L && posOf(7L) == 0L)
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
