package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25 + inverted-index behavior: hand-computed scores on a crafted
  * corpus, posting-list laws, and the broadcast-shape plan audit. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // crafted masses: apple 6, banana 3, cherry 2, rest 1 → query terms are
  // unambiguously (apple, banana, cherry); doc 3 hits none of them
  private val crafted = Seq(
    1L -> "apple banana apple cherry banana",
    2L -> "apple apple apple apple banana cherry",
    3L -> "dog cat fish")

  test("bm25: hand-computed scores, hit filtering, ordering") {
    val out = Retrieval.bm25TopK(corpus(crafted: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L).sortBy { id => // by score desc
      -expectedBm25(id)
    }, s"docs/order wrong: ${out.toSeq}")
    assert(out.forall(_._2 == 3L), s"each kept doc hits all 3 terms: ${out.toSeq}")
    out.foreach { case (id, _, score) =>
      assert(math.abs(score - expectedBm25(id)) <= 2e-6,
        s"doc $id: got $score expected ${expectedBm25(id)}")
    }
  }

  /** Same formula, driver-side (Math.log vs PortableLn differ ≤ 1 ulp —
    * the 2e-6 tolerance absorbs it; cross-engine exactness is the DuckDB
    * hash gate's job, this validates the tf/df/dl/avgdl assembly). */
  private def expectedBm25(docId: Long): Double = {
    val texts = crafted.toMap
    val toks = texts.view.mapValues(_.split(" ").toSeq).toMap
    val n = texts.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val qts = Seq("apple", "banana", "cherry")
    val s = qts.map { t =>
      val tf = toks(docId).count(_ == t)
      if (tf == 0) BigDecimal(0)
      else {
        val df = toks.values.count(_.contains(t))
        val idf = BigDecimal(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        val dl = toks(docId).size
        BigDecimal(idf.toDouble * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
    }.sum
    s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("bm25 on the corpus: bounded output, monotone scores, hits in range") {
    val rows = Queries.all("q_bm25")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse, s"not descending: $scores")
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 3))
  }

  test("inverted index: postings enumerate exactly the docs holding the token") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = Queries.all("q_inverted_index")(spark, sfDir).collect()
    assert(out.length == 20)
    val dfs = out.map(r => r.getLong(1)).toSeq
    assert(dfs == dfs.sorted.reverse, "df not descending")
    out.take(3).foreach { r =>
      val (token, df, postings) = (r.getString(0), r.getLong(1), r.getString(3))
      val ids = postings.split(",").map(_.toLong).toSeq
      assert(ids == ids.sorted && ids.size == df, s"$token: df=$df vs ${ids.size}")
      val expected = docs
        .filter(array_contains(split(lower($"text"), " "), token))
        .select($"doc_id").as[Long].collect().toSeq.sorted
      assert(ids == expected, s"postings for '$token' wrong")
    }
  }

  test("rrf: fusion arithmetic law, rank sanity, ordering") {
    val rows = Queries.all("q_hybrid_rrf")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    def rank(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    def r9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val recomputed = rows.map { r =>
      val c = rank(r, 1).map(l => r9(1.0 / (l + 60))).getOrElse(BigDecimal(0)) +
        rank(r, 2).map(v => r9(1.0 / (v + 60))).getOrElse(BigDecimal(0))
      c.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.zip(recomputed).foreach { case (r, exp) =>
      assert(r.getDouble(3) == exp, s"fusion arithmetic broken at $r")
    }
    // ranks come from top-20 pools and are unique within each list
    Seq(1, 2).foreach { i =>
      val rs = rows.flatMap(rank(_, i))
      assert(rs.forall(r => r >= 1 && r <= 20), s"rank out of pool: ${rs.toSeq}")
      assert(rs.distinct.length == rs.length, s"duplicate ranks: ${rs.toSeq}")
    }
    val scores = rows.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse, s"not descending: $scores")
    assert(scores.head <= 2.0 / 61 + 1e-9 && scores.last > 0)
    // a doc in BOTH pools beats any single-pool doc with equal-or-worse rank
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    for (b <- both; s <- single) {
      val sRank = rank(s, 1).orElse(rank(s, 2)).get
      if (rank(b, 1).get <= sRank && rank(b, 2).get <= sRank)
        assert(b.getDouble(3) > s.getDouble(3), s"fusion not monotone: $b vs $s")
    }
  }

  test("plan audit: query terms and corpus stats broadcast; no cartesian product") {
    val plan = Queries.all("q_bm25")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "query-term join must broadcast")
    assert(!plan.contains("CartesianProduct"),
      "1-row stats frames must broadcast, not cartesian")
  }

  test("sharded index: segment concatenation reproduces the monolithic posting list") {
    // the production (token, segment) sharding must lose nothing: per
    // token, appending segment postings in segment order equals the
    // monolithic list, and stats columns agree on every shard row
    val mono = Queries.all("q_inverted_index")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // segWidth 16 so the 50-doc test corpus genuinely spans segments (the
    // registered query's 128 is exercised against the oracle at sf0.01)
    val segWidth = 16L
    val shards = operators.Retrieval.invertedIndexSharded(
      Tables.load(spark, sfDir, "documents"), 20, segWidth).collect()
    assert(shards.length > mono.size, "sharding vacuous: one segment per token")
    val bySeg = shards.groupBy(_.getString(0))
    assert(bySeg.keySet == mono.keySet)
    bySeg.foreach { case (token, rows) =>
      val (df, totalTf, postings) = mono(token)
      rows.foreach { r =>
        assert(r.getLong(1) == df && r.getLong(2) == totalTf,
          s"$token: shard stats drift")
      }
      val rebuilt = rows.sortBy(_.getLong(3)).map(_.getString(4)).mkString(",")
      assert(rebuilt == postings, s"$token: segment concat != monolithic list")
      // every row bounded by the segment width
      rows.foreach { r =>
        val ids = r.getString(4).split(",").map(_.toLong)
        assert(ids.length <= segWidth &&
          ids.forall(_ / segWidth == r.getLong(3)),
          s"$token seg ${r.getLong(3)}: ids outside segment or over width")
      }
    }
  }

  test("segment merge: merged generations == from-scratch build over the union") {
    // the compaction law (r13 verdict #6): building two disjoint
    // generations independently and merging must be row-identical to one
    // build over the union — for EVERY token, not just nominees. segWidth
    // 16 and boundary 24 so (a) the corpus spans segments and (b) the
    // generation boundary falls inside segment 1, forcing the within-
    // segment concatenation path.
    import graft.operators.Retrieval
    val d = Tables.load(spark, sfDir, "documents")
    val segWidth = 16L
    val g1 = Retrieval.segmentPostings(d.filter(col("doc_id") < 24), segWidth)
    val g2 = Retrieval.segmentPostings(d.filter(col("doc_id") >= 24), segWidth)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val k1 = keyed(g1); val k2 = keyed(g2)
    val straddling = k1.keySet.intersect(k2.keySet)
    assert(straddling.nonEmpty,
      "fixture vacuous: no (token, segment) straddles the generations")
    val merged = keyed(Retrieval.mergeSegments(g1, g2))
    val rebuilt = keyed(Retrieval.segmentPostings(d, segWidth))
    assert(merged.nonEmpty && merged == rebuilt, "merged != rebuilt")
    // and the registered serve form agrees with a from-scratch sharded
    // build at the production segWidth
    val serve = Queries.all("q_index_segment_merge")(spark, sfDir).collect().toSeq
    val scratch = Queries.all("q_inverted_index_sharded")(spark, sfDir).collect().toSeq
    assert(serve.nonEmpty && serve == scratch,
      "merged serve form drifts from the from-scratch sharded index")
  }
}
