package graft

/** Physical-plan regression net: the properties that make these queries
  * scale must stay visible in the executed plan — a refactor that silently
  * loses pushdown or broadcasts is a perf bug even while results stay
  * correct. (This is the `.explain` audit the project mandates, frozen
  * into assertions.)
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val qe = Queries.all(name)(spark, sfDir).queryExecution
    // formatted mode prints PushedFilters untruncated (toString elides)
    qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) +
      "\n" + qe.executedPlan.toString
  }

  test("date-bounded scans push filters to parquet") {
    // lineitem: plain timestamp column
    assert(planOf("q1_agg").contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(planOf("q6_filter_range").contains("GreaterThanOrEqual(l_shipdate"))
    // events: the ns→µs rewrite rule must land the bound on the RAW long
    assert(planOf("q_daily_transactions").contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"))
    assert(planOf("q_top5_zones").contains("LessThan(ts,"))
  }

  test("scans prune to the referenced columns") {
    val p = planOf("q_top5_zones")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("ts") && readSchema.contains("user_id"))
    assert(!readSchema.contains("props") && !readSchema.contains("event_type"),
      readSchema)
  }

  test("dimension joins broadcast; top-k compiles to TakeOrderedAndProject") {
    assert(planOf("q_join_broadcast").contains("BroadcastHashJoin"))
    assert(planOf("q_multi_join").contains("BroadcastHashJoin"))
    assert(planOf("q_sort_limit").contains("TakeOrderedAndProject"))
    assert(planOf("q_join_shuffle").contains("TakeOrderedAndProject"))
  }

  test("semi/anti joins plan as such (no row-multiplying inner join)") {
    assert(planOf("q_join_semi").contains("LeftSemi"))
    assert(planOf("q_join_anti").contains("LeftAnti"))
  }

  test("custom operator and LSH pipelines avoid pathological shapes") {
    val topk = planOf("q_topk_per_key")
    assert(topk.contains("TopKPerKeyPartial") && topk.contains("TopKPerKeyFinal"))
    assert(!topk.contains("Window"))
    // the text-path reuse of the operator keeps the same shape
    val langTop = planOf("q_top_tokens_per_lang")
    assert(langTop.contains("TopKPerKeyPartial") && !langTop.contains("Window"))
    // LSH candidate generation must be aggregate-shaped, not a self-join
    val mh = planOf("q_dedup_minhash_lsh")
    assert(!mh.contains("CartesianProduct"), mh)
    val sim = planOf("q_similarity_lsh")
    assert(!sim.contains("CartesianProduct"), sim)
    // triangle census: wedge join + closure join, never a cross product
    val tri = planOf("q_graph_triangles")
    assert(!tri.contains("CartesianProduct"), tri)
  }

  test("quotient rewrites: gram/LSS work keyed on distinct text, no cross product") {
    // containment: the benchmark gram set broadcasts; the training-side
    // explode + join must sit above a distinct-texts aggregate, and the
    // membership re-expansion is a hash join, never a cartesian
    val c = planOf("q_ngram_containment")
    assert(c.contains("BroadcastHashJoin"), c.take(2000))
    assert(!c.contains("CartesianProduct"), c.take(2000))
    assert(c.contains("HashAggregate"), c.take(2000))
    // LSS clusters: representative pair generation is aggregate-shaped
    val l = planOf("q_dedup_clusters_lss")
    assert(!l.contains("CartesianProduct"), l.take(2000))
  }

  test("semantic decontamination: bounded benchmark side broadcasts") {
    val p = planOf("q_decontaminate_semantic")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the 50-way expansion collapses map-side before any exchange
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("bloom prune: might_contain gates the fact scan before the join") {
    val p = planOf("q_bloom_prune")
    assert(p.contains("bloom_filter_agg"), p.take(2000))
    assert(p.contains("might_contain"), p.take(2000))
    // the bloom test must sit in the lineitem scan stage's Filter, below
    // the join — i.e. the filter line mentioning might_contain references
    // the fact-side key, not a post-join attribute
    val filterLine = p.linesIterator.find(l =>
      l.contains("might_contain") && l.toLowerCase.contains("filter"))
    assert(filterLine.exists(_.contains("l_orderkey")), filterLine.toString)
  }

  test("bloom decontamination: might_contain gates the gram stream pre-join") {
    val p = planOf("q_decontaminate_bloom")
    assert(p.contains("bloom_filter_agg"), p.take(2000))
    // the bloom test must gate the TRAINING gram stream in a Filter below
    // the verification join (the whole point: at 100 TB the eval grams
    // don't broadcast, and the bloom keeps non-candidates out of the
    // join's exchange)
    val filterLine = p.linesIterator.find(l =>
      l.contains("might_contain") && l.toLowerCase.contains("filter"))
    assert(filterLine.exists(_.contains("gram")), filterLine.toString)
  }

  test("log compaction is a pure aggregate: no window, partial agg present") {
    val p = planOf("q_log_compact")
    assert(!p.contains("Window"), p)
    // partial max_by before the exchange — one candidate per key per task
    assert(p.contains("partial_max_by") || p.contains("partial_maxby")
      || p.linesIterator.exists(l => l.contains("HashAggregate")
           && l.contains("max_by")), p.take(3000))
  }

  test("hopping window aggregates partially (explode before shuffle, agg after)") {
    val p = planOf("q_hopping_window")
    assert(!p.contains("CartesianProduct"), p)
    // the window() explode compiles to Expand/Generate feeding a partial
    // HashAggregate — the shuffle carries partial counts, not raw events
    assert(p.contains("Expand") || p.contains("Generate"), p.take(3000))
    assert(p.contains("HashAggregate"), p.take(3000))
  }

  test("tfidf windows per document and never globally; chunk dedup agg-joins") {
    val p = planOf("q_tfidf")
    // every Window partitions by doc_id — no empty partition spec anywhere
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("doc_id")), winLines.mkString("\n"))
    val ch = planOf("q_dedup_chunks")
    assert(!ch.contains("Window"), "chunk keeper election must be the " +
      "partial-aggregatable min-struct, not a window row_number")
    assert(!ch.contains("CartesianProduct"), ch)
    // the apply half rebuilds text inside a per-doc aggregate — same rules
    val app = planOf("q_dedup_chunks_apply")
    assert(!app.contains("Window") && !app.contains("CartesianProduct"), app.take(2000))
    // heavy hitters: candidate filter + count, no window; the only
    // nested-loop join is the deliberate 1-row total broadcast
    val hh = planOf("q_heavy_hitters")
    assert(!hh.contains("Window") && !hh.contains("CartesianProduct"), hh.take(2000))
  }

  test("analytics ops: day-bounded windows, broadcast sizes, no windows in funnel") {
    // concurrency's only window partitions by day — never an empty spec
    val conc = planOf("q_concurrency")
    val winLines = conc.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("day")), winLines.mkString("\n"))
    // funnel is pure agg+join — no window, no cartesian
    val fun = planOf("q_funnel")
    assert(!fun.contains("Window") && !fun.contains("CartesianProduct"), fun.take(2000))
    // retention broadcasts the tiny cohort-size side
    assert(planOf("q_retention").contains("BroadcastHashJoin"))
    // winsorize broadcasts the per-type fences back onto the scan
    assert(planOf("q_winsorize").contains("BroadcastHashJoin"))
  }

  test("IVF plans without windows or cartesian products, ≤1 hash exchange") {
    // on the structure-free gate corpus the viability gate routes IVF to
    // the exact baseline shape: query batch broadcast, corpus streams,
    // TopKPerKey bounded heaps — one hash exchange (qid clustering; the
    // rankStamp groupBy reuses its partitioning). The certify-path plan
    // shapes (scan-stage cell assignment + residual, broadcast probe
    // frames) are exercised by PipelineSpec's 16-direction corpus.
    val p = planOf("q_similarity_ivf")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    val hashEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashEx <= 1, s"$hashEx hash exchanges:\n$p")
  }

  test("PQ encodes in the scan stage; LUTs broadcast; no window") {
    val p = planOf("q_similarity_pq")
    assert(!p.contains("Window"), p)
    // on the structure-free gate corpus the viability gate routes PQ to
    // the exact baseline shape (query batch broadcast, corpus streams,
    // TopKPerKey bounded heaps); the certify-path ADC/shortlist plan is
    // exercised by PipelineSpec's structured corpus. Either way the
    // corpus side never hash-shuffles raw vectors for scoring — the only
    // hash exchanges are TopKPerKey qid clusterings and the final
    // presentation grouping.
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 4, s"$hashEx hash exchanges:\n$p")
    assert(p.contains("TopKPerKeyPartial"), p.take(3000))
    // the 10-row LUT side broadcasts (the deliberate 1×n nested loop)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(3000))
  }

  test("evolution ops: per-key windows only, agg-shaped merge, broadcast fences") {
    // SCD2: lag/lead/row_number share ONE (user_id | ts,event_id) window —
    // a single hash exchange feeds a single Window node; no global sort
    // before the final presentation orderBy
    val scd = planOf("q_scd2_build")
    val scdWins = scd.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(scdWins.nonEmpty && scdWins.forall(_.contains("user_id")), scdWins.mkString("\n"))
    assert(scd.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1, scd.take(3000))
    // MERGE diff: each side is a partial-aggregatable max_by (the exchange
    // carries one candidate per key per task), never a window row_number
    val mu = planOf("q_merge_upsert")
    assert(!mu.contains("Window"), mu.take(3000))
    assert(mu.contains("partial_max_by"), mu.take(3000))
    // EWMA: the prefix-sum window partitions by user_id — never global
    val ew = planOf("q_ewma")
    val ewWins = ew.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(ewWins.nonEmpty && ewWins.forall(_.contains("user_id")), ewWins.mkString("\n"))
    // z-score: the per-type fence frame broadcasts back onto the scan
    val zs = planOf("q_zscore_outliers")
    assert(zs.contains("BroadcastHashJoin"), zs.take(3000))
    assert(!zs.contains("Window"), zs.take(3000))
    // LM score: pure aggregate pipeline — the frequency join carries
    // distinct (doc,token) pairs, the corpus total is the one deliberate
    // 1-row broadcast; no window anywhere
    val lm = planOf("q_lm_score")
    assert(!lm.contains("Window"), lm.take(3000))
    assert(!lm.contains("CartesianProduct"), lm.take(3000))
    // trailing-range frame: per-user window over pre-aggregated days only
    val wr = planOf("q_window_range")
    val wrWins = wr.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(wrWins.nonEmpty && wrWins.forall(_.contains("user_id")), wrWins.mkString("\n"))
    // skew report: two bounded aggregates, no window, no join
    val sk = planOf("q_skew_report")
    assert(!sk.contains("Window") && !sk.contains("Join"), sk.take(3000))
  }

  test("exact similarity joins: inverted-index shapes, no self-join of raw docs") {
    // prefix join: candidate generation is aggregate-shaped (groupBy the
    // prefix token), the only joins are the bounded verification joins
    val pj = planOf("q_dedup_prefix")
    assert(!pj.contains("CartesianProduct"), pj.take(3000))
    assert(!pj.contains("Window"), pj.take(3000))
    // PassJoin: one exchange keys the (segment idx, content) index; the
    // pair product happens inside the aggregate, never as a plan join of
    // the raw corpus against itself
    val ed = planOf("q_editdist_pairs")
    assert(!ed.contains("CartesianProduct"), ed.take(3000))
    assert(!ed.contains("Window"), ed.take(3000))
    // sorted neighborhood: the ONLY window partitions by lang (bounded
    // lead chain), never an empty partition spec
    val sn = planOf("q_block_sorted")
    val snWins = sn.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(snWins.nonEmpty && snWins.forall(_.contains("lang")), snWins.mkString("\n"))
    assert(!sn.contains("CartesianProduct"), sn.take(3000))
    // pagerank: k bounded shuffles over the (checkpointed) edge list —
    // joins + aggregates only, no window, no cartesian
    val pg = planOf("q_pagerank")
    assert(!pg.contains("Window") && !pg.contains("CartesianProduct"), pg.take(3000))
    // quantile sketch aggregates partially (mergeable summaries — the
    // exchange carries sketch state, not rows) and never sorts the input
    val qa = planOf("q_quantile_approx")
    assert(qa.contains("partial_percentile_approx"), qa.take(3000))
    assert(!qa.contains("Window"), qa.take(3000))
  }

  test("quantize and per-key sample keep their scan-stage/bounded shapes") {
    // int8 quantization is pure per-row column algebra — no exchange at
    // all before the presentation sort, no window, no join
    val q = planOf("q_embed_quantize")
    assert(!q.contains("Window") && !q.contains("Join"), q.take(3000))
    assert(!q.contains("Exchange hashpartitioning"), q.take(3000))
    // per-key sampling rides the bounded-heap operator, not a window sort
    val s = planOf("q_sample_per_key")
    assert(s.contains("TopKPerKeyPartial") && s.contains("TopKPerKeyFinal"), s.take(3000))
    assert(!s.contains("Window"), s.take(3000))
  }

  test("substring dedup: no cross product, per-gid window, 2 hash scans") {
    val qe = Queries.all("q_dedup_substrings")(spark, sfDir).queryExecution
    val p = qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
    // island windows must be keyed by gid, never a global sort-everything
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("windowspecdefinition(gid")),
      specs.mkString("\n"))
    // the rolling hash runs in the scan stage, exactly twice (count pass +
    // candidate pass) in the lazy candidate plan; the public entry then
    // checkpoints candidates, so nothing downstream re-scans. A regression
    // to per-reference re-expansion showed up as 4 full scans.
    val candPlan = graft.operators.Dedup
      .substringCandidatePlan(Tables.load(spark, sfDir, "documents"))._2
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val scans = candPlan.linesIterator.count(_.contains("posexplode(windowhashes"))
    assert(scans == 2, s"expected 2 windowhashes scans, saw $scans")
  }

  test("weighted sampling is scan + TakeOrdered: no global sort, no shuffle") {
    val w = planOf("q_sample_weighted")
    assert(w.contains("TakeOrderedAndProject"), w.take(3000))
    assert(!w.contains("Exchange hashpartitioning"), w.take(3000))
    assert(!w.contains("Window") && !w.contains("Join"), w.take(3000))
  }

  test("row-pure text signals are scan-shaped: no hash exchange or join") {
    // the r11 shape rewrites frozen: per-doc entropy and repetition are
    // pure functions of the row, so their plans must stay scan → project
    // (the presentation sort's range exchange is the only exchange) — an
    // explode+groupBy regression here re-costs 10-20× at sf1
    for (n <- Seq("q_doc_entropy", "q_doc_repetition")) {
      val p = planOf(n)
      assert(!p.contains("Exchange hashpartitioning"), s"$n shuffles: ${p.take(2000)}")
      assert(!p.contains("Join"), s"$n joins: ${p.take(2000)}")
      assert(!p.contains("Generate explode"), s"$n explodes: ${p.take(2000)}")
    }
    // the URL curation pair: canonicalize is a pure map; caps is one
    // TopKPerKey exchange and nothing else
    val u = planOf("q_url_canonicalize")
    assert(!u.contains("Exchange hashpartitioning") && !u.contains("Join"),
      u.take(2000))
    val d = planOf("q_domain_caps")
    assert(d.contains("TopKPerKey"), d.take(2000))
    assert(!d.contains("Window") && !d.contains("Join"), d.take(2000))
    // incremental caps: store side must aggregate (never sort/top), batch
    // side keeps the TopKPerKey heaps, and the only window runs on the
    // ≤K-per-domain survivor frame AFTER the heaps (heap node below it)
    val di = planOf("q_domain_caps_incremental")
    assert(di.contains("TopKPerKey"), di.take(3000))
    assert(di.contains("partial_count") || di.contains("partial_min"),
      di.take(3000))
    assert(!di.contains("CartesianProduct") && !di.contains("BroadcastNestedLoopJoin"),
      di.take(3000))
  }

  test("multimodal ingest: one materialized codec pass, skew-safe class facts") {
    // the codec pass itself, audited on the LAZY frame (the query
    // materializes it via localCheckpoint, which truncates lineage out of
    // the query's own plan): exactly ONE fused MapPartitions decode — the
    // node renders 2–4 times across planOf-style dumps (formatted tree +
    // node detail + executedPlan.toString); 0 would mean the codec pass
    // vanished, ≥5 a second pass
    val lazyQe = graft.operators.Multimodal
      .ingestFingerprintFrame(spark, sfDir).queryExecution
    val lp = lazyQe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) +
      "\n" + lazyQe.executedPlan.toString
    val mpCount = "MapPartitions".r.findAllIn(lp).size
    assert(mpCount >= 2 && mpCount <= 4, s"fused decode count $mpCount:\n${lp.take(3000)}")
    // the scan under the codec pass reads ids only (payloads are
    // synthesized in the pass; scanning text here re-reads the corpus)
    val readSchema = lp.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      readSchema)
    // the query's class facts: NO window anywhere — a window partition's
    // size is its class's duplication count, and the hottest class of a
    // 100 TB corpus lands on ONE WindowExec task with no AQE mitigation.
    // Facts must be map-side-combined aggregates (partial_min/partial_count
    // collapse a mega-class to one row per map task before the exchange)
    // joined back via AQE-skew-splittable equi-joins.
    val p = planOf("q_multimodal_ingest")
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("partial_min") && p.contains("partial_count"),
      p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("stratified sample ranks via bounded heaps; concurrency sweep is hierarchical") {
    // r12 de-skew pair: a per-LANG row_number window ranked a stratum
    // (corpus/|langs|) on one task; the quota now comes from TopKPerKey
    // heaps with the rank window running only on the ≤k survivors
    val st = planOf("q_sample_stratified")
    assert(st.contains("TopKPerKeyPartial") && st.contains("TopKPerKeyFinal"),
      st.take(3000))
    // the per-DAY running sum decomposes into (day, hour) windows plus a
    // broadcast offset join — the plan must show the partial-aggregated
    // bucket totals and the broadcast, and the sweep window must key on
    // BOTH day and hr (a regression to the day-only window serializes a
    // full day on one task)
    val cc = planOf("q_concurrency")
    assert(cc.contains("partial_sum"), cc.take(3000))
    assert(cc.contains("BroadcastHashJoin"), cc.take(3000))
    assert(cc.contains("windowspecdefinition(day") && cc.contains("hr"),
      cc.take(3000))
  }

  test("semantic incremental admission probes via band equi-joins, never all-pairs") {
    // the arrival gate must join batch×INDEX on (band_idx, band_val) —
    // a regression to batch×store all-pairs shows as a cartesian or a
    // nested-loop join; the quotient aggregates stay map-side combined
    val p = planOf("q_dedup_semantic_incremental")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("band_idx") && p.contains("band_val"), p.take(3000))
    assert(p.contains("partial_min"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("capstone training mix: URL gates lead with bounded heaps, no window") {
    // r12: canonicalize → blocklist → per-domain cap ahead of dedup —
    // the cap must stay the TopKPerKey heap (never a rank window), the
    // blocklist a literal in-row filter, and the whole composite free of
    // cartesians; the URL-gate branch scans only (doc_id, source)
    val p = planOf("q_training_mix")
    assert(p.contains("TopKPerKey"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.exists(l => l.contains("doc_id") && l.contains("source")
      && !l.contains("text")), readSchemas.mkString("\n"))
  }

  test("quality classifier scores in-scan: no join, window, or hash exchange") {
    val qc = planOf("q_quality_classifier")
    assert(!qc.contains("Join"), qc.take(3000))
    assert(!qc.contains("Window"), qc.take(3000))
    assert(!qc.contains("Exchange hashpartitioning"), qc.take(3000))
  }

  test("k-means: broadcast centroids, partial-agg collapse, no window") {
    val km = planOf("q_kmeans")
    // every centroid set (init filter + recentered k-row frame) broadcasts;
    // the k-way expansion must never become a shuffled or cartesian join
    assert(km.contains("BroadcastNestedLoopJoin"), km.take(3000))
    assert(!km.contains("CartesianProduct"), km.take(3000))
    assert(!km.contains("SortMergeJoin"), km.take(3000))
    // assignment collapses map-side: one candidate per vector per
    // partition crosses the exchange, never the k-expanded rows
    assert(km.contains("partial_min"), km.take(3000))
    // recenter is the (cid,pos)-keyed two-level aggregate, no window
    assert(km.contains("partial_sum"), km.take(3000))
    assert(!km.contains("Window"), km.take(3000))
  }

  test("perceptual image dedup: banded buckets, never an all-pairs join") {
    val p = planOf("q_multimodal_perceptual")
    // candidates come from the band bucket aggregate (primitive-loop
    // pair expansion), not a self-join of the fingerprint frame
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("idpairs"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("contrastive triples: LSH pair set + bounded joins, no cartesian") {
    val p = planOf("q_contrastive_triples")
    // the only crossed frame is the broadcast 1-row corpus count; the
    // negative lookup is an equi-join, positives a partial-agg struct-min
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("partial_min"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("hard-negative mining: broadcast anchors + bounded top-k heaps") {
    val p = planOf("q_contrastive_hard")
    // corpus streams against broadcast anchors; the argmax is the custom
    // partial/final heap operator, never a per-anchor window sort
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"),
      p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("snapshot diff: hashes computed below the single full-outer join") {
    val p = planOf("q_snapshot_diff")
    assert(p.contains("FullOuter"), p.take(3000))
    // md5 is projected in the scan stage, so only (key, hash) crosses the
    // exchange — the hash expression must sit under the join, not above it
    // (node details list children before the join node)
    val joinAt = p.indexOf("Join type: FullOuter")
    assert(joinAt > 0 && p.take(joinAt).contains("md5"), p.take(3000))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p.take(3000))
  }

  test("mix weights / time split: 1-row normalizer broadcasts, no window") {
    for (name <- Seq("q_mix_weights", "q_time_split")) {
      val p = planOf(name)
      assert(p.contains("BroadcastNestedLoopJoin"), s"$name: ${p.take(3000)}")
      assert(!p.contains("SortMergeJoin"), s"$name: ${p.take(3000)}")
      assert(!p.contains("Window"), s"$name: ${p.take(3000)}")
      // the per-group reduction partial-aggregates map-side
      assert(p.contains("partial_"), s"$name: ${p.take(3000)}")
    }
  }

  test("PR curve: in-scan logit, literal explode, 5-group partial agg") {
    val p = planOf("q_classifier_pr_curve")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(3000))
    assert(p.contains("Generate"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(3000))
  }

  test("embed outliers: bounded frames broadcast; aggs partial; no window") {
    val p = planOf("q_embed_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(3000))
  }

  test("source overlap: pair fan-out from the gram agg, never a gram self-join") {
    val p = planOf("q_source_overlap")
    // the scale trap is joining the (source,gram) frame to itself on gram
    // (output-quadratic per hot gram); the plan must build per-gram source
    // sets by aggregation and only broadcast-join the |S|-row totals
    assert(p.contains("collect_set"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("incremental minhash: band equi-join between sides, no cartesian") {
    val p = planOf("q_dedup_minhash_incremental")
    // candidates come from a hash-shuffled (band_idx, band_hash) equi-join
    // BETWEEN batch and corpus signatures — never a cross product, never
    // a window; verification joins are id-keyed equi-joins
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    // decision output comes from a left join preserving every batch doc
    assert(p.contains("LeftOuter"), p.take(3000))
  }

  test("audio features: partition-parallel decode, no joins or keyed shuffles") {
    val p = planOf("q_audio_features")
    assert(p.contains("MapPartitions"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
  }

  test("embed project: literal model in-scan, one keyed agg, no join") {
    val p = planOf("q_embed_project")
    // μ and v are bounded literal arrays — the projection plan must not
    // contain any join; the only exchange is the vec_id-keyed aggregate
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(3000))
  }

  test("boilerplate strip: quotient equi-joins + anti-join, no window") {
    val p = planOf("q_boilerplate_strip")
    // kept words come from an anti-join against covered positions, the
    // reassembly from an aggregate sort — never a per-doc window pass
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("chunk overlap: pure in-scan Generate, no joins or keyed shuffles") {
    val p = planOf("q_chunk_overlap")
    assert(p.contains("Generate"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    // the only exchange is the presentation sort's range partitioning
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
  }

  test("novelty: two linear gram-keyed exchanges, min-doc partial agg") {
    val p = planOf("q_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"), p.take(3000))
    // first-occurrence table is an aggregate (partial min), not a window
    assert(p.contains("partial_min"), p.take(3000))
    // the gram join must be an equi-join (hashable key), never a
    // nested-loop; Catalyst may legitimately broadcast the aggregated
    // first-occurrence side at gate SF (its estimate grows with the
    // corpus, flipping to a shuffled join at scale)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }
}
