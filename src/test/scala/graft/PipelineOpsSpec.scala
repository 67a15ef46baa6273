package graft

import org.apache.spark.sql.functions._

/** Semantics + plan shape of the training-data pipeline operators
  * (PII redaction, repetition metrics, incremental dedup, sharding,
  * sequence packing). The DuckDB oracle covers value equality; these
  * tests freeze the invariants the oracle can't see. */
class PipelineOpsSpec extends SparkSpec {

  private def q(name: String) = Queries.all(name)(spark, sfDir)

  test("url canonicalization: idempotent, tracking-free, structure kept") {
    val out = q("q_url_canonicalize").cache()
    try {
      // canonical form is a FIXPOINT of the canonicalizer — running it
      // again changes nothing (the defining property of a canonical form)
      val twice = out.withColumn("again",
        operators.PipelineOps.canonicalizeUrl(col("canonical_url")))
      assert(twice.filter(col("again") =!= col("canonical_url")).isEmpty,
        "canonicalization is not idempotent")
      // no tracking params, fragments, default ports or www survive
      assert(out.filter(col("canonical_url").rlike(
        "utm_|fbclid|gclid|#|:443|//www\\.")).isEmpty)
      // the retained query params survive with their values
      assert(out.filter(!col("canonical_url").rlike("\\?id=[0-9]+&page=[0-9]+$"))
        .isEmpty, "real params must survive canonicalization")
      // path case is PRESERVED (case-sensitive per RFC 3986)
      assert(out.filter(!col("canonical_url").contains("/Path/")).isEmpty)
    } finally out.unpersist()
  }

  test("domain caps: never upsample, exact per-domain min(k, n), stable") {
    val out = q("q_domain_caps").cache()
    try {
      val d = Tables.load(spark, sfDir, "documents")
        .withColumn("domain", concat(lower(col("source")),
          col("doc_id") % 3, lit(".example.com")))
      val sizes = d.groupBy(col("domain")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val kept = out.groupBy(col("domain")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // every domain appears; keeps = min(5, domain size); never more
      assert(kept.keySet == sizes.keySet, "a domain vanished or appeared")
      kept.foreach { case (dom, n) =>
        assert(n == math.min(5L, sizes(dom)), s"$dom keeps $n != min(5, ${sizes(dom)})")
      }
      // the cap drops something at this SF (domains are larger than k)
      assert(kept.values.sum < sizes.values.sum, "cap was a no-op")
      // kept rows are corpus rows (no synthesis in the keep-set)
      val ids = d.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out.collect().forall(r => ids.contains(r.getLong(1))))
    } finally out.unpersist()
  }

  test("incremental domain caps: quota law — store keeps + batch admits == single-shot cap size") {
    // the incremental contract: store keeps are FIXED (admission is
    // irrevocable), so the member sets may differ from a single-shot cap,
    // but per-domain TOTAL keep counts must agree: min(K, store_n) +
    // admits == min(K, store_n + batch_n). Also: admits ⊆ batch docs, and
    // a store-saturated domain admits nothing.
    val admits = q("q_domain_caps_incremental")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val d = Tables.load(spark, sfDir, "documents")
      .withColumn("domain", concat(lower(col("source")),
        col("doc_id") % 3, lit(".example.com")))
    val storeN = d.filter(col("doc_id") % 10 =!= 0).groupBy(col("domain"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchN = d.filter(col("doc_id") % 10 === 0).groupBy(col("domain"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchIds = d.filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admits.forall(a => batchIds.contains(a._2)), "admitted a store doc")
    val admitN = admits.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    (storeN.keySet ++ batchN.keySet).foreach { dom =>
      val s = storeN.getOrElse(dom, 0L); val b = batchN.getOrElse(dom, 0L)
      val total = math.min(5L, s) + admitN.getOrElse(dom, 0L)
      assert(total == math.min(5L, s + b),
        s"$dom: store=$s batch=$b admits=${admitN.getOrElse(dom, 0L)}")
      if (s >= 5L) assert(!admitN.contains(dom), s"$dom saturated but admitted")
    }
    assert(admits.nonEmpty)
  }

  test("domain blocklist: flags exactly the listed domains; stale entry no-op") {
    val out = q("q_domain_blocklist").cache()
    try {
      val blocked = out.filter(col("blocked")).select("domain").distinct()
        .collect().map(_.getString(0)).toSet
      // only listed real domains flag, and the gate actually discriminates
      assert(blocked.nonEmpty && blocked.subsetOf(Set(
        "src10.example.com", "src41.example.com", "src122.example.com")))
      // the deliberately-stale blocklist entry is a no-op, not an error
      assert(!blocked.contains("badhost.example.com"))
      // total: one flag row per corpus doc
      assert(out.count() == Tables.load(spark, sfDir, "documents").count())
    } finally out.unpersist()
  }

  test("pii redaction leaves no matching PII behind") {
    val out = q("q_pii_redact").cache()
    try {
      // every doc got exactly one planted email/ip/phone, and all are gone
      assert(out.filter(col("n_emails") =!= 1 || col("n_ips") =!= 1 ||
        col("n_phones") =!= 1).isEmpty)
      val residue = out.filter(
        col("clean_text").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}") ||
        col("clean_text").rlike("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}") ||
        col("clean_text").rlike("[0-9]{3}-[0-9]{2,}"))
      assert(residue.isEmpty, "redacted text still matches a PII pattern")
      assert(out.filter(!col("clean_text").contains("[EMAIL]")).isEmpty)
    } finally out.unpersist()
  }

  test("quality classifier: logit equals an exact driver-side rescore") {
    // the in-scan fold must equal an independent exact recomputation —
    // the dyadic-weight design means NO tolerance is needed, and a fold
    // that lost exactness (e.g. weights no longer 64ths, or a rounding
    // inserted mid-sum) would show up as a strict inequality here
    val w = operators.TextAnalysis.clfWeights.toMap
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = q("q_quality_classifier").collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val toks = docs(r.getLong(0)).toLowerCase.split(" ", -1)
      val s = toks.map(t => w.getOrElse(t, 0) / 64.0).sum
      val logit = BigDecimal(operators.TextAnalysis.clfBias + s / toks.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(1) == toks.length, s"doc ${r.getLong(0)}")
      assert(r.getDouble(2) == logit, s"doc ${r.getLong(0)}")
      assert(r.getBoolean(3) == (logit > 0), s"doc ${r.getLong(0)}")
    }
    // the model must actually separate: both classes present at gate scale
    val kept = out.count(_.getBoolean(3))
    assert(kept > 0 && kept < out.length, s"kept=$kept of ${out.length}")
  }

  test("repetition ratios are in [0,1] and top token bounds the mode") {
    val bad = q("q_doc_repetition").filter(
      col("dup_word_ratio") < 0 || col("dup_word_ratio") > 1 ||
      col("dup_bigram_ratio") < 0 || col("dup_bigram_ratio") > 1 ||
      col("top_tok_ratio") <= 0 || col("top_tok_ratio") > 1 ||
      col("top_tok_cnt") < 1 || col("top_tok_cnt") > col("n_tokens"))
    assert(bad.isEmpty)
  }

  test("substring-span dedup matches a brute-force reference on crafted docs") {
    import spark.implicits._
    import graft.operators.Dedup
    val W = Dedup.subWin
    val shared = "0123456789" * 4 // 40 chars embedded in two distinct docs
    val block = "abcdefghijklmnopqrstuvwxyzABCDEF" // 32 chars, repeated in-doc
    val corpus = Seq(
      1L -> ("AAAA" + shared + "BBBB"),
      2L -> ("CCCCCC" + shared + "DDDDDD"),
      3L -> "GHIJKLMNOPQRSTUVWXYZghijklmnopqrstuvwxyz!#&*+-ABCD", // exact pair
      4L -> "GHIJKLMNOPQRSTUVWXYZghijklmnopqrstuvwxyz!#&*+-ABCD",
      5L -> (block + "=@[]{}()<>~^_|;:,.?/%$#!=@[]" + block + "??ENDP"),
      6L -> "a unique sentence with nothing at all repeated anywhere here")
    // independent O(n·L) reference: count every window string, mark
    // positions with corpus count ≥ 2, merge islands with gap ≤ W
    val cnt = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    for ((_, t) <- corpus; i <- 0 to t.length - W) cnt(t.substring(i, i + W)) += 1
    val expect = corpus.flatMap { case (id, t) =>
      val pos = (0 to t.length - W).filter(i => cnt(t.substring(i, i + W)) >= 2)
      if (pos.isEmpty) None else {
        val islands = pos.foldLeft(List.empty[(Int, Int)]) {
          case ((s0, e0) :: rest, p) if p - e0 <= W => (s0, p) :: rest
          case (acc, p) => (p, p) :: acc
        }
        Some(id -> ((islands.size.toLong,
          islands.map { case (s, e) => (e - s + W).toLong }.sum)))
      }
    }.toMap
    val got = Dedup.duplicatedSubstringSpans(
      corpus.toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")).cast("long")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect, s"got=$got\nexpect=$expect")
    // semantics pins: exact-dup pair → whole-doc span; in-doc repeat of a
    // single window → two 32-char islands; unique doc absent
    assert(got(3L) == ((1L, 50L)) && got(4L) == ((1L, 50L)))
    assert(got(5L) == ((2L, 64L)))
    assert(!got.contains(6L))
  }

  test("weighted sample without replacement = the k smallest A-ES keys") {
    // independent replay of the draw: JVM MessageDigest md5 + Math.log,
    // no Spark expressions — proves the query selects exactly the 20
    // globally-minimal keys of key = -ln(u)/n_chars
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 65536.0
      -math.log(u) / w
    }
    val expect = docs.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k) => (k, id) }.take(20)
    val got = q("q_sample_weighted").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == expect.toSeq,
      s"got=${got.take(3).mkString(",")} expect=${expect.take(3).mkString(",")}")
  }

  test("incremental dedup: output disjoint from store, collapses batch copies") {
    val docs = Tables.load(spark, sfDir, "documents")
    val fp = md5(array_join(array_sort(array_distinct(
      split(lower(col("text")), " "))), " ").cast("binary"))
    val storeFps = docs.filter(col("doc_id") < 250).select(fp.as("fp")).distinct()
    val out = q("q_dedup_incremental").cache()
    try {
      assert(out.join(storeFps, "fp").isEmpty,
        "a kept fingerprint already exists in the store")
      assert(out.filter(col("keep_id") < 250).isEmpty)
      // the corpus has real cross-split and in-batch duplicates — the op
      // must actually drop something, not just pass the batch through
      val batchN = docs.filter(col("doc_id") >= 250).count()
      assert(out.count() < batchN, s"no dedup happened (out=${out.count()}, batch=$batchN)")
    } finally out.unpersist()
  }

  test("incremental dedup composes: store keeps ∪ batch keeps == full-corpus keeps") {
    // the algebraic contract that makes batch-at-a-time dedup sound: doing
    // the store first and the batch incrementally must select exactly the
    // keep-set a single full-corpus dedup would (store ids < batch ids, so
    // a fingerprint in both halves keeps its store minimum either way)
    val docs = Tables.load(spark, sfDir, "documents")
    val fp = md5(array_join(array_sort(array_distinct(
      split(lower(col("text")), " "))), " ").cast("binary"))
    def keeps(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.groupBy(fp.as("fp")).agg(min(col("doc_id")).as("k"))
        .collect().map(_.getLong(1)).toSet
    val fullKeeps = keeps(docs)
    val storeKeeps = keeps(docs.filter(col("doc_id") < 250))
    val batchKeeps = q("q_dedup_incremental")
      .collect().map(_.getLong(1)).toSet
    assert((storeKeeps ++ batchKeeps) == fullKeeps)
  }

  test("connected components: transitive closure beats per-pair keep-smallest") {
    import spark.implicits._
    // star 1-3, 2-3 plus pair 10-11: per-pair "drop doc_b" keeps {1,2,10}
    // — but 1 and 2 are transitively similar via 3; components keep {1,10}
    val pairs = Seq((1L, 3L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labels = operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // long chain converges too (diameter > 1 iteration's reach)
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val chainLabels = operators.Dedup.connectedComponents(chain)
      .collect().map(_.getLong(1)).toSet
    assert(chainLabels == Set(1L))
  }

  test("seeded shuffle: reproducible per seed, decorrelated across seeds") {
    val d = Tables.load(spark, sfDir, "documents")
    def perm(seed: String): Seq[Long] =
      operators.PipelineOps.seededShuffle(d, seed)
        .orderBy(col("pos")).collect().map(_.getAs[Long]("doc_id")).toSeq
    val e0 = perm("epoch-0")
    assert(e0 == perm("epoch-0"), "same seed must reproduce exactly")
    val e1 = perm("epoch-1")
    assert(e0.toSet == e1.toSet, "a permutation: same docs")
    assert(e0 != e1, "different seeds must decorrelate the order")
    assert(e0 != e0.sorted, "shuffled, not identity order")
  }

  test("tfidf: 3 rows per doc, df consistent, rare terms outscore common") {
    val out = q("q_tfidf").cache()
    try {
      val perDoc = out.groupBy("doc_id").count().select("count").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(perDoc == Set(3L), s"expected exactly 3 terms per doc, got $perDoc")
      // a token's df must equal its number of distinct docs in the output's
      // underlying tf frame; spot-check via recompute on the corpus
      val docs = Tables.load(spark, sfDir, "documents")
      val nDocs = docs.count()
      val dfReal = docs
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
        .groupBy("t").agg(countDistinct("doc_id").as("df_real"))
      val bad = out.join(dfReal, out("token") === dfReal("t"))
        .filter(col("df") =!= col("df_real")).count()
      assert(bad == 0, s"$bad tokens with df != true document frequency")
      // every emitted score positive (df < N for any chosen distinctive term)
      assert(out.filter(col("tfidf") <= 0.0).count() == 0)
      assert(out.filter(col("df") > nDocs).count() == 0)
    } finally out.unpersist()
  }

  test("ngram counts: bigram totals conserve (sum over all = Σ(len-1))") {
    val docs = Tables.load(spark, sfDir, "documents")
    val expected = docs
      .select((size(split(lower(col("text")), " ")) - 1).as("n"))
      .filter(col("n") >= 1).agg(sum("n")).head().getLong(0)
    val allBigrams = docs
      .select(split(lower(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))"))
        .as("bigram"))
      .groupBy("bigram").count().agg(sum("count")).head().getLong(0)
    assert(allBigrams == expected)
    // the registered query is the top-20 slice of that frame
    assert(q("q_ngram_counts").count() == 20)
  }

  test("chunk dedup: totals conserve; a doc never dups against itself only") {
    val out = q("q_dedup_chunks").cache()
    try {
      // every chunk counted exactly once across the corpus
      val docs = Tables.load(spark, sfDir, "documents")
      val totalChunks = docs
        .select(ceil(size(split(col("text"), " ")) / 10.0).cast("long").as("n"))
        .agg(sum("n")).head().getLong(0)
      assert(out.agg(sum("n_chunks")).head().getLong(0) == totalChunks)
      // dups never exceed chunks; at least one doc has zero dups (the
      // first-occurrence keeper of every distinct chunk family)
      assert(out.filter(col("n_dup_chunks") > col("n_chunks")).count() == 0)
      assert(out.filter(col("n_dup_chunks") === 0).count() >= 1)
      // corpus-wide: kept = distinct chunk strings
      val distinctChunks = docs
        .select(split(col("text"), " ").as("w"))
        .select(explode(expr(
          """transform(sequence(0, cast(ceil(size(w)/10.0) as int) - 1),
             i -> concat_ws(' ', slice(w, i*10+1, 10)))""")).as("c"))
        .distinct().count()
      val kept = totalChunks - out.agg(sum("n_dup_chunks")).head().getLong(0)
      assert(kept == distinctChunks,
        s"kept $kept chunks but corpus has $distinctChunks distinct")
    } finally out.unpersist()
  }

  test("chunk dedup apply: kept counts reconcile; clean text has kept chunks") {
    val counts = q("q_dedup_chunks").cache()
    val applied = q("q_dedup_chunks_apply").cache()
    try {
      // per doc: n_kept == n_chunks - n_dup_chunks (docs with 0 kept absent)
      val mismatch = counts.join(applied, Seq("doc_id"), "left")
        .filter(coalesce(col("n_kept"), lit(0L)) =!=
          col("n_chunks") - col("n_dup_chunks")).count()
      assert(mismatch == 0)
      // clean text word count == 10*(n_kept-1) + last-chunk size ≤ 10*n_kept
      val bad = applied.filter(
        size(split(col("clean_text"), " ")) > col("n_kept") * 10 ||
        size(split(col("clean_text"), " ")) <= (col("n_kept") - 1) * 10).count()
      assert(bad == 0)
    } finally { counts.unpersist(); applied.unpersist() }
  }

  test("shard assignment is total and deterministic across reruns") {
    val a = q("q_shard_assign").collect()
    val b = q("q_shard_assign").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.getLong(0)).toSeq == (0L until 16L))
    assert(a.map(_.getLong(1)).sum ==
      Tables.load(spark, sfDir, "documents").count())
  }

  test("packing: bins partition each shard's docs; token totals conserved") {
    val out = q("q_pack_sequences").collect()
    val docs = Tables.load(spark, sfDir, "documents")
    val totalTok = docs.select(sum(ceil(length(col("text")) / 4.0).cast("long")))
      .head.getLong(0)
    assert(out.map(_.getLong(3)).sum == totalTok, "token mass not conserved")
    // bins within a shard are dense from 0 (concat-and-chunk never skips a
    // bin unless a single doc overflows the budget; est tokens ≪ 2048 here)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.head == 0L && bins.toSeq == (0L until bins.length))
    }
  }

  test("domain rebalance: clips only over-represented langs, never upsamples") {
    val rows = q("q_domain_rebalance").collect()
    val total = rows.map(_.getLong(1)).sum
    val k = rows.length
    rows.foreach { r =>
      val (before, after, thresh) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(after <= before, s"${r.getString(0)}: upsampled")
      assert(thresh <= 256)
      // a lang at or under its uniform share keeps every doc
      if (before <= total / k) assert(after == before && thresh == 256,
        s"${r.getString(0)}: under-represented lang was clipped")
    }
    // rerun is identical (hash sampling, not rand())
    assert(q("q_domain_rebalance").collect().toSeq == rows.toSeq)
  }

  test("sql surface plans like the column API: pruned scan, partial agg") {
    val p = Queries.all("q_sql_agg")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // reads only the three referenced columns, not text/source
    assert(!p.contains("text"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("packing plan: window partitioned by shard, never a single partition") {
    val qe = Queries.all("q_pack_sequences")(spark, sfDir).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Exchange SinglePartition"),
      s"global window would serialize packing:\n$plan")
  }

  test("incremental dedup plan: anti join over the aggregated batch") {
    val plan = Queries.all("q_dedup_incremental")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bloom incremental dedup is bit-identical to the plain anti-join") {
    val plain = q("q_dedup_incremental").collect().toSeq
    val bloom = q("q_bloom_incremental").collect().toSeq
    assert(plain.nonEmpty && bloom == plain)
    // the plan must contain the bloom gate (otherwise it IS the plain join)
    val plan = q("q_bloom_incremental").queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("q_source_overlap equals a brute-force gram-set computation") {
    val rows = q("q_source_overlap").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows.keys.forall { case (a, b) => a < b }, "canonical pair order")
    assert(rows.values.forall { case (s, j) => s >= 1 && j > 0.0 && j <= 1.0 })
    // independent recomputation: per-source distinct 8-gram sets in Scala
    val bySrc = Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._1)
      .map { case (src, ds) =>
        src -> ds.flatMap { case (_, t) =>
          val w = t.split(" ", -1)
          if (w.length >= 8) w.sliding(8).map(_.mkString(" ")) else Iterator.empty
        }.toSet
      }
    val expect = (for {
      (a, ga) <- bySrc; (b, gb) <- bySrc if a < b
      shared = (ga & gb).size if shared > 0
    } yield (a, b) -> (shared.toLong,
      BigDecimal(shared.toDouble / (ga.size + gb.size - shared))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(rows == expect, s"got ${rows.size} pairs, expected ${expect.size}")
  }

  test("q_novelty: conservation (Σ n_novel = |gram vocab|), first doc fully novel") {
    val rows = q("q_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.forall { case (_, g, n, f) =>
      n <= g && f > 0.0 == (n > 0) && f >= 0.0 && f <= 1.0 })
    // every distinct gram is novel in exactly one doc
    val vocab = Tables.load(spark, sfDir, "documents")
      .where(size(split(col("text"), " ")) >= 8)
      .select(explode(expr(
        """array_distinct(transform(sequence(0, size(split(text,' '))-8), i ->
           concat_ws(' ', slice(split(text,' '), i+1, 8))))""")).as("g"))
      .agg(countDistinct(col("g"))).head.getLong(0)
    assert(rows.map(_._3).sum == vocab,
      s"sum(n_novel)=${rows.map(_._3).sum} != |vocab|=$vocab")
    // the lowest doc_id with >= 8 words sees every one of its grams first
    val firstDoc = rows.minBy(_._1)
    assert(firstDoc._4 == 1.0, s"doc ${firstDoc._1} novelty ${firstDoc._4}")
  }

  test("q_boilerplate_strip equals a brute-force coverage computation") {
    val got = q("q_boilerplate_strip").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val docsRaw = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // brute force over distinct texts (frequency counts distinct TEXTS —
    // replication-invariant): grams in >= 2 texts cover their positions
    val texts = docsRaw.map(_._2).distinct
    val gramTexts = texts.flatMap { t =>
      val w = t.split(" ", -1)
      if (w.length >= 5) w.sliding(5).map(g => g.mkString(" ") -> t)
      else Iterator.empty
    }.distinct.groupBy(_._1).filter(_._2.length >= 2).keySet
    val expect = docsRaw.map { case (id, t) =>
      val w = t.split(" ", -1)
      val covered = (0 to w.length - 5).flatMap { s =>
        if (gramTexts.contains(w.slice(s, s + 5).mkString(" ")))
          (s until s + 5) else Seq.empty
      }.toSet
      val kept = w.indices.filterNot(covered).map(w)
      (id, w.length.toLong, (w.length - kept.length).toLong,
        kept.mkString(" "))
    }.toSet
    assert(got.toSet == expect)
    // invariants: untouched docs round-trip; counts reconcile
    assert(got.forall { case (_, n, rm, clean) =>
      rm >= 0 && rm <= n &&
        (rm > 0 || clean.split(" ", -1).length.toLong == n) })
    assert(got.exists(_._3 > 0), "corpus plants cross-doc phrases")
  }

  test("q_chunk_overlap: stride/overlap laws reconstruct every doc") {
    val chunks = q("q_chunk_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2) }
    val docsRaw = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == docsRaw.keySet, "every doc chunks")
    chunks.foreach { case (id, cs) =>
      val w = docsRaw(id).split(" ", -1)
      // starts are exactly 0, 24, 48... strictly below len
      assert(cs.map(_._3).toSeq == (0L until w.length.toLong by 24L).toSeq)
      cs.foreach { case (_, _, start, n, chunk) =>
        val words = chunk.split(" ", -1)
        assert(n == math.min(32, w.length - start), s"doc $id @$start")
        assert(words.length == n, s"doc $id @$start: ${words.length} != $n")
        assert(words.sameElements(
          w.slice(start.toInt, start.toInt + n.toInt)), s"doc $id @$start")
      }
      // full coverage: last chunk reaches the end of the doc
      val last = cs.last
      assert(last._3 + last._4 == w.length.toLong, s"doc $id tail")
    }
  }

  test("containment: bounded ratio, consistent with decontaminate counts") {
    val out = q("q_ngram_containment").cache()
    try {
      assert(out.filter(col("n_shared") > col("n_grams") ||
        col("n_shared") < 0 ||
        col("containment") < 0 || col("containment") > 1).isEmpty)
      assert(out.filter(col("kept") =!= (col("containment") < 0.05)).isEmpty)
      // every doc q_decontaminate flags (shared grams > 0) must have the
      // same shared count here, and vice versa every zero-overlap doc is
      // absent from q_decontaminate
      val dec = q("q_decontaminate")
      val joined = out.join(dec, Seq("doc_id"), "left")
      assert(joined.filter(col("n_shared_grams").isNotNull &&
        col("n_shared") =!= col("n_shared_grams")).isEmpty)
      assert(joined.filter(col("n_shared_grams").isNull &&
        col("n_shared") =!= 0).isEmpty)
    } finally out.unpersist()
  }

  test("containment: dup collapse equals the uncollapsed join on a replicated corpus") {
    import org.apache.spark.sql.DataFrame
    // replicate every training doc 3x under fresh doc_ids: the quotiented
    // pipeline must hand each copy exactly the score of its text
    val base = Tables.load(spark, sfDir, "documents")
    val replicated = base.unionByName(
      base.filter(col("doc_id") >= 50)
        .withColumn("doc_id", col("doc_id") + 100000L))
      .unionByName(base.filter(col("doc_id") >= 50)
        .withColumn("doc_id", col("doc_id") + 200000L))
    // the pre-quotient formula, verbatim: per-doc gram explode + join
    def uncollapsed(d: DataFrame): DataFrame = {
      val g = d.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(array_distinct(expr(
          """transform(sequence(0, size(w)-8), i ->
             concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
                            w[i+4], w[i+5], w[i+6], w[i+7]))"""))).as("gram"))
      val ev = g.filter(col("doc_id") < 50).select(col("gram")).distinct()
        .withColumn("hit", lit(1L))
      g.filter(col("doc_id") >= 50)
        .join(broadcast(ev), Seq("gram"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          coalesce(sum(col("hit")), lit(0L)).as("n_shared"))
        .withColumn("containment",
          round(col("n_shared").cast("double") / col("n_grams"), 6))
        .withColumn("kept", col("containment") < 0.05)
    }
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    val quot = rows(graft.operators.TextAnalysis.ngramContainment(replicated))
    val plain = rows(uncollapsed(replicated))
    assert(quot.nonEmpty && quot == plain)
    // and on the corpus itself (the registered query's input)
    assert(rows(Queries.all("q_ngram_containment")(spark, sfDir)) ==
      rows(uncollapsed(base)))
  }

  test("event sequences: token count matches, order is by time, one shuffle") {
    val out = q("q_event_sequences").cache()
    try {
      val ev = Tables.load(spark, sfDir, "events")
      // partition law: every event lands in exactly one user's sequence
      val total = out.agg(sum(col("n_events"))).collect()(0).getLong(0)
      assert(total == ev.count())
      // the string really contains n_events comma-separated tokens
      val bad = out.filter(
        size(split(col("sequence"), ",")) =!= col("n_events")).count()
      assert(bad == 0, s"$bad users with token count != n_events")
      // spot-check one user against a driver-side sort (tiny corpus)
      val uid = ev.select(min(col("user_id"))).collect()(0).getLong(0)
      val expected = ev.filter(col("user_id") === uid)
        .select(col("ts"), col("event_id"), col("event_type"))
        .collect().map(r => (r.getTimestamp(0).toInstant, r.getLong(1), r.getString(2)))
        .sortBy(t => (t._1.getEpochSecond, t._1.getNano, t._2)).map(_._3).mkString(",")
      val got = out.filter(col("user_id") === uid)
        .select(col("sequence")).collect()(0).getString(0)
      assert(got == expected)
      // scale shape: aggregation-only — exactly one exchange, no Window/Sort
      // before the aggregate (the final orderBy adds its own range exchange)
      val plan = q("q_event_sequences").queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), plan)
    } finally out.unpersist()
  }
}
