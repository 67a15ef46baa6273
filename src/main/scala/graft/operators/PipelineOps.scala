package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data pipeline operators beyond cleaning/dedup (SURVEY.md §7.2):
  * PII redaction, repetition analysis (Gopher-style quality signals),
  * incremental dedup against a persisted fingerprint store, deterministic
  * shard assignment, and sequence packing into fixed token-budget bins.
  *
  * Scale shapes:
  *  - PII redaction and repetition metrics are single-scan column algebra —
  *    no shuffle except repetition's bounded per-doc token aggregate
  *    (map-side combined, keyed by doc_id: never skewed).
  *  - Incremental dedup is the production posture for a growing corpus: the
  *    store of already-kept fingerprints persists (at cluster scale as a
  *    bucketed table, see [[graft.sources.Layouts.writeBucketed]]) and each
  *    new batch anti-joins it AFTER collapsing in-batch copies — the join
  *    input is one row per distinct fingerprint, not per document.
  *  - Shard assignment is a pure function of the row id (md5 nibble), so a
  *    rerun or backfill lands every doc in the same shard; packing windows
  *    are PARTITIONED BY shard — 100 TB packs as 16+ independent sequential
  *    streams, never a single global window.
  *
  * Regex note: patterns stay inside the Java-regex ∩ RE2 subset (char
  * classes + bounded repeats) so the DuckDB oracle computes the identical
  * redaction — see the oracle-parity rules in the repo skill.
  */
object PipelineOps {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ipRe    = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val phoneRe = "[0-9]{3}-[0-9]{2,}"

  /** The corpus is synthetic word soup with no PII, so the query plants a
    * deterministic doc_id-derived email/phone/IP per document (identically
    * in the oracle) — the redaction itself is what's under test. */
  private val augmented: Column = concat(
    col("text"), lit(" contact user"), col("doc_id"),
    lit("@mail.example or call 555-01"),
    lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
    lit(" from 10.0."), pmod(col("doc_id"), lit(256)),
    lit("."), pmod(col("doc_id"), lit(100)))

  /** 16 stable shards from the first md5 hex nibble of the doc id — the
    * same pure-function-of-the-row contract as [[Sampling]]'s split. */
  private val shard: Column =
    (instr(lit("0123456789abcdef"),
      substring(md5(col("doc_id").cast("string")), 1, 1)) - 1).cast("long")

  private val estTok: Column = ceil(length(col("text")) / 4.0).cast("long")

  /** Uniform 8-bit hash value of the doc id (two md5 nibbles) — the
    * deterministic coin for rate-limited sampling. */
  private val u256: Column =
    (instr(lit("0123456789abcdef"),
       substring(md5(col("doc_id").cast("string")), 1, 1)) - 1) * 16 +
    (instr(lit("0123456789abcdef"),
       substring(md5(col("doc_id").cast("string")), 2, 1)) - 1)

  /** Deterministic synthetic URL per document — the corpus carries no url
    * column, so the URL-curation operators key one off (source, doc_id):
    * messy ON PURPOSE (uppercase scheme and host, www prefix, explicit
    * default port, tracking params interleaved with real ones, fragment,
    * trailing slash) so canonicalization has real work to do, while the
    * canonical form stays closed-form for the oracle — the multimodal
    * decode-vs-generator discipline applied to strings. */
  private[graft] def withUrl(df: DataFrame): DataFrame =
    df.withColumn("url", concat(
      lit("HTTPS://WwW."), col("source"), col("doc_id") % 3,
      lit(".Example.COM:443/Path/"), col("doc_id"),
      lit("/?utm_source=feed&id="), col("doc_id") % 7,
      lit("&fbclid=abc"), col("doc_id"),
      lit("&page="), col("doc_id") % 5,
      lit("#sec"), col("doc_id") % 4))

  /** The per-domain admission cap shared by the batch, incremental, and
    * probe forms of the RefinedWeb-style domain cap. */
  private[graft] val DomainCapK = 5

  /** The curated domain blocklist shared by the standalone gate and the
    * capstone pipeline. One entry matches nothing on purpose (a stale
    * blocklist row must be a no-op, not an error). */
  private[graft] val blockedDomains = Seq("src10.example.com",
    "src41.example.com", "src122.example.com", "badhost.example.com")

  /** Registrable domain of a raw URL: canonical host minus the www prefix
    * and any explicit port — the grouping key of the whole URL-curation
    * recipe (caps, blocklist, streaming admission). */
  private[graft] def domainOfUrl(u: Column): Column =
    lower(regexp_replace(regexp_replace(
      regexp_extract(u, "://([^/?#]+)", 1), ":[0-9]+$", ""), "(?i)^www\\.", ""))

  /** URL canonicalization as a pure Column (idempotent — law-tested):
    * lowercase scheme and host (case-insensitive per RFC 3986) but NOT
    * the path (case-sensitive), strip a www. prefix and an explicit
    * port, drop the fragment, strip a trailing path slash, drop tracking
    * parameters (utm_*, gclid, fbclid, ref) and sort the survivors for a
    * canonical parameter order. All codegen'd builtins (regexp + array
    * algebra) — a pure map over the scan, no UDF, no shuffle. */
  private[graft] def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_replace(regexp_replace(
      regexp_extract(u, "://([^/?#]+)", 1), ":[0-9]+$", ""), "(?i)^www\\.", ""))
    val path = regexp_replace(
      regexp_extract(u, "://[^/?#]+([^?#]*)", 1), "/$", "")
    val kept = array_join(array_sort(filter(
      split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
      p => !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)=") && length(p) > 0)), "&")
    concat(scheme, lit("://"), host, path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** (pos, doc_id) under the seed's permutation. Permutation key =
    * md5(seed:doc_id) with a fixed-width doc_id suffix for total order. */
  private[graft] def seededShuffle(d: DataFrame, seed: String): DataFrame = {
    val keyed = d.select(col("doc_id"),
      concat(md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))
          .cast("binary")),
        lit("-"), lpad(col("doc_id").cast("string"), 12, "0"))
        .as("shuffle_key"))
    Ids.contiguous(keyed, "shuffle_key")
      .select(col("seq_id").as("pos"), col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    // URL canonicalization (r10 verdict #4): the crawl-curation
    // normalizer — tracking params, fragments, case, default port and
    // trailing slash all stripped so byte-different URLs of the same
    // resource collapse to one key for dedup/caps. The oracle states the
    // closed canonical form; the query PARSES the messy synthesized URL.
    "q_url_canonicalize" -> ((s, dir) =>
      withUrl(docs(s, dir).select(col("doc_id"), col("source")))
        .select(col("doc_id"), col("url"),
          canonicalizeUrl(col("url")).as("canonical_url"))
        .orderBy(col("doc_id"))),

    // Per-domain deterministic cap (r10 verdict #4 — the RefinedWeb
    // recipe): at most K docs per registrable domain, chosen by a
    // uniform engine-portable hash (md5 of the doc id — the
    // q_sample_per_key discipline) so reruns, late batches, and engines
    // agree on the keep-set. Plan: one scan + bounded per-domain
    // TopKPerKey heaps (O(n log k), partial-aggregatable, no global and
    // no per-key sort) — a hot domain with millions of docs costs one
    // k-element heap per task, never a quadratic or sorted state. The
    // domain comes from PARSING the synthesized url (canonical host
    // minus www/port); the oracle uses the closed form.
    "q_domain_caps" -> ((s, dir) => {
      val d = withUrl(docs(s, dir).select(col("doc_id"), col("source")))
        .withColumn("domain", domainOfUrl(col("url")))
        .select(col("domain"), col("doc_id"),
          md5(col("doc_id").cast("string")).as("h"))
      graft.plans.TopK.perKey(d, Seq("domain"),
          Seq("h" -> false, "doc_id" -> false), DomainCapK)
        .select(col("domain"), col("doc_id"))
        .orderBy(col("domain"), col("doc_id"))
    }),

    // Incremental per-domain cap — the recrawl posture of q_domain_caps
    // (the q_dedup_incremental discipline applied to URL curation): the
    // STORE's keep-set is already fixed (first K per domain by the md5
    // keep-order), and an arriving batch may only fill each domain's
    // REMAINING quota, chosen by the same hash order so reruns agree.
    // Plan: one shared scan; the store side never sorts or tops — its
    // kept count is closed-form least(K, count) per domain (a partial-
    // aggregatable count, replication-cheap); the batch side runs the
    // bounded TopKPerKey heaps, and only the ≤K-per-domain survivor frame
    // pays a rank window (partitions of ≤K rows) before the quota filter.
    "q_domain_caps_incremental" -> ((s, dir) => {
      val k = DomainCapK
      val d = withUrl(docs(s, dir).select(col("doc_id"), col("source")))
        .withColumn("domain", domainOfUrl(col("url")))
        .select(col("domain"), col("doc_id"),
          md5(col("doc_id").cast("string")).as("h"))
      val quota = d.filter(col("doc_id") % 10 =!= 0)
        .groupBy(col("domain"))
        .agg(least(lit(k.toLong), count(lit(1))).as("n_kept"))
      val batchTop = graft.plans.TopK.perKey(
          d.filter(col("doc_id") % 10 === 0), Seq("domain"),
          Seq("h" -> false, "doc_id" -> false), k)
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
          .Window.partitionBy(col("domain")).orderBy(col("h"), col("doc_id"))))
      batchTop.join(quota, Seq("domain"), "left")
        .filter(col("rk") <= lit(k) - coalesce(col("n_kept"), lit(0L)))
        .select(col("domain"), col("doc_id"))
        .orderBy(col("domain"), col("doc_id"))
    }),

    // Domain blocklist gate (the third leg of the RefinedWeb/CCNet URL
    // recipe, after canonicalize + caps): every doc flagged against a
    // curated blocklist of registrable domains. The list is eval-suite-
    // sized in production (thousands of entries), so the membership test
    // is a literal isin — a pure codegen'd map over the scan; a list too
    // big for literals would broadcast-left-semi instead. One entry
    // matches nothing on purpose (a stale blocklist row must be a no-op,
    // not an error).
    "q_domain_blocklist" -> ((s, dir) =>
      withUrl(docs(s, dir).select(col("doc_id"), col("source")))
        .withColumn("domain", domainOfUrl(col("url")))
        .select(col("doc_id"), col("domain"),
          col("domain").isin(blockedDomains: _*).as("blocked"))
        .orderBy(col("doc_id"))),

    // Leakage-safe train/val/test split: the split UNIT is the near-dup
    // CLUSTER (LSS components over verified minhash pairs — the scale
    // path), not the document, so two near-duplicate documents can never
    // straddle train and eval — the contamination mode a per-row random
    // split bakes in. Unit id = cluster representative (min doc_id;
    // singletons are their own unit); the 80/10/10 assignment is a pure
    // deterministic function of the unit id, so a rerun or a late-arriving
    // batch lands every member of an existing cluster on the same side.
    // Scale: clustering is the LSS replication-invariant path; the
    // assignment itself is a map over one equi-join — no extra exchange.
    "q_split_leakage_safe" -> ((s, dir) => {
      val d = docs(s, dir)
      val clusters = Dedup.docNearDupClustersLss(d)
        .select(col("doc_id"), col("cluster_rep"))
      val unit = coalesce(col("cluster_rep"), col("doc_id")).cast("long")
      d.select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"), unit.as("split_unit"),
          when(unit % 10 < 8, lit("train"))
            .when(unit % 10 === 8, lit("val"))
            .otherwise(lit("test")).as("subset"))
        .orderBy(col("doc_id"))
    }),

    // PII scrub: count then redact emails → IPs → phones, in that order
    // (fixed order makes the output deterministic when patterns could
    // overlap). Single scan, codegen'd regexes, no shuffle.
    "q_pii_redact" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), augmented.as("aug"))
        .select(
          col("doc_id"),
          regexp_count(col("aug"), lit(emailRe)).cast("long").as("n_emails"),
          regexp_count(col("aug"), lit(ipRe)).cast("long").as("n_ips"),
          regexp_count(col("aug"), lit(phoneRe)).cast("long").as("n_phones"),
          regexp_replace(regexp_replace(regexp_replace(col("aug"),
            emailRe, "[EMAIL]"), ipRe, "[IP]"), phoneRe, "[PHONE]")
            .as("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition signals: duplicate-word fraction, duplicate-
    // bigram fraction, most-frequent-token share. Pure array algebra —
    // every signal is a function of the ROW, so the whole query is
    // scan → project with zero pre-sort exchanges (r11: the per-doc token
    // mode previously went explode → groupBy(doc_id, token) → per-doc
    // max → join — two shuffles and a join replaced by the codegen'd
    // MaxTokenCount local hash count; the q_doc_entropy shape lesson).
    "q_doc_repetition" -> ((s, dir) => {
      val base = docs(s, dir)
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      val stats = base.select(
        col("doc_id"),
        col("w"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_uniq"),
        when(size(col("w")) >= 2, expr(
          "transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))"))
          .otherwise(array().cast("array<string>")).as("bg"))
        .select(col("doc_id"), col("n_tokens"), col("n_uniq"),
          size(col("bg")).cast("long").as("n_bigrams"),
          size(array_distinct(col("bg"))).cast("long").as("n_uniq_bigrams"),
          graft.functions.Sketches.maxTokenCount(col("w")).as("top_tok_cnt"))
      stats
        .select(
          col("doc_id"), col("n_tokens"),
          round(lit(1.0) - col("n_uniq").cast("double") / col("n_tokens"), 6)
            .as("dup_word_ratio"),
          when(col("n_bigrams") > 0,
            round(lit(1.0) - col("n_uniq_bigrams").cast("double") / col("n_bigrams"), 6))
            .otherwise(0.0).as("dup_bigram_ratio"),
          col("top_tok_cnt"),
          round(col("top_tok_cnt").cast("double") / col("n_tokens"), 6)
            .as("top_tok_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Incremental dedup: the store (doc_id < 250 here; in production a
    // persisted fingerprint table) is never re-deduped — the new batch
    // collapses its own copies first (one row per fp), then anti-joins
    // the store. Fingerprint = md5 of the sorted distinct word set, an
    // order-independent bag-of-words identity.
    "q_dedup_incremental" -> ((s, dir) => {
      val f = docs(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          md5(array_join(array_sort(array_distinct(
            split(lower(col("text")), " "))), " ").cast("binary")).as("fp"))
      val store = f.filter(col("doc_id") < 250).select(col("fp")).distinct()
      f.filter(col("doc_id") >= 250)
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_batch_copies"))
        .join(store, Seq("fp"), "left_anti")
        .orderBy(col("fp"))
    }),

    // Same incremental-dedup contract, with a bloom-filter prefilter —
    // the 100 TB shape: the persisted store is orders of magnitude bigger
    // than any batch, and an anti-join would shuffle ALL of it every run.
    // Here the store folds once into a fixed-size bloom (mergeable,
    // map-side partial agg); batch rows the bloom rules out (no false
    // negatives — definitely new) skip the join entirely, and only the
    // "maybe" sliver anti-joins the store to clear false positives. The
    // result is bit-identical to the plain anti-join, which is exactly
    // what the shared oracle asserts.
    "q_bloom_incremental" -> ((s, dir) => {
      val f = docs(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          md5(array_join(array_sort(array_distinct(
            split(lower(col("text")), " "))), " ").cast("binary")).as("fp"))
      val store = f.filter(col("doc_id") < 250).select(col("fp")).distinct()
      val bloom = store.agg(graft.functions.Bloom
        .bloomAgg(xxhash64(col("fp")), 10000L, 120000L).as("bf"))
      val batch = f.filter(col("doc_id") >= 250)
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_batch_copies"))
      val maybe = graft.functions.Bloom.mightContain(bloom, xxhash64(col("fp")))
      batch.filter(!maybe)
        .unionByName(batch.filter(maybe).join(store, Seq("fp"), "left_anti"))
        .orderBy(col("fp"))
    }),

    // Deterministic shard histogram: doc → shard is a pure row function,
    // so the writer ( [[graft.sources.Layouts.writeSharded]] ) produces
    // identical shards on every rerun. One bounded 16-key aggregate.
    "q_shard_assign" -> ((s, dir) => {
      docs(s, dir)
        .select(shard.as("shard"), estTok.as("tok"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).cast("long").as("total_est_tokens"))
        .orderBy(col("shard"))
    }),

    // Mixture rebalance: clip each language to a uniform share of the
    // corpus by deterministic hash-threshold sampling — keep a doc iff its
    // 8-bit md5 value falls under floor(rate*256). The rate table is 4-ish
    // rows (broadcast); the corpus side is scan + filter, no shuffle of the
    // data itself. 256 = 2^8 keeps the threshold arithmetic float-exact.
    "q_domain_rebalance" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"), u256.as("u256"))
      val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_before"))
      val g = d.agg(count(lit(1)).as("t"), countDistinct(col("lang")).as("k"))
      val rates = counts.crossJoin(g).select(
        col("lang"), col("n_before"),
        floor(least(lit(1.0),
          col("t").cast("double") / col("k") / col("n_before")) * 256)
          .as("thresh"))
      val after = d.join(broadcast(rates), "lang")
        .filter(col("u256") < col("thresh"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_after"))
      rates.join(after, Seq("lang"), "left_outer")
        .select(col("lang"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          col("thresh").cast("long").as("thresh"))
        .orderBy(col("lang"))
    }),

    // Temperature-based domain UPSAMPLING — the complement of
    // q_domain_rebalance (which only drops): low-resource domains repeat
    // round(sqrt(max_n/n_d)) times (the T=2 temperature-mix rule of
    // multilingual-corpus sampling), majority domains stay at 1 epoch.
    // Deterministic integer repetition via explode(sequence(1, mult)) —
    // no RNG, every copy tagged with its epoch index so downstream
    // shuffling/packing treats copies as distinct rows. The multiplier
    // frame is domain-sized and broadcast; the corpus side never shuffles.
    "q_domain_upsample" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"))
      val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val mx = counts.agg(max(col("n_docs")).as("max_n"))
      val mult = counts.crossJoin(mx).select(col("lang"), col("n_docs"),
        greatest(lit(1L), round(sqrt(
          col("max_n").cast("double") / col("n_docs").cast("double")))
          .cast("long")).as("mult"))
      d.join(broadcast(mult), "lang")
        .select(col("doc_id"), col("lang"), col("mult"),
          explode(sequence(lit(1L), col("mult"))).as("copy_idx"))
        .select(col("doc_id"), col("lang"), col("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // RAG / retrieval chunking: fixed 32-word windows with stride 24
    // (8-word overlap so boundary-straddling facts land whole in some
    // chunk) — the document→passage transform every retrieval index and
    // long-context training pipeline runs first. Pure in-scan Generate:
    // chunk starts come from a per-row sequence, the chunk text from a
    // slice of the already-split array — no exchange anywhere except the
    // presentation sort, so 100 TB chunks as a single map pass. Output is
    // ~len/24 rows per doc (bounded per-row fan-out, linear overall).
    "q_chunk_overlap" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), size(col("w")).as("len"), col("w"),
          explode(sequence(lit(0), size(col("w")) - 1, lit(24))).as("start"))
        .select(col("doc_id"),
          (col("start") / 24).cast("long").as("chunk_idx"),
          col("start").cast("long").as("start"),
          least(lit(32), col("len") - col("start")).cast("long").as("n_tokens"),
          concat_ws(" ", slice(col("w"), col("start") + 1, lit(32)))
            .as("chunk"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Sequence packing (concat-and-chunk): docs stream in md5 order within
    // their shard; a doc belongs to the 2048-token bin its start offset
    // falls in. The window is partitioned by shard — packing 100 TB is N
    // independent sequential scans, not one global sort. 2048 = 2^11 keeps
    // the double division exact, so Spark and the oracle floor identically.
    "q_pack_sequences" -> ((s, dir) => {
      val t = docs(s, dir).select(
        col("doc_id"), shard.as("shard"), estTok.as("tok"),
        md5(col("doc_id").cast("string")).as("mk"))
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("mk"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.withColumn("cum", sum(col("tok")).over(w))
        .withColumn("bin",
          floor((col("cum") - col("tok")) / lit(2048.0)).cast("long"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).cast("long").as("bin_tokens"))
        .orderBy(col("shard"), col("bin"))
    }),
    // Seeded global shuffle for training order: each epoch seed yields a
    // fresh, decorrelated, fully reproducible permutation of the corpus
    // (resume mid-epoch = re-run the same seed). Permutation key =
    // md5(seed:doc_id) with a fixed-width doc_id suffix for total order;
    // the order is realized distributively — range-repartition on the key +
    // per-partition zipWithIndex ([[Ids.contiguous]]), never a one-task
    // global sort.
    "q_shuffle_seeded" -> ((s, dir) =>
      seededShuffle(docs(s, dir), "epoch-0").orderBy(col("pos"))),

    // Training-sequence construction: each user's event history as one
    // time-ordered token string (the "behavioral LM" input shape). One
    // hash shuffle on the key; ordering happens inside the aggregated
    // array (array_sort over (ts, event_id, event_type) structs — ties
    // fully broken by the unique event_id), so there is NO per-key window
    // sort pass and no global sort. Memory is bounded by the per-user
    // history length; for power users a slice(seq, -N, N) cap keeps the
    // context window fixed (not applied here so the oracle stays exact).
    "q_event_sequences" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          concat_ws(",",
            transform(
              array_sort(collect_list(
                struct(col("ts"), col("event_id"), col("event_type")))),
              x => x.getField("event_type"))).as("sequence"))
        .select(col("user_id"), col("n_events"), col("sequence"))
        .orderBy(col("user_id"))
    }),
  )

  private val incrementalOracleSql: String =
    """WITH f AS (SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) fp
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_batch_copies
      |FROM f WHERE doc_id >= 250
      |  AND fp NOT IN (SELECT fp FROM f WHERE doc_id < 250)
      |GROUP BY fp ORDER BY fp""".stripMargin

  val oracle: Map[String, String] = Map(
    // raw url and canonical form both closed-form in (source, doc_id)
    "q_url_canonicalize" ->
      """SELECT doc_id,
        |  'HTTPS://WwW.' || source || (doc_id % 3) || '.Example.COM:443/Path/'
        |    || doc_id || '/?utm_source=feed&id=' || (doc_id % 7)
        |    || '&fbclid=abc' || doc_id || '&page=' || (doc_id % 5)
        |    || '#sec' || (doc_id % 4) AS url,
        |  'https://' || lower(source) || (doc_id % 3) || '.example.com/Path/'
        |    || doc_id || '?id=' || (doc_id % 7) || '&page=' || (doc_id % 5)
        |    AS canonical_url
        |FROM documents ORDER BY doc_id""".stripMargin,
    // same md5 keep-order as the engine; cap K = 5 per domain
    "q_domain_caps" ->
      """WITH d AS (SELECT doc_id,
        |    lower(source) || (doc_id % 3) || '.example.com' AS domain,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |r AS (SELECT domain, doc_id,
        |    row_number() OVER (PARTITION BY domain ORDER BY h, doc_id) AS rk
        |  FROM d)
        |SELECT domain, doc_id FROM r WHERE rk <= 5
        |ORDER BY domain, doc_id""".stripMargin,
    // store keeps are first-K per domain by (h, doc_id) among store docs;
    // the batch fills only the remaining quota in the same order
    "q_domain_caps_incremental" ->
      """WITH d AS (SELECT doc_id,
        |    lower(source) || (doc_id % 3) || '.example.com' AS domain,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (SELECT domain, COUNT(*) AS n_kept FROM (
        |    SELECT domain,
        |      row_number() OVER (PARTITION BY domain ORDER BY h, doc_id) AS rk
        |    FROM d WHERE doc_id % 10 <> 0) WHERE rk <= 5 GROUP BY domain),
        |b AS (SELECT domain, doc_id,
        |    row_number() OVER (PARTITION BY domain ORDER BY h, doc_id) AS rk
        |  FROM d WHERE doc_id % 10 = 0)
        |SELECT b.domain, b.doc_id FROM b LEFT JOIN s USING (domain)
        |WHERE b.rk <= 5 - COALESCE(s.n_kept, 0)
        |ORDER BY domain, doc_id""".stripMargin,
    "q_domain_blocklist" ->
      """SELECT doc_id,
        |  lower(source) || (doc_id % 3) || '.example.com' AS domain,
        |  lower(source) || (doc_id % 3) || '.example.com' IN
        |    ('src10.example.com', 'src41.example.com',
        |     'src122.example.com', 'badhost.example.com') AS blocked
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_split_leakage_safe" ->
      s"""SELECT d.doc_id,
         |  CAST(COALESCE(c.cluster_rep, d.doc_id) AS BIGINT) AS split_unit,
         |  CASE WHEN COALESCE(c.cluster_rep, d.doc_id) % 10 < 8 THEN 'train'
         |       WHEN COALESCE(c.cluster_rep, d.doc_id) % 10 = 8 THEN 'val'
         |       ELSE 'test' END AS subset
         |FROM documents d LEFT JOIN (${Dedup.clustersOracleSql}) c
         |  ON d.doc_id = c.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q_pii_redact" ->
      """WITH a AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@mail.example or call 555-01' ||
        |    lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' from 10.0.' ||
        |    (doc_id % 256) || '.' || (doc_id % 100) AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(aug, '[0-9]{3}-[0-9]{2,}')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g'),
        |    '[0-9]{3}-[0-9]{2,}', '[PHONE]', 'g') AS clean_text
        |FROM a ORDER BY doc_id""".stripMargin,
    "q_doc_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents),
        |s AS (SELECT doc_id, len(w) n_tokens, len(list_distinct(w)) n_uniq,
        |  CASE WHEN len(w) >= 2 THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
        |       ELSE CAST([] AS VARCHAR[]) END bg FROM t),
        |s2 AS (SELECT doc_id, n_tokens, n_uniq, len(bg) n_bigrams,
        |       len(list_distinct(bg)) n_uniq_bigrams FROM s),
        |tp AS (SELECT doc_id, MAX(c) top_tok_cnt FROM (
        |  SELECT doc_id, tok, COUNT(*) c FROM (SELECT doc_id, unnest(w) tok FROM t)
        |  GROUP BY doc_id, tok) GROUP BY doc_id)
        |SELECT s2.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(1 - CAST(n_uniq AS DOUBLE)/n_tokens, 6) AS dup_word_ratio,
        |  CASE WHEN n_bigrams > 0 THEN round(1 - CAST(n_uniq_bigrams AS DOUBLE)/n_bigrams, 6)
        |       ELSE 0.0 END AS dup_bigram_ratio,
        |  CAST(top_tok_cnt AS BIGINT) AS top_tok_cnt,
        |  round(CAST(top_tok_cnt AS DOUBLE)/n_tokens, 6) AS top_tok_ratio
        |FROM s2 JOIN tp USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_dedup_incremental" -> incrementalOracleSql,
    // the bloom path must be indistinguishable from the plain anti-join
    "q_bloom_incremental" -> incrementalOracleSql,
    "q_domain_upsample" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        |m AS (SELECT MAX(n_docs) AS max_n FROM c),
        |r AS (SELECT lang,
        |        GREATEST(1, CAST(round(sqrt(CAST(max_n AS DOUBLE) / n_docs)) AS BIGINT)) AS mult
        |      FROM c, m)
        |SELECT doc_id, d.lang,
        |  unnest(generate_series(1, r.mult)) AS copy_idx
        |FROM documents d JOIN r ON d.lang = r.lang
        |ORDER BY doc_id, copy_idx""".stripMargin,
    "q_domain_rebalance" ->
      """WITH d AS (SELECT doc_id, lang,
        |    (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |  + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS u256
        |  FROM documents),
        |c AS (SELECT lang, COUNT(*) n_before FROM d GROUP BY lang),
        |g AS (SELECT COUNT(*) t, COUNT(DISTINCT lang) k FROM d),
        |r AS (SELECT lang, n_before,
        |        FLOOR(LEAST(1.0, CAST(t AS DOUBLE) / k / n_before) * 256) thresh
        |      FROM c, g),
        |a AS (SELECT d.lang, COUNT(*) n_after
        |      FROM d JOIN r ON d.lang = r.lang AND d.u256 < r.thresh
        |      GROUP BY d.lang)
        |SELECT r.lang, CAST(n_before AS BIGINT) AS n_before,
        |  CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after,
        |  CAST(thresh AS BIGINT) AS thresh
        |FROM r LEFT JOIN a ON r.lang = a.lang ORDER BY r.lang""".stripMargin,
    "q_shard_assign" ->
      """SELECT CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) AS shard,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(CAST(CEIL(length(text)/4.0) AS BIGINT)) AS BIGINT) AS total_est_tokens
        |FROM documents GROUP BY shard ORDER BY shard""".stripMargin,
    "q_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, len(w) AS l, w,
        |        unnest(range(0, len(w), 24)) AS start FROM t)
        |SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_idx,
        |  CAST(start AS BIGINT) AS start,
        |  CAST(least(32, l - start) AS BIGINT) AS n_tokens,
        |  array_to_string(w[start + 1 : start + 32], ' ') AS chunk
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) shard,
        |    CAST(CEIL(length(text)/4.0) AS BIGINT) tok,
        |    md5(CAST(doc_id AS VARCHAR)) mk
        |  FROM documents),
        |c AS (SELECT shard, doc_id, tok,
        |    SUM(tok) OVER (PARTITION BY shard ORDER BY mk, doc_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum
        |  FROM t)
        |SELECT shard, CAST(FLOOR((cum - tok)/2048.0) AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,
    // the distributed permutation must equal the global-order row_number
    // over the same seeded key
    "q_shuffle_seeded" ->
      """SELECT CAST(row_number() OVER (ORDER BY
        |    md5('epoch-0:' || CAST(doc_id AS VARCHAR)) || '-' ||
        |    lpad(CAST(doc_id AS VARCHAR), 12, '0')) - 1 AS BIGINT) AS pos,
        |  doc_id
        |FROM documents ORDER BY pos""".stripMargin,
    "q_event_sequences" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  string_agg(event_type, ',' ORDER BY ts, event_id) AS sequence
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
