package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.PortableMath.lnPortable

/** Sparse-retrieval operators over the documents corpus: Okapi BM25
  * scoring and inverted-index (posting-list) materialization — the
  * lexical-search half of a training-data platform (benchmark-similarity
  * triage, boilerplate hunting, corpus search). The reference has no
  * retrieval surface; this extends SURVEY.md §7's text family
  * (Robertson & Zaragoza 2009 for BM25; Lucene's +1 idf smoothing so
  * scores stay positive for df > n/2).
  *
  * Scale shape (100 TB): term statistics are the word-count pattern
  * (partial agg in the scan, one exchange on token); the query-term set
  * and corpus stats are bounded frames that BROADCAST back, so scoring is
  * a filter of the (doc,term) stream — only docs hitting a query term
  * reach the per-doc aggregate, and top-k is a TakeOrdered, never a
  * global sort. Posting lists materialize only for the selected tokens
  * (stats pass first, broadcast semi-join second) — the full-vocabulary
  * index build is the same plan minus the top-k filter, with output
  * sharded by token hash.
  *
  * Exactness discipline (hash-green vs DuckDB): ln through [[lnPortable]]
  * (libm parity), every per-term contribution rounded to 9 dp and summed
  * as DECIMAL(18,9) so the per-doc sum is order-independent, final round
  * to 6 dp — the q_lm_score/q_doc_entropy discipline.
  */
object Retrieval {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** The raw (doc_id, token) occurrence stream over lowercase space-split
    * tokens. Deliberately NOT pre-aggregated: consumers either filter it
    * down first (broadcast query-term semi-join, scan-pruned single-doc
    * predicate) or aggregate it exactly once. A shared localCheckpoint'd
    * (doc, token, tf) frame was measured SLOWER at the 100× probe
    * (q_bm25 62.3 s vs 15.5 s restructured): materializing ~50M skinny
    * rows costs more than re-scanning, and filtering before aggregating
    * beats both. */
  private def tokens(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))

  /** (doc_id, token, tf) term frequencies — the aggregated form, for
    * paths that genuinely consume per-(doc,token) rows more than once
    * ([[invertedIndex]]: nominee stats AND postings): the (doc,token)
    * partial aggregate collapses occurrences map-side, and the nominee
    * join then carries one row per posting rather than per occurrence. */
  private def termFreqs(d: DataFrame): DataFrame =
    tokens(d).groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Per-doc token count, scan-side — `size(split(...))` equals the sum
    * of the doc's term frequencies with no explode and no shuffle. */
  private def docLen(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      size(split(lower(col("text")), " ")).cast("long").as("dl"))

  /** BM25 scoring core: score every document's token stream against the
    * bounded query-term frame `qt` (token, df) — qt broadcasts, so the
    * occurrence stream is FILTERED to query-term hits before any
    * aggregation touches it (the tf groupBy sees only hit rows, never
    * the corpus vocabulary). Doc lengths and corpus totals come from the
    * scan-side [[docLen]] — no full-corpus explode-aggregate anywhere in
    * the scoring path. k1 = 1.2, b = 0.75 (the standard defaults).
    * Returns one row per document hitting ≥1 query term:
    * (doc_id, n_terms_hit, bm25). */
  private def bm25Score(d: DataFrame, qt: DataFrame): DataFrame = {
    val dl = docLen(d)
    // corpus stats: one row, broadcast via crossJoin of a 1-row aggregate
    val g = dl.agg(sum(col("dl")).as("total_tokens"),
      count(lit(1)).as("n_docs"))
    val hits = tokens(d).join(broadcast(qt), "token")
      .groupBy(col("doc_id"), col("token"), col("df"))
      .agg(count(lit(1)).as("tf"))
    hits
      .join(dl, "doc_id")
      .crossJoin(broadcast(g))
      .withColumn("avgdl", col("total_tokens").cast("double") / col("n_docs"))
      .withColumn("idf",
        round(lnPortable(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 9)
          .cast(DecimalType(18, 9)))
      .withColumn("contrib",
        round(col("idf").cast("double") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))), 9)
          .cast(DecimalType(18, 9)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms_hit"),
        sum(col("contrib")).as("s"))
      .select(col("doc_id"), col("n_terms_hit"),
        round(col("s").cast("double"), 6).as("bm25"))
  }

  /** BM25 top-k: score every document against the query term set (here:
    * the corpus's own top-`nTerms` non-stopword tokens by total mass —
    * self-contained and regeneration-proof) and keep the `k` best. */
  def bm25TopK(d: DataFrame, nTerms: Int = 3, k: Int = 10): DataFrame = {
    // the ONE full-vocabulary aggregate: token mass + doc frequency in a
    // single two-phase agg over the occurrence stream (partial combine on
    // (token, doc) via count_distinct's expansion)
    val dfc = tokens(d).groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("n_tok"))
    // query terms: bounded frame (nTerms rows) → broadcast
    val qt = dfc.filter(!col("token").isin("the", "a"))
      .orderBy(col("n_tok").desc, col("token")).limit(nTerms)
      .select(col("token"), col("df"))
    bm25Score(d, qt)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Query-by-example BM25: the query term set is `queryDoc`'s own
    * top-`nTerms` tokens by in-doc frequency (ties by token); every OTHER
    * document is scored against it. Corpus statistics (df, avgdl, N)
    * stay corpus-wide — the query doc is excluded from the output, not
    * from the model. */
  def bm25ForDoc(d: DataFrame, queryDoc: Long, nTerms: Int = 3,
                 k: Int = 10): DataFrame = {
    // no full-vocabulary aggregate anywhere: the query doc's own tokens
    // come from a scan-pruned single-doc aggregate (the doc_id predicate
    // pushes below the explode), and df is computed for those ≤ nTerms
    // tokens only, on a broadcast-filtered pass — at 100 TB this path
    // never shuffles the corpus vocabulary, only query-term hits
    val qtoks = tokens(d).filter(col("doc_id") === queryDoc)
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token")).limit(nTerms)
      .select(col("token"))
    val qt = tokens(d).join(broadcast(qtoks), "token")
      .groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
    bm25Score(d, qt)
      .filter(col("doc_id") =!= queryDoc)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke &
    * Büttcher 2009): fuse a lexical BM25 pool (query-by-example on
    * document `queryId`) with a dense cosine pool (query vector =
    * embedding `queryId`) as Σ 1/(rrfK + rank). The two pools are
    * top-`poolK` TakeOrdered frames, so the rank windows and the
    * full-outer fusion join run on ≤ poolK-row bounded frames —
    * corpus-size work is exactly one BM25 scoring pass plus one cosine
    * scan, both broadcast-driven single-exchange plans; at 100 TB the
    * dense pool swaps in the certified IVF/PQ shortlist unchanged.
    * Exactness: per-list contributions rounded to 9 dp, summed as
    * DECIMAL(18,9) (order-independent), final round to 6 dp. */
  def hybridRrf(d: DataFrame, emb: DataFrame, queryId: Long = 0,
                poolK: Int = 20, rrfK: Int = 60, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Sketches
    // rank windows are global but run AFTER the TakeOrdered pool bound —
    // they see ≤ poolK rows, never the corpus
    val lw = Window.orderBy(col("bm25").desc, col("doc_id"))
    val lex = bm25ForDoc(d, queryId, nTerms = 3, k = poolK)
      .withColumn("lex_rank", row_number().over(lw).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val qv = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qv"))
    val dw = Window.orderBy(col("score").desc, col("doc_id"))
    val dense = emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qv))
      .withColumn("score",
        round(Sketches.cosineSim(col("qv"), col("embedding")), 6))
      .select(col("vec_id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(poolK)
      .withColumn("vec_rank", row_number().over(dw).cast("long"))
      .select(col("doc_id"), col("vec_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("c_lex",
        coalesce(round(lit(1.0) / (col("lex_rank") + lit(rrfK)), 9), lit(0.0))
          .cast(DecimalType(18, 9)))
      .withColumn("c_vec",
        coalesce(round(lit(1.0) / (col("vec_rank") + lit(rrfK)), 9), lit(0.0))
          .cast(DecimalType(18, 9)))
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        round((col("c_lex") + col("c_vec")).cast("double"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** Inverted index for the corpus's `nTokens` highest-df tokens: per
    * token, document frequency, total term frequency, and the sorted
    * posting list (stringified — the cross-engine array idiom). The stats
    * pass nominates tokens; posting lists collect only for nominees via a
    * broadcast join, so the heavy collect never runs on the long tail.
    *
    * Output-shape caveat (the pair-form discipline applied to postings):
    * the full posting list PER ROW is this query's stated output — and
    * the nominated tokens are by definition the hottest, so at crawl
    * scale one row holds a material fraction of all doc ids. That is a
    * display/oracle form; the PRODUCTION path is [[invertedIndexSharded]]
    * (r12 verdict #7), which bounds every row and every task. */
  def invertedIndex(d: DataFrame, nTokens: Int = 20): DataFrame =
    invertedIndexNominees(d, nTokens)
      .groupBy(col("token"), col("df"), col("total_tf"))
      .agg(array_join(array_sort(collect_list(col("doc_id"))), ",").as("postings"))
      .select(col("token"), col("df"), col("total_tf"), col("postings"))
      .orderBy(col("df").desc, col("token"))

  /** Shared nominee machinery: the (doc_id, token, df, total_tf) posting
    * stream for the `nTokens` highest-df tokens — stats pass nominates,
    * broadcast join filters, so the posting stream never materializes for
    * the long tail. */
  private def invertedIndexNominees(d: DataFrame, nTokens: Int): DataFrame = {
    val tfc = termFreqs(d)
    val top = tfc.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).cast("long").as("total_tf"))
      .orderBy(col("df").desc, col("token")).limit(nTokens)
    tfc.join(broadcast(top), "token")
  }

  /** The production index build (r12 verdict #7): the same plan as
    * [[invertedIndex]] up to the final aggregate, but the posting collect
    * shards to (token, segment) rows — segment = doc_id div `segWidth` —
    * so every output row holds ≤ segWidth ids and every collect task is
    * bounded no matter how hot the token (the hottest nominee's postings
    * spread across |corpus|/segWidth rows instead of ONE). Segment
    * concatenation in segment order reproduces the monolithic posting
    * list exactly (each segment covers a disjoint contiguous id range and
    * is sorted within — the law `RetrievalSpec` pins), which is also why
    * a serving layer can range-partition lookups by (token, segment)
    * with no merge step beyond append. */
  def invertedIndexSharded(d: DataFrame, nTokens: Int = 20,
                           segWidth: Long = 128L): DataFrame =
    invertedIndexNominees(d, nTokens)
      .withColumn("segment", expr(s"doc_id div $segWidth"))
      .groupBy(col("token"), col("df"), col("total_tf"), col("segment"))
      .agg(array_join(array_sort(collect_list(col("doc_id"))), ",").as("postings"))
      .select(col("token"), col("df"), col("total_tf"), col("segment"),
        col("postings"))
      .orderBy(col("df").desc, col("token"), col("segment"))

  /** A segment GENERATION (r13 verdict #6): full (token, segment) posting
    * rows over a corpus slice — ALL tokens, no nomination (global df is
    * unknowable inside one generation; nomination happens at serve/merge
    * time from merged stats). Per row: within-segment df/tf and the
    * sorted posting list; per-(token, segment) state is bounded by
    * `segWidth` no matter how hot the token, so a generation build over
    * a fresh crawl is the same bounded-task plan as
    * [[invertedIndexSharded]]'s final aggregate. */
  def segmentPostings(d: DataFrame, segWidth: Long = 128L): DataFrame =
    termFreqs(d)
      .withColumn("segment", expr(s"doc_id div $segWidth"))
      .groupBy(col("token"), col("segment"))
      .agg(count(lit(1)).as("seg_df"), sum(col("tf")).cast("long").as("seg_tf"),
        array_join(array_sort(collect_list(col("doc_id"))), ",").as("postings"))

  /** Segment merge/compaction — the operation a production index runs
    * continuously: fold two segment GENERATIONS (disjoint doc-id sets,
    * e.g. yesterday's index and today's crawl) into one, equal to a
    * from-scratch [[segmentPostings]] over the union (the law
    * `RetrievalSpec` pins). Per (token, segment) the merge sees at most
    * one row per generation, so the collect is bounded by the generation
    * count and each output row by `segWidth` ids — no corpus-sized state
    * anywhere. Posting ids re-sort NUMERICALLY (they are longs; a string
    * sort would order "10" before "9"). */
  def mergeSegments(g1: DataFrame, g2: DataFrame): DataFrame =
    g1.unionByName(g2)
      .groupBy(col("token"), col("segment"))
      .agg(sum(col("seg_df")).as("seg_df"), sum(col("seg_tf")).as("seg_tf"),
        array_join(
          transform(
            array_sort(flatten(collect_list(
              transform(split(col("postings"), ","), x => x.cast("long"))))),
            x => x.cast("string")),
          ",").as("postings"))

  /** Nominate + serve from merged generations: global df/tf recovered as
    * per-token sums of segment stats (exact — generations partition the
    * docs), top-`nTokens` selected with [[invertedIndexSharded]]'s exact
    * tie-break, posting rows emitted in its output shape. */
  private[graft] def mergedIndexTop(merged: DataFrame,
                                    nTokens: Int = 20): DataFrame = {
    val top = merged.groupBy(col("token"))
      .agg(sum(col("seg_df")).as("df"), sum(col("seg_tf")).as("total_tf"))
      .orderBy(col("df").desc, col("token")).limit(nTokens)
    merged.join(broadcast(top), "token")
      .select(col("token"), col("df"), col("total_tf"), col("segment"),
        col("postings"))
      .orderBy(col("df").desc, col("token"), col("segment"))
  }

  val queries: Map[String, Q] = Map(
    "q_bm25" -> ((s, dir) => bm25TopK(docs(s, dir))),
    "q_inverted_index" -> ((s, dir) => invertedIndex(docs(s, dir))),
    "q_inverted_index_sharded" -> ((s, dir) => invertedIndexSharded(docs(s, dir))),
    // two generations (doc_id < 32 = the first crawl, >= 32 = the
    // recrawl; the boundary deliberately falls INSIDE segment 0 so the
    // within-segment concatenation path exercises) built independently,
    // merged, then nominated/served — merged == rebuilt (RetrievalSpec),
    // so the oracle is q_inverted_index_sharded's SQL verbatim
    "q_index_segment_merge" -> ((s, dir) => {
      val d = docs(s, dir)
      mergedIndexTop(mergeSegments(
        segmentPostings(d.filter(col("doc_id") < 32)),
        segmentPostings(d.filter(col("doc_id") >= 32))))
    }),
    "q_hybrid_rrf" -> ((s, dir) =>
      hybridRrf(docs(s, dir), Tables.load(s, dir, "embeddings"))),
  )

  private val oracleBase: Map[String, String] = Map(
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |tfc AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tfc GROUP BY 1),
        |dfc AS (SELECT token, COUNT(*) AS df, SUM(tf) AS n_tok
        |        FROM tfc GROUP BY 1),
        |g AS (SELECT (SELECT SUM(dl) FROM dl) AS total_tokens,
        |             (SELECT COUNT(*) FROM documents) AS n_docs),
        |qt AS (SELECT token, df FROM dfc WHERE token NOT IN ('the', 'a')
        |       ORDER BY n_tok DESC, token LIMIT 3),
        |sc AS (SELECT t.doc_id,
        |         CAST(round(ln(1.0 + (n_docs - qt.df + 0.5) / (qt.df + 0.5)), 9)
        |              AS DECIMAL(18,9)) AS idf,
        |         t.tf, dl.dl,
        |         CAST(total_tokens AS DOUBLE) / n_docs AS avgdl
        |       FROM tfc t JOIN qt USING (token) JOIN dl USING (doc_id), g),
        |c AS (SELECT doc_id,
        |        CAST(round(CAST(idf AS DOUBLE) * (tf * 2.2) /
        |               (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)), 9)
        |             AS DECIMAL(18,9)) AS contrib
        |      FROM sc)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
        |  round(CAST(SUM(contrib) AS DOUBLE), 6) AS bm25
        |FROM c GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,
    "q_inverted_index" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |tfc AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |top AS (SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
        |        FROM tfc GROUP BY 1
        |        ORDER BY df DESC, token LIMIT 20)
        |SELECT token, df, total_tf,
        |  array_to_string(list_sort(list(doc_id)), ',') AS postings
        |FROM tfc JOIN top USING (token)
        |GROUP BY token, df, total_tf
        |ORDER BY df DESC, token""".stripMargin,
    "q_inverted_index_sharded" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |tfc AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |top AS (SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
        |        FROM tfc GROUP BY 1
        |        ORDER BY df DESC, token LIMIT 20)
        |SELECT token, df, total_tf, doc_id // 128 AS segment,
        |  array_to_string(list_sort(list(doc_id)), ',') AS postings
        |FROM tfc JOIN top USING (token)
        |GROUP BY token, df, total_tf, segment
        |ORDER BY df DESC, token, segment""".stripMargin,
    "q_hybrid_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |tfc AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tfc GROUP BY 1),
        |dfc AS (SELECT token, COUNT(*) AS df FROM tfc GROUP BY 1),
        |g AS (SELECT (SELECT SUM(dl) FROM dl) AS total_tokens,
        |             (SELECT COUNT(*) FROM documents) AS n_docs),
        |qt AS (SELECT t.token, dfc.df FROM tfc t JOIN dfc USING (token)
        |       WHERE t.doc_id = 0 ORDER BY t.tf DESC, t.token LIMIT 3),
        |sc AS (SELECT t.doc_id,
        |         CAST(round(ln(1.0 + (n_docs - qt.df + 0.5) / (qt.df + 0.5)), 9)
        |              AS DECIMAL(18,9)) AS idf,
        |         t.tf, dl.dl,
        |         CAST(total_tokens AS DOUBLE) / n_docs AS avgdl
        |       FROM tfc t JOIN qt USING (token) JOIN dl USING (doc_id), g
        |       WHERE t.doc_id <> 0),
        |c AS (SELECT doc_id,
        |        CAST(round(CAST(idf AS DOUBLE) * (tf * 2.2) /
        |               (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)), 9)
        |             AS DECIMAL(18,9)) AS contrib
        |      FROM sc),
        |lexpool AS (SELECT doc_id, round(CAST(SUM(contrib) AS DOUBLE), 6) AS bm25
        |            FROM c GROUP BY doc_id
        |            ORDER BY bm25 DESC, doc_id LIMIT 20),
        |lex AS (SELECT doc_id,
        |          CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
        |               AS BIGINT) AS lex_rank
        |        FROM lexpool),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |densepool AS (
        |  SELECT vec_id AS doc_id,
        |    round(list_inner_product(qv, v)
        |      / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))), 6)
        |      AS score
        |  FROM e, qv WHERE vec_id <> 0
        |  ORDER BY score DESC, doc_id LIMIT 20),
        |dense AS (SELECT doc_id,
        |            CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |                 AS BIGINT) AS vec_rank
        |          FROM densepool),
        |fused AS (
        |  SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
        |    lex_rank, vec_rank,
        |    COALESCE(CAST(round(1.0 / (lex_rank + 60), 9) AS DECIMAL(18,9)),
        |             CAST(0 AS DECIMAL(18,9)))
        |    + COALESCE(CAST(round(1.0 / (vec_rank + 60), 9) AS DECIMAL(18,9)),
        |               CAST(0 AS DECIMAL(18,9))) AS s
        |  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id)
        |SELECT doc_id, lex_rank, vec_rank, round(CAST(s AS DOUBLE), 6) AS rrf
        |FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
  )

  /** merged == rebuilt (the [[mergeSegments]] law), so the generation-
    * merge query shares the from-scratch sharded build's oracle
    * verbatim. */
  val oracle: Map[String, String] = oracleBase ++ Map(
    "q_index_segment_merge" -> oracleBase("q_inverted_index_sharded"))
}
