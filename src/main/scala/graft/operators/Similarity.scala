package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Sketches

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §7.2 step 7).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact baseline. Queries are broadcast, so
  *    the fact side streams — O(n·q) with no shuffle of the corpus; right
  *    whenever q (the query batch) is small, at any corpus size.
  *  - LSH-bucketed: random-hyperplane signatures partition the corpus into
  *    buckets; a query only probes matching signature bands. Candidate
  *    generation is an equi-join — shuffle bounded by bucket sizes, the
  *    100 TB path when the corpus has neighbor structure.
  *
  * Cosine is a custom fused catalyst expression
  * ([[graft.functions.CosineSim]]) — one pass, double precision. Scores are
  * rounded to 6 decimals *before* ranking so ordering (and the oracle
  * comparison) is stable across engines.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private val nQueries = 10
  private val topK = 5

  val queries: Map[String, Q] = Map(
    "q_similarity_topk" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("vec_id"))
      broadcast(q).join(e, col("vec_id") =!= col("qid"))
        .withColumn("score", round(Sketches.cosineSim(col("qv"), col("embedding")), 6))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= topK)
        .select(col("qid"), col("vec_id"), col("score"), col("rn"))
        .orderBy(col("qid"), col("rn"))
    }),

    // ANN via hyperplane LSH, 48 bands × 2 bits (96 planes over 2 stacked
    // signatures; sign-agreement p=1-θ/π per plane → band hit p², 48
    // independent chances → miss (1-p²)⁴⁸). This corpus has NO neighbor
    // structure — true top-5 scores sit at cos 0.25-0.51 against background
    // ~0.2, so p≈0.58-0.65 at the floor and recall ~1 (miss ≤ 2.4e-9 per
    // slot) costs probing most of the corpus; exact cosine re-ranks the
    // candidates, making the output equal brute force (the registered
    // oracle). On a corpus with real cluster structure the same operator
    // runs r=8/b=16 and probes a small fraction — b, r are tuning knobs.
    "q_similarity_lsh" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          Sketches.rhSignature(col("embedding"), 64, 64, 256).as("sa"),
          Sketches.rhSignature(col("embedding"), 32, 64, 320).as("sb"))
      val banded = e
        .select(col("vec_id"), col("embedding"), col("sa"), col("sb"),
          explode(sequence(lit(0), lit(47))).as("band_idx"))
        .withColumn("band_val", expr(
          """CASE WHEN band_idx < 32
            |  THEN shiftrightunsigned(sa, band_idx * 2) & 3
            |  ELSE shiftrightunsigned(sb, (band_idx - 32) * 2) & 3 END""".stripMargin))
        .select(col("vec_id"), col("embedding"), col("band_idx"), col("band_val"))
      val q = banded.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("band_idx"), col("band_val"))
      val cand = broadcast(q).join(banded,
          Seq("band_idx", "band_val"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qv"), col("vec_id"), col("embedding"))
        .distinct()
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("vec_id"))
      cand
        .withColumn("score", round(Sketches.cosineSim(col("qv"), col("embedding")), 6))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= topK)
        .select(col("qid"), col("vec_id"), col("score"), col("rn"))
        .orderBy(col("qid"), col("rn"))
    }),

    "q_similarity_ivf" -> ((s, dir) => ivf(s, dir)),

    "q_similarity_pq" -> ((s, dir) => pq(s, dir)),

    // int8 symmetric quantization of the embedding column — 4× smaller
    // vectors for shuffle/storage (the cheap first rung of the
    // compression ladder below PQ's 16×). Pure scan-stage column algebra:
    // per-vector absmax scale, round-to-int codes, and the max
    // dequantization error (∞-norm) for a quality gate. Oracle-exact:
    // both engines compute in widened doubles with the same op order,
    // and round() is half-away-from-zero in both. The code vector is
    // emitted as a comma-joined STRING, not a raw array column: the
    // values are exact integers so the text form hashes identically,
    // and downstream tabular harnesses can sort it (raw array columns
    // are unhashable in pandas — the round-4 red).
    "q_embed_quantize" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val v = transform(col("embedding"), x => x.cast("double"))
      e.select(col("vec_id"), v.as("v"))
        .withColumn("scale",
          greatest(abs(array_max(col("v"))), abs(array_min(col("v")))))
        .withColumn("qv", transform(col("v"),
          x => round(x / col("scale") * 127).cast("int")))
        .withColumn("max_err", aggregate(
          zip_with(col("v"), col("qv"),
            (x, q) => abs(x - q.cast("double") * col("scale") / 127)),
          lit(0.0), (acc, d) => greatest(acc, d)))
        .select(col("vec_id"), col("scale"),
          concat_ws(",", col("qv")).as("qv"), col("max_err"))
        .orderBy(col("vec_id"))
    }),
  )

  /** Spherical k-means codebook, trained driver-side on a bounded
    * deterministic sample (`sampleN` vectors — constant-size collect
    * regardless of corpus size; model fitting is the one legitimate
    * driver-side loop in this module). Init = first k sample vectors;
    * Lloyd iterations assign by cosine and recenter by mean, all
    * deterministic, so the codebook — and every query using it — is
    * stable across runs. */
  private[operators] def trainCodebook(e: DataFrame, k: Int = 16,
      sampleN: Int = 256, iters: Int = 8): Seq[Seq[Float]] = {
    val sample: Array[Array[Double]] = e.filter(col("vec_id") < sampleN)
      .orderBy(col("vec_id")).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.length >= k, s"need ≥$k sample vectors, got ${sample.length}")
    val dim = sample.head.length
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    var centroids = sample.take(k).map(_.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bs = Double.NegativeInfinity
        var c = 0
        while (c < k) { val sc = cos(v, centroids(c)); if (sc > bs) { bs = sc; best = c }; c += 1 }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
        else sums(c).map(_ / counts(c)))
    }
    centroids.map(_.map(_.toFloat).toSeq).toSeq
  }

  /** IVF ANN: every vector is assigned to its nearest trained-codebook
    * cell by the [[graft.functions.NearestCells]] expression — pure scan-
    * stage compute, no crossed frame, no window, no shuffle (the round-1
    * shape shuffled 16× the corpus through `row_number()` to take this
    * argmax). Queries probe their top-`nprobe` cells; candidates come from
    * a broadcast join on cell id (corpus side streams); the exact top-k
    * re-rank runs on [[graft.plans.TopKPerKey]] bounded heaps — k rows per
    * query per mapper cross the one hash exchange, and rank is stamped by
    * sorting the ≤k collected rows per query, not a window over
    * candidates. */
  private def ivf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val cb = trainCodebook(e)
    val nprobe = 3
    val cells = e.withColumn("cell",
      element_at(Sketches.nearestCells(col("embedding"), cb, 1), 1))
    val probes = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .select(col("qid"), col("qv"),
        explode(Sketches.nearestCells(col("qv"), cb, nprobe)).as("cell"))
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("score", round(Sketches.cosineSim(col("qv"), col("embedding")), 6))
      .select(col("qid"), col("vec_id"), col("score"))
    val top = graft.plans.TopK.perKey(scored, Seq("qid"),
      Seq(("score", true), ("vec_id", false)), topK)
    // rank stamp over the ≤k survivors per query: sorted collect + position,
    // reusing TopK's hash partitioning — no Window, no extra exchange
    top.groupBy(col("qid"))
      .agg(sort_array(collect_list(
        struct((-col("score")).as("neg"), col("vec_id").as("vec_id"),
          col("score").as("score")))).as("xs"))
      .select(col("qid"), posexplode(col("xs")).as(Seq("pos", "x")))
      .select(col("qid"), col("x.vec_id").as("vec_id"), col("x.score").as("score"),
        (col("pos") + 1).cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Per-subspace L2 k-means codebooks for product quantization — same
    * bounded-deterministic training contract as [[trainCodebook]]: a
    * constant-size sample (never the corpus), first-k-distinct init, Lloyd
    * iterations; stable across runs. Returns M codebooks of K centroids of
    * dim/M floats each. */
  private[operators] def trainPqCodebooks(e: DataFrame, m: Int = 8, k: Int = 16,
      sampleN: Int = 256, iters: Int = 8): Seq[Seq[Seq[Float]]] = {
    val sample: Array[Array[Double]] = e.filter(col("vec_id") < sampleN)
      .orderBy(col("vec_id")).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.length >= k, s"need ≥$k sample vectors, got ${sample.length}")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    (0 until m).map { mi =>
      val subs = sample.map(_.slice(mi * dsub, (mi + 1) * dsub))
      val init = subs.distinct.take(k)
      var centroids = Array.tabulate(k)(i => init(i % init.length).clone)
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Int](k)
        subs.foreach { v =>
          var best = 0; var bd = Double.PositiveInfinity
          var c = 0
          while (c < k) {
            var dist = 0.0; var i = 0
            while (i < dsub) { val df = v(i) - centroids(c)(i); dist += df * df; i += 1 }
            if (dist < bd) { bd = dist; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        centroids = Array.tabulate(k)(c =>
          if (counts(c) == 0) centroids(c) else sums(c).map(_ / counts(c)))
      }
      centroids.map(_.map(_.toFloat).toSeq).toSeq
    }
  }

  /** PQ ANN (asymmetric distance): the corpus is scanned as M-byte PQ codes
    * ([[graft.functions.PqEncode]], scan-stage, no shuffle) — at 100 TB the
    * ANN pass reads ~64× less than raw vectors. Each of the (bounded,
    * broadcast) queries carries a precomputed lookup table
    * `lut[m*K + c] = <q_m, centroid_{m,c}>`, so the approximate inner
    * product per corpus row is M array lookups via built-in `aggregate` —
    * whole-stage codegen, no custom scoring expression needed. The ADC
    * shortlist (8×k per query, bounded [[graft.plans.TopKPerKey]] heaps)
    * is re-ranked by exact cosine; recall vs the exact baseline is pinned
    * in PqSpec (ADC is an approximation — rows-only check, IVF precedent). */
  private def pq(s: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val e = Tables.load(s, dir, "embeddings")
    // m=16 subspaces of 4 dims, 16 centroids each: 16 bytes/vector (16×
    // compression); on this structure-free corpus (top-5 at cos 0.25-0.51
    // vs background ~0.2) coarser m=8 drops recall below 0.8
    val m = 16; val kCent = 16
    val cb = trainPqCodebooks(e, m, kCent)
    val codes = e.select(col("vec_id"), col("embedding"),
      graft.functions.Pq.pqEncode(col("embedding"), cb).as("code"))
    // bounded driver-side LUT build: nQueries rows, like the codebook sample
    val qRows = e.filter(col("vec_id") < nQueries).orderBy(col("vec_id"))
      .select(col("vec_id"), col("embedding")).collect()
    val dsub = cb.head.head.length
    val lutRows = qRows.map { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      val lut = Array.tabulate(m * kCent) { i =>
        val (mi, ci) = (i / kCent, i % kCent)
        var dot = 0.0; var d = 0
        while (d < dsub) { dot += qv(mi * dsub + d) * cb(mi)(ci)(d); d += 1 }
        dot
      }
      org.apache.spark.sql.Row(qid, qv.toSeq, lut.toSeq)
    }
    val lutSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("qv",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("lut",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))))
    val luts = s.createDataFrame(lutRows.toSeq.asJava, lutSchema)
    val adc = codes.crossJoin(broadcast(luts))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("adc", expr(
        s"""aggregate(sequence(0, ${m - 1}), CAST(0.0 AS DOUBLE),
           |  (acc, mm) -> acc + element_at(lut, mm * $kCent + element_at(code, mm + 1) + 1))"""
          .stripMargin))
      .select(col("qid"), col("qv"), col("vec_id"), col("embedding"), col("adc"))
    val shortlist = graft.plans.TopK.perKey(adc, Seq("qid"),
      Seq(("adc", true), ("vec_id", false)), 8 * topK)
    val exact = shortlist
      .withColumn("score", round(Sketches.cosineSim(col("qv"), col("embedding")), 6))
      .select(col("qid"), col("vec_id"), col("score"))
    val top = graft.plans.TopK.perKey(exact, Seq("qid"),
      Seq(("score", true), ("vec_id", false)), topK)
    top.groupBy(col("qid"))
      .agg(sort_array(collect_list(
        struct((-col("score")).as("neg"), col("vec_id").as("vec_id"),
          col("score").as("score")))).as("xs"))
      .select(col("qid"), posexplode(col("xs")).as(Seq("pos", "x")))
      .select(col("qid"), col("x.vec_id").as("vec_id"), col("x.score").as("score"),
        (col("pos") + 1).cast("long").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  val oracle: Map[String, String] = Map(
    "q_embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        greatest(abs(list_max(v)), abs(list_min(v))) AS scale
        |      FROM e),
        |q AS (SELECT vec_id, v, scale,
        |        list_transform(v, x -> CAST(round(x / scale * 127) AS INTEGER)) AS qv
        |      FROM s)
        |SELECT vec_id, scale, array_to_string(qv, ',') AS qv,
        |  list_max(list_transform(list_zip(v, qv),
        |    p -> abs(p[1] - CAST(p[2] AS DOUBLE) * scale / 127))) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_similarity_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT qid, vec_id,
        |    round(list_inner_product(qv, v)
        |      / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))), 6) AS score
        |  FROM q CROSS JOIN e WHERE vec_id != qid)
        |SELECT qid, vec_id, score, rn FROM (
        |  SELECT qid, vec_id, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
        |  FROM scored)
        |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    // LSH candidates cover every true top-5 slot (miss ≤ 2.4e-9, fixed
    // seeded planes → deterministic) and the re-rank is exact cosine, so
    // the output equals the brute-force baseline's
    "q_similarity_lsh" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT qid, vec_id,
        |    round(list_inner_product(qv, v)
        |      / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))), 6) AS score
        |  FROM q CROSS JOIN e WHERE vec_id != qid)
        |SELECT qid, vec_id, score, rn FROM (
        |  SELECT qid, vec_id, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
        |  FROM scored)
        |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
  )
}
