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
  *    buckets; a query only probes matching 8-bit signature bands
  *    (multiprobe via 2 bands). Candidate generation is an equi-join —
  *    shuffle bounded by bucket sizes, the 100 TB path.
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

    // ANN: 32-bit hyperplane signature bucketed as 8 bands × 4 bits (≈0.7
    // recall at cosine 0.35-0.5 on unclustered vectors; sign-agreement
    // p=1-θ/π per plane → band hit p⁴, 8 independent chances). Exact cosine
    // re-rank inside candidate buckets. Approximate by construction → no
    // SQL oracle (rows-only check); recall vs brute force is unit-tested.
    "q_similarity_lsh" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("sig", Sketches.rhSignature(col("embedding"), 32, 64))
      val banded = e.select(col("vec_id"), col("embedding"),
        posexplode(array((0 until 8).map(i =>
          shiftrightunsigned(col("sig"), i * 4).bitwiseAND(lit(0xFL))): _*))
          .as(Seq("band_idx", "band_val")))
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
  )

  /** IVF-style ANN: a fixed deterministic codebook (first 16 vectors — a
    * real deployment k-means-trains it; the assignment/probe plumbing is
    * identical), every vector assigned to its nearest centroid cell, query
    * probes its top-`nprobe` cells, exact re-rank inside. Linear cost:
    * n×|codebook| assignment, then per-cell candidate scan. */
  private def ivf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val cb = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    def assign(df: DataFrame, idCol: String, vecCol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("cell_score").desc, col("cell"))
      df.join(broadcast(cb), lit(true))
        .withColumn("cell_score", Sketches.cosineSim(col(vecCol), col("cv")))
        .withColumn("cell_rn", row_number().over(w))
        .filter(col("cell_rn") <= keep)
        .drop("cv", "cell_score", "cell_rn")
    }
    val cells = assign(e, "vec_id", "embedding", keep = 1)
    val probes = assign(
      e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")),
      "qid", "qv", keep = 2) // nprobe = 2
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    probes.join(cells, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("score", round(Sketches.cosineSim(col("qv"), col("embedding")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("vec_id"), col("score"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  val oracle: Map[String, String] = Map(
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
  )
}
