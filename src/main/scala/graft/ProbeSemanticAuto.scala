package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench tooling (r10 verdict #5): certify q_dedup_semantic_auto's win at
  * PROBE scale on a real-gap corpus. DedupAutoSpec proves the chooser and
  * the candidate cut at fixture scale (384 rows); this main derives a
  * 1000× real-gap variant of the embedding corpus (~500k rows by default:
  * 32 disjoint-plane classes × 150 in-plane variants × ~104 exact copies —
  * within-class cosine ≥ cos(0.1) ≈ 0.995, cross-class exactly 0, so the
  * certified dup-band edge sEff = 0.895 covers every true pair) and
  * measures the auto config's bounded pre-pass cost, raw candidate
  * volume, and end-to-end wall time against the static recall-first
  * default (4, 64), with an order-independent output checksum asserting
  * the dedup DECISION is identical under both configs.
  *
  * Usage: runMain graft.ProbeSemanticAuto [nClasses] [variants] [copies]
  */
object ProbeSemanticAuto {
  def main(args: Array[String]): Unit = {
    val nClasses = if (args.nonEmpty) args(0).toInt else 32
    val variants = if (args.length > 1) args(1).toInt else 150
    val copies = if (args.length > 2) args(2).toInt else 104
    require(nClasses <= 32, "disjoint 2-dim planes in 64 dims cap at 32")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = nClasses.toLong * variants * copies
    // class = id mod classes; variant = in-plane rotation by θ ∈ [0, 0.1];
    // identical (class, variant) rows are exact copies (the quotient path)
    val e = spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val k = (id % nClasses).toInt
        val v = ((id / nClasses) % variants).toInt
        val theta = 0.1 * v / math.max(1, variants - 1)
        val vec = new Array[Float](64)
        vec(k) = math.cos(theta).toFloat
        vec(k + 32) = math.sin(theta).toFloat
        (id, vec)
      }
    }.toDF("vec_id", "embedding").persist()
    val rows = e.count() // materialize so generation isn't timed

    // raw candidate volume = banded bucket pairs before verification —
    // the same reconstruction DedupAutoSpec uses (the verify is fused
    // into embeddingRepCandidatesOf, so the band stage is rebuilt alone)
    def candCount(r: Int, b: Int): Long = {
      val clusters = e.groupBy(col("embedding")).agg(min(col("vec_id")).as("rep"))
      val nSigs = math.max(4, (r * b + 63) / 64)
      val sigCols = (0 until nSigs).map(i =>
        functions.Sketches.rhSignature(col("embedding"), 64, 64, i * 64).as(s"s$i"))
      val reps = clusters.select(col("rep").as("vec_id") +: sigCols: _*)
      val banded = reps
        .select(col("vec_id").as("doc_id"),
          array((0 until nSigs).map(i => col(s"s$i")): _*).as("sigs"),
          explode(sequence(lit(0), lit(b - 1))).as("band_idx"))
        .withColumn("band_val",
          expr(s"""shiftrightunsigned(
                  |  element_at(sigs, cast((band_idx * $r) div 64 as int) + 1),
                  |  (band_idx * $r) % 64) & ${(1L << r) - 1}""".stripMargin))
        .select(col("doc_id"), col("band_idx"), col("band_val"))
      operators.Dedup.bucketPairs(banded, Seq("band_idx", "band_val")).count()
    }
    def checksum(df: DataFrame): Long = df
      // xor-fold of row hashes: order-independent, overflow-free (ANSI)
      .agg(expr("bit_xor(xxhash64(vec_id, cluster_size, norm))"))
      .head.getLong(0)

    val t0 = System.nanoTime()
    val cfg = operators.Dedup.autoBandConfig(e)
    val prepassSecs = (System.nanoTime() - t0) / 1e9
    require(!cfg.fallback, s"probe corpus must be gapped, got $cfg")
    val t1 = System.nanoTime()
    val csDef = checksum(operators.Dedup.semanticDedupOf(e))
    val defSecs = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val csAuto = checksum(operators.Dedup.semanticDedupOf(e, cfg.r, cfg.b))
    val autoSecs = (System.nanoTime() - t2) / 1e9
    require(csDef == csAuto, s"decision checksum drift: $csDef vs $csAuto")
    val candDef = candCount(4, 64)
    val candAuto = candCount(cfg.r, cfg.b)
    println(f"""{"probe":"semantic_auto","rows":$rows,"distinct":${nClasses * variants},"auto_r":${cfg.r},"auto_b":${cfg.b},"miss_bound":${cfg.missBound}%.2e,"prepass_secs":$prepassSecs%.3f,"default_secs":$defSecs%.3f,"auto_secs":$autoSecs%.3f,"cand_default":$candDef,"cand_auto":$candAuto,"checksum":$csDef,${RunMeta.jsonFields()}}""")
    spark.stop()
  }
}
