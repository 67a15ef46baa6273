package graft

import org.apache.spark.sql.SparkSession

/** Bench tooling (like [[ProbeStreamJoin]]): run the streaming minhash-LSH
  * near-dup detector through its PRODUCTION parquet-sink path on corpora
  * whose candidate volume no driver-collected sink can hold, and assert
  * the verified pair count equals the batch pipeline's on the same
  * corpus (caps un-engaged ⇒ identical pair sets; a mismatch means the
  * streaming bucket state diverged from the batch bucketing).
  *
  * Usage: runMain graft.ProbeStreamPairs [sfDir]
  */
object ProbeStreamPairs {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointLocation",
        Scratch.streamingCheckpointBase())
      .config("spark.sql.streaming.checkpointFileManagerClass",
        Scratch.localCheckpointFileManager)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = Scratch.tempDir("graft_ssp_sink_")
    val ckpt = Scratch.tempDir("graft_ssp_ckpt_")
    val t0 = System.nanoTime()
    val verified = streaming.Streams.streamingNearDupPairsToParquet(
      spark, sfDir, s"$out/pairs", s"$ckpt/q")
    val n = verified.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val rawCand = spark.read.parquet(s"$out/pairs").count()
    val batch = operators.Dedup.minhashNearDupPairs(spark, sfDir).count()
    val ok = n == batch
    println(f"""{"probe":"stream_pairs_file_sink","sf":"$sfDir","candidate_rows":$rawCand,"verified_pairs":$n,"batch_pairs":$batch,"pairs_match":$ok,"secs":$secs%.3f}""")
    if (!ok) sys.error(s"stream pair set diverged: streamed=$n batch=$batch")
    spark.stop()
  }
}
