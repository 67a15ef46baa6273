package graft

import org.apache.spark.sql.SparkSession

/** Bench tooling (like [[ProbeStreamPairs]]): run the streaming text-hygiene
  * stage through its PRODUCTION parquet-sink path on corpora whose cleaned
  * output no driver-collected sink can hold, and assert the sink contents
  * equal the batch form of the same transform (count + order-independent
  * checksum) — a mismatch means the stream dropped or duplicated rows.
  *
  * Usage: runMain graft.ProbeStreamClean [sfDir]
  */
object ProbeStreamClean {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        Scratch.localCheckpointFileManager)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val out = Scratch.tempDir("graft_sclean_sink_")
    val ckpt = Scratch.tempDir("graft_sclean_ckpt_")
    val t0 = System.nanoTime()
    val streamed = streaming.Streams.docCleanStreamToParquet(
      spark, sfDir, s"$out/clean", s"$ckpt/q")
    val cs = ProbeMaterialize.checksum(streamed)
    val secs = (System.nanoTime() - t0) / 1e9
    val batch = Tables.load(spark, sfDir, "documents")
      .filter(col("n_chars") >= 100 && col("n_chars") <= 2000)
      .select(col("doc_id"), col("lang"),
        regexp_replace(trim(lower(col("text"))), " +", " ").as("norm_text"))
    val cb = ProbeMaterialize.checksum(batch)
    val ok = cs == cb
    println(f"""{"probe":"stream_clean_file_sink","sf":"$sfDir","rows":${cs._1},"secs":$secs%.3f,"matches_batch":$ok}""")
    if (!ok) sys.error(s"stream clean diverged from batch: streamed=$cs batch=$cb")
    spark.stop()
  }
}
