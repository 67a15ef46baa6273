package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r15): time one registry query under the EXACT bench
  * methodology (same confs as [[Bench]], same
  * [[ProbeMaterialize.checksum]] action, min-of-2) with arbitrary session
  * conf OVERRIDES from the command line — the A/B instrument for
  * conf-sensitive hypotheses ("is the CC family's wall AQE stage-job
  * overhead?", "do tiny-frame loops want fewer shuffle partitions?")
  * without touching Bench itself.
  *
  * Usage: tools/run.sh graft.ProbeConf <q1,q2,...> [sfDir] [k=v]...
  */
object ProbeConf {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val overrides = args.drop(2).map { kv =>
      val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointLocation",
        Scratch.streamingCheckpointBase())
      .config("spark.sql.streaming.checkpointFileManagerClass",
        Scratch.localCheckpointFileManager)
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "10s")
      .config("spark.graft.pairPresentationSort", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
    overrides.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.preflight(spark, sfDir)
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    var total = 0.0
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        ProbeMaterialize.checksum(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      total += t
      println(f"[probe-conf] $name%-36s $t%8.3f s")
    }
    println(f"[probe-conf] TOTAL ${total}%8.3f s  overrides=${
      overrides.map { case (k, v) => s"$k=$v" }.mkString(",")}")
    spark.stop()
  }
}
