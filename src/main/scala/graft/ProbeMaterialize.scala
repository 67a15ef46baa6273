package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: time a named query with EVERY output column forced.
  *
  * `Bench` times `df.count()`, which is the right cheap action for
  * aggregate-shaped queries (the aggregation must run to know the count)
  * but lets Catalyst prune the computed columns out of scan-shaped
  * per-row queries — a pure projection benches as a row count. This main
  * folds all columns through xxhash64 into one checksum, so nothing is
  * prunable and the printed time is the true materialization cost
  * (without `Verify`'s coalesce(1) single-writer sink distorting it).
  *
  * Usage: runMain graft.ProbeMaterialize <queryName> [sfDir]
  */
object ProbeMaterialize {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.preflight(spark, sfDir)
    spark.read.parquet(s"$sfDir/nation.parquet").count() // session warm-up
    def once(): (Double, Long) = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      // bit_xor: order-independent, overflow-free checksum over all rows
      val sum = df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head.getLong(0)
      ((System.nanoTime() - t0) / 1e9, sum)
    }
    val (t1, s1) = once()
    val (t2, s2) = once()
    require(s1 == s2, s"nondeterministic result: checksum $s1 != $s2")
    println(f"[probe] $name materialized in ${math.min(t1, t2)}%.2f s " +
      f"(runs $t1%.2f/$t2%.2f, checksum $s1) at $sfDir")
    spark.stop()
  }
}
