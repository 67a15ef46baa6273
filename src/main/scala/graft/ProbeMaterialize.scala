package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, MapType}

/** Force FULL materialization of a query result (every row, every column)
  * and reduce it to a tiny checksum row.
  *
  * `df.count()` is NOT a materialization action: Catalyst prunes every
  * column the count doesn't need — per-row computed columns vanish from
  * scan-shaped queries (`q_quality_classifier` "benched" 0.28 s where its
  * true cost is 9.4 s at sf10), and even aggregate-shaped queries lose
  * their aggregate expressions (count over `groupBy(k).agg(sum(x))`
  * optimizes to a distinct-count of k — verified on the optimized plan).
  * Folding all columns through xxhash64 into an aggregate makes nothing
  * prunable, so the measured time is the true cost of computing the full
  * result (without `Verify`'s coalesce(1) single-writer sink distorting
  * it).
  *
  * The checksum triple is (row count, bit_xor of row hashes, wrapping-sum
  * of row hashes as decimal): bit_xor alone cancels rows with even
  * multiplicity and ignores row count entirely (r8 ADVICE), so the
  * determinism check also compares the multiplicity-sensitive sum and the
  * count.
  *
  * `main`: dev probe — time a named registry query with this action.
  * Usage: runMain graft.ProbeMaterialize <queryName> [sfDir]
  */
object ProbeMaterialize {

  /** (rows, bit_xor of xxhash64 row hashes, wrapping sum of row hashes).
    * Order-independent, multiplicity-sensitive, nothing prunable. Map
    * columns are json-ized first (hashing MapType is disallowed —
    * key order would make the hash nondeterministic). */
  /** The checksum-wrapped frame itself — exposed so dev probes can execute
    * it and then walk ITS executed plan for populated SQL metrics. */
  private[graft] def wrap(df: DataFrame): DataFrame = {
    val hashable = df.schema.fields.map { f =>
      f.dataType match {
        case _: MapType => to_json(col(f.name)).as(f.name)
        case _          => col(f.name)
      }
    }
    val h = df.select(hashable.toIndexedSeq: _*)
    h.select(xxhash64(h.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"),
        sum(col("h").cast(DecimalType(38, 0))).as("s"))
  }

  def checksum(df: DataFrame): (Long, Long, BigDecimal) = {
    val r = wrap(df).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) BigDecimal(0) else BigDecimal(r.getDecimal(2)))
  }

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
      .config("spark.sql.streaming.checkpointFileManagerClass",
        Scratch.localCheckpointFileManager)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.preflight(spark, sfDir)
    // session warm-up against whichever table the (possibly partial)
    // probe corpus actually has
    val fs = new org.apache.hadoop.fs.Path(sfDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Tables.names.find(n =>
      fs.exists(new org.apache.hadoop.fs.Path(Tables.path(sfDir, n))))
      .foreach(n => spark.read.parquet(Tables.path(sfDir, n)).count())
    def once(): (Double, (Long, Long, BigDecimal)) = {
      // t0 BEFORE the query fn, matching Bench: streaming queries run
      // their stream (and e.g. IVF its driver-side prep) inside the fn,
      // and stamping after it would exclude that work from the probe
      val t0 = System.nanoTime()
      val c = checksum(SparkEntry.queries(name)(spark, sfDir))
      ((System.nanoTime() - t0) / 1e9, c)
    }
    val (t1, c1) = once()
    val (t2, c2) = once()
    require(c1 == c2,
      s"nondeterministic result: (rows, xor, sum) $c1 != $c2")
    println(f"[probe] $name materialized in ${math.min(t1, t2)}%.2f s " +
      f"(runs $t1%.2f/$t2%.2f, rows ${c1._1}, checksum ${c1._2}) at $sfDir")
    spark.stop()
  }
}
