package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only scale-up replicator: derives an ~Nx dataset from an existing
  * scale-factor dir by unioning key-shifted copies, so scaling cliffs the
  * small-SF numbers hide (quadratic candidate growth, spill thresholds,
  * skew) show up locally. NOT part of the correctness surface — oracles
  * run only on the driver-provided corpora.
  *
  * Shape choices:
  *  - documents: each copy transliterates its text by a rotated vowel
  *    mapping — most docs become unique, while copies sharing a rotation
  *    (10 copies over 6 rotations) form planted exact-dup groups, a
  *    realistic dup-heavy crawl.
  *  - embeddings: copies keep identical vectors → every vector sits in an
  *    exact-dup cluster of N, stress-testing the near-dup path's bucket
  *    and verify volume.
  *  - lineitem/orders: orderkeys shift consistently so joins stay sound;
  *    dimension tables stay single-copy (10x facts per dimension row).
  *  - events: event_ids shift; timestamps repeat (10x events per day).
  *
  * Usage: runMain graft.ScaleData <srcSfDir> <outDir> [copies] [tables]
  * (tables = comma list to replicate a subset, e.g. "documents,embeddings"
  * for a deep text/embedding probe without paying for 1000x events)
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "args: <srcSfDir> <outDir> [copies]")
    val (src, out) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else Set.empty
    val spark = SparkSession.builder()
      // FIXED default width: derived-parquet part-file layout follows the
      // generating session's parallelism, and layout sets scan split
      // counts downstream — two corpora generated at different widths
      // bench differently on scan-bound queries (measured, r11 sf1
      // refresh). Override consciously, and record it next to the
      // artifact if you do.
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def replicate(name: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      val base = spark.read.parquet(Tables.path(src, name))
      val all = (0 until copies).map(i => shift(base, i)).reduce(_ unionAll _)
      if (name == "events" || name == "documents") {
        // the streaming file sources glob for FILES named events.parquet /
        // documents.parquet — write one flat file, not a directory of
        // parts, or every doc-stream probe silently reads ZERO rows (the
        // pre-r8 q_stream_doc_clean sf10 rows were vacuous exactly so)
        val tmp = s"$out/.${name}_tmp"
        all.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
        val fs = new org.apache.hadoop.fs.Path(out)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).find(_.getName.endsWith(".parquet")).get
        val dst = new org.apache.hadoop.fs.Path(Tables.path(out, name))
        fs.delete(dst, true)
        fs.rename(part, dst)
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      } else {
        all.write.mode(SaveMode.Overwrite).parquet(Tables.path(out, name))
      }
      println(s"[scale] $name -> ${copies}x")
    }

    val idStep = 10_000_000L
    val vowels = "aeiouy"
    def rot(i: Int): String = { val r = i % vowels.length; vowels.drop(r) + vowels.take(r) }

    replicate("documents") { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * idStep))
        .withColumn("text", translate(col("text"), vowels, rot(i)))
    }
    // embeddings keep the CORPUS CONTRACT: vec_ids contiguous 0..N-1
    // (TESTDATA.md shape; q_contrastive_triples' LCG negative indexing
    // depends on it and fails loudly otherwise — the r9 probe corpus
    // with idStep-sparse vec_ids tripped exactly that guard). Copies
    // shift by the exact source count, so contiguity is preserved.
    val vecCount = spark.read.parquet(Tables.path(src, "embeddings")).count()
    replicate("embeddings") { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * vecCount))
    }
    replicate("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * idStep))
    }
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * idStep))
    }
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * idStep))
    }
    for (dim <- Seq("region", "nation", "customer", "supplier", "part")
         if only.isEmpty || only.contains(dim))
      spark.read.parquet(Tables.path(src, dim))
        .write.mode(SaveMode.Overwrite).parquet(Tables.path(out, dim))
    spark.stop()
  }
}
