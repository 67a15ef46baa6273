package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCD-1 upsert into a hive-partitioned parquet table — the missing MERGE
  * for plain parquet (the reference approximates it with a full
  * overwrite+truncate of the Postgres table every run;
  * `calculate_top_taxi_zones.py:54`).
  *
  * Scale contract: only the partitions that contain updated keys are
  * rewritten. At 100 TB with daily partitions, upserting one day touches
  * one directory — the other 1999 days are never read or written. This
  * relies on dynamic partition overwrite (`partitionOverwriteMode=dynamic`)
  * and on the standard fact-table assumption that a key never changes
  * partition (an update that moved a key across partitions would leave the
  * stale row in its old partition; callers doing that must delete first).
  *
  * The merged slice stages to a sibling directory before the overwrite:
  * Spark refuses to overwrite a path it is concurrently reading, and the
  * stage-then-rewrite also makes the swap crash-safe (a failed job leaves
  * the target untouched; stale stage dirs are cleaned on the next run).
  */
object Merge {
  /** Keyed MERGE (SCD-1 by primary key, no partition assumption): updates
    * win on key collision, unmatched base rows survive, new keys insert.
    * If `updates` may carry several versions of a key, compact it first
    * (e.g. the `q_log_compact` max_by shape) — this function treats
    * `updates` as one-row-per-key.
    *
    * Scale contract: ONE anti-join shuffle of the base by key (the
    * irreducible cost of keyed merge on sorted-nothing parquet). On a
    * bucketed base table ([[Layouts.writeBucketed]]) the exchange on the
    * base side disappears and only `updates` shuffles. */
  def upsertKeyed(base: DataFrame, updates: DataFrame,
                  keyCols: Seq[String]): DataFrame = {
    val survivors = base.join(updates.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    survivors.unionByName(updates.select(base.columns.map(col): _*))
  }

  def upsertPartitioned(spark: SparkSession, targetDir: String,
                        updates: DataFrame, keyCols: Seq[String],
                        partCol: String): Unit = {
    val target = spark.read.parquet(targetDir)
    val affected = updates.select(col(partCol)).distinct()
    // survivors: rows of affected partitions whose key is not being replaced
    val slice = target
      .join(broadcast(affected), Seq(partCol), "left_semi")
      .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
    val merged = slice.unionByName(updates.select(target.columns.map(col): _*))

    val stage = new Path(new Path(targetDir).getParent,
      s".${new Path(targetDir).getName}_stage")
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stage, true)
    merged.write.parquet(stage.toString)

    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      spark.read.parquet(stage.toString)
        .write.mode("overwrite").partitionBy(partCol).parquet(targetDir)
    finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      fs.delete(stage, true)
    }
  }
}
