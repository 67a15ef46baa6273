package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout writers — the storage side of 100 TB design (SURVEY.md
  * §4: the reference keeps a flat monthly-file directory, giving up
  * partition pruning entirely).
  *
  *  - Date partitioning: `pickup day → directory` turns every daily query
  *    into a single-partition read (static + dynamic partition pruning).
  *  - Bucketing: pre-shuffles a table by join key at write time; two tables
  *    bucketed the same way join with ZERO exchange — pay the shuffle once
  *    at ingest, not per query.
  *  - Range repartition before write: keeps files sorted/sized for
  *    row-group skipping on range predicates.
  */
object Layouts {
  /** Write `df` hive-partitioned by the calendar day of `tsCol`. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("p_date")
      .parquet(path)

  /** Write `df` as a bucketed (and in-bucket sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Range-partition by a sort column, then write — files arrive
    * min/max-clustered so range predicates skip whole row groups. */
  def writeRangeClustered(df: DataFrame, sortCol: String, n: Int,
                          path: String): Unit =
    df.repartitionByRange(n, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)

  /** Training-shard writer: hive-partition by a deterministic shard column
    * (e.g. [[graft.operators.PipelineOps]]'s md5-nibble shard), with the
    * rows for each shard co-located first so every shard directory holds
    * exactly `filesPerShard` files — not one file per (input partition ×
    * shard) pair, which is the small-file explosion partitionBy produces
    * when fed unclustered data. */
  def writeSharded(df: DataFrame, shardCol: String, path: String,
                   filesPerShard: Int = 1): Unit =
    df.repartition(filesPerShard, col(shardCol))
      .write.mode("overwrite")
      .partitionBy(shardCol)
      .parquet(path)

  /** Z-order (Morton-curve) clustering on two columns — the layout for
    * tables queried by range on EITHER of two dimensions (a 1-D sort
    * clusters only its own column; every file then spans the full range of
    * the other, so nothing skips).
    *
    * Rank-based, like production z-ordering: each column maps to a 256-way
    * quantile-bucket id (two distributed `approxQuantile` sketches — skew
    * cannot collapse the curve the way min/max normalization would), the
    * bucket ids interleave into a 16-bit z-value
    * ([[graft.functions.BitInterleave]]), and rows range-partition + sort
    * by it. Files come out covering ~√(1/nFiles) of EACH dimension, so a
    * selective predicate on either column prunes most files via parquet
    * footer min/max — at 100 TB this is the difference between scanning a
    * few files and scanning the table. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, nFiles: Int,
                    path: String): Unit = {
    val buckets = 256
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val Array(splitsA, splitsB) =
      Array(colA, colB).map(c =>
        df.select(col(c).cast("double").as(c)).stat.approxQuantile(c, probs, 0.001))
    def bucketOf(c: String, splits: Array[Double]) = {
      val arr = array(splits.toSeq.map(lit): _*)
      size(filter(arr, s => s <= col(c).cast("double")))
    }
    df.withColumn("__z", graft.functions.PortableMath.zValue(
        bucketOf(colA, splitsA), bucketOf(colB, splitsB), bits = 8))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a parquet directory toward `targetBytes` per output file —
    * the small-file remedy for long-running ingest (thousands of tiny
    * files make the scan's file index, not the I/O, the bottleneck).
    * Output file count = ceil(input bytes / target), minimum 1; data is
    * round-robin repartitioned, so files come out uniform. */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long): Int = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
