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
