package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Tables

/** Stable contiguous ID assignment — the "give every row a dense global
  * sequence number" primitive (sample indices for a training run, surrogate
  * keys for a dimension load).
  *
  * The naive spelling — `row_number()` over an un-partitioned window — is
  * the canonical scale-killer: one task sorts the world. The distributed
  * idiom is range-repartition on the order key, sort within partitions,
  * then `zipWithIndex`: Spark computes per-partition counts (one tiny job)
  * and each partition numbers itself from its offset — two passes, no
  * single-partition stage, and because range partitions are ordered the
  * result equals the global-order row_number exactly. This is the one
  * place the engine drops to the RDD API on purpose: zipWithIndex has no
  * Dataset equivalent, and `monotonically_increasing_id` is explicitly NOT
  * contiguous (it encodes the partition id in high bits).
  */
object Ids {
  type Q = (SparkSession, String) => DataFrame

  /** Append a dense 0-based `seq_id` following the total order of
    * `orderCol` (which must be distinct — it tie-breaks nothing). */
  def contiguous(df: DataFrame, orderCol: String, nPart: Int = 32): DataFrame = {
    val sorted = df
      .repartitionByRange(nPart, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val schema = StructType(sorted.schema.fields :+
      StructField("seq_id", LongType, nullable = false))
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  val queries: Map[String, Q] = Map(
    "q_assign_ids" -> ((s, dir) => {
      contiguous(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id")
        .orderBy(col("seq_id"))
    }),
  )

  val oracle: Map[String, String] = Map(
    // the distributed assignment must equal the global-order row_number
    "q_assign_ids" ->
      """SELECT doc_id, lang,
        |  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq_id
        |FROM documents ORDER BY seq_id""".stripMargin,
  )
}
