package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §7 north star): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus a batched
  * decode/feature-extract path.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing is real:
  * binary column handling, schema of the feature output, partition-parallel
  * batched processing via `mapPartitions` over a typed Dataset (the Scala
  * analog of `mapInPandas`: one iterator per partition, amortized per-batch
  * setup, no per-row driver round-trips), and pushdown-friendly metadata
  * predicates.
  *
  * The corpus has no binary table, so `documents.text` bytes stand in for
  * encoded media (cast to binary); a real deployment swaps the stub for a
  * codec and nothing else changes.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Raw media row as it would arrive: payload + declared kind. */
  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (what a decoder would emit per media object).
    * `resized_*`: output dims/bytes of the stubbed 2× downscale. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, head_mean: Double,
                           resized_w: Int, resized_h: Int, resized_bytes: Long)

  /** STUB decode + resize: a real implementation would decode image/audio
    * frames and rescale here (per-partition codec init, then per-row
    * decode). The stub derives deterministic pseudo-features and a fake
    * 2×-downscale geometry from the payload bytes so the pipeline shape —
    * batched partition iteration, typed output schema, resize metadata —
    * is fully exercised and testable without codecs. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // per-partition "codec" setup would go here
    rows.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum = 31 * sum + (r.payload(i) & 0xff); i += 1 }
      val head = r.payload.take(16)
      val mean = if (head.isEmpty) 0.0
        else head.map(b => (b & 0xff).toDouble).sum / head.length
      // fake source geometry from the payload size, then a 2× downscale
      val w = math.max(1, (r.payload.length % 64) + 1)
      val h = math.max(1, r.payload.length / math.max(1, w))
      val (rw, rh) = (math.max(1, w / 2), math.max(1, h / 2))
      MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, sum, mean,
        rw, rh, rw.toLong * rh)
    }
  }

  private def media(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  val queries: Map[String, Q] = Map(
    // metadata over opaque binary payloads — all built-ins, oracle-checked
    "q_multimodal_meta" -> ((s, dir) => {
      media(s, dir).select(
        col("doc_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        ascii(substring(col("payload").cast("string"), 1, 1)).cast("long")
          .as("first_byte"))
        .orderBy(col("doc_id"))
    }),

    // frame sampling: one "frame" per fixed byte stride of the payload
    // (stand-in for video frame extraction — the array-building/stride
    // plumbing is the real part; string-joined for the oracle compare)
    "q_multimodal_frames" -> ((s, dir) => {
      media(s, dir)
        .withColumn("txt", col("payload").cast("string"))
        .select(col("doc_id"), col("kind"),
          expr("""array_join(transform(sequence(0, cast((length(txt)-1)/50 as int)),
                   i -> ascii(substr(txt, i*50 + 1, 1))), ',')""").as("frame_bytes"),
          (floor((length(col("txt")) - 1) / 50) + 1).cast("long").as("n_frames"))
        .orderBy(col("doc_id"))
    }),

    // batched decode via mapPartitions over Dataset[MediaRow] (stubbed
    // codec, real plumbing) — rows-only check + unit test
    "q_multimodal_features" -> ((s, dir) => {
      import s.implicits._
      media(s, dir).as[MediaRow]
        .mapPartitions(decodeStub)
        .toDF()
        .orderBy(col("doc_id"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_frames" ->
      """SELECT doc_id,
        |  ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |  array_to_string([ascii(substr(text, i*50 + 1, 1))
        |                   for i in range(0, CAST(floor((length(text)-1)/50) AS INTEGER) + 1)],
        |                  ',') AS frame_bytes,
        |  CAST(floor((length(text)-1)/50) + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
