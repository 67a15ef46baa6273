package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermark semantics under append mode with multi-batch file arrival —
  * the late-data divergence SURVEY.md §7.4 says to document: the reference
  * recomputes everything daily (late rows silently counted or missed); a
  * watermarked stream makes the lateness bound explicit. This test pins
  * the behavior: events below the watermark are dropped, closed windows
  * emit exactly once. */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("append-mode windowed count drops sub-watermark late events") {
    val dir = Files.createTempDirectory("graft_stream").toString
    def ts(s: String) = Timestamp.valueOf(s)
    // batch 1: two on-time day-1 events + one early-day-2 event that
    // advances the watermark past the end of day 1
    Seq(ts("2024-02-01 10:00:00"), ts("2024-02-01 11:00:00"),
        ts("2024-02-02 02:00:00")).toDF("ts")
      .coalesce(1).write.parquet(s"$dir/b1")
    Thread.sleep(1200) // distinct mod-times → deterministic batch order
    // batch 2: a day-3 event pushes the watermark far past day 1
    Seq(ts("2024-02-03 10:00:00")).toDF("ts")
      .coalesce(1).write.parquet(s"$dir/b2")
    Thread.sleep(1200)
    // batch 3: a very late day-1 event. Note the one-batch lag Spark
    // applies to the late-event filter (a row arriving in the batch right
    // after its watermark passed still merges — verified empirically);
    // two batches later it is unambiguously dropped.
    Seq(ts("2024-02-01 05:00:00")).toDF("ts")
      .coalesce(1).write.parquet(s"$dir/b3")

    val stream = spark.readStream
      .schema("ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$dir/*")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(to_date(col("w.start")).as("day"), col("n"))
    val q = stream.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("wm_test").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // day 1 emitted with ONLY the on-time events (late arrival dropped)
    assert(rows.get("2024-02-01").contains(2L), rows.toString)
    // day 2 closed by the day-3 event
    assert(rows.get("2024-02-02").contains(1L), rows.toString)
    // day 3's window never closes before the stream ends → not emitted
    assert(!rows.contains("2024-02-03"), rows.toString)
  }
}
