package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Streams, Tws}

/** transformWithState semantics: cross-batch accumulation over the three
  * state variables (two ValueState counters/bounds + the MapState
  * histogram), µs-exact timestamp round-trip, and per-key isolation. */
class TwsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("profile state accumulates across micro-batches; keys stay isolated") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val profiles = Tws.profileStream(input.toDS())
    Streams.withStateStoreProvider(spark, Streams.RocksDbProvider) {
      val q = profiles.toDF().writeStream
        .format("memory").queryName("tws_test")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(
          (1L, ts("2024-01-01 08:00:00.000123"), "view"),
          (1L, ts("2024-01-02 09:00:00"), "view"),
          (2L, ts("2024-01-03 10:00:00"), "purchase"))
        q.processAllAvailable()
        input.addData(
          (1L, ts("2024-01-05 11:00:00.000456"), "purchase"),
          (1L, ts("2023-12-31 07:00:00"), "view")) // earlier than batch 1
        q.processAllAvailable()
      } finally q.stop()
    }
    val rows = spark.table("tws_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getLong(4)))
    // user 1 emitted twice (once per batch); the second emission carries
    // the MERGED state: 4 events, first_ts from batch 2's earlier row,
    // last_ts from batch 2's later row, purchase count from the MapState
    val u1 = rows.filter(_._1 == 1L)
    assert(u1.length == 2, s"one emission per batch expected: ${rows.toSeq}")
    val fin = u1.maxBy(_._2)
    assert(fin == ((1L, 4L, ts("2023-12-31 07:00:00"),
      ts("2024-01-05 11:00:00.000456"), 1L)), s"got $fin")
    // µs precision survived the state round-trip (batch-1 emission)
    val b1 = u1.minBy(_._2)
    assert(b1._3 == ts("2024-01-01 08:00:00.000123"), s"µs lost: $b1")
    // user 2 untouched by user 1's updates
    assert(rows.filter(_._1 == 2L).toSeq == Seq(
      (2L, 1L, ts("2024-01-03 10:00:00"), ts("2024-01-03 10:00:00"), 1L)))
  }
}
