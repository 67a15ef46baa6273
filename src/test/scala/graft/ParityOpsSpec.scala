package graft

import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.operators.{DailyTransactions, TopZones}

/** Edge-case suite for the reference-parity operators over literal
  * HVFHV-shaped frames (FIXTURES.md §A): empty day → count 0, null
  * timestamps dropped, dense_rank tie-inclusion (>N rows out). */
class ParityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trips = Seq(
    (Some(ts("2024-03-01 00:00:00")), Some(1L)),  // day boundary: counted on 03-01
    (Some(ts("2024-03-01 23:59:59")), Some(1L)),
    (Some(ts("2024-03-02 00:00:00")), Some(2L)),  // next day
    (None, Some(3L)),                             // null pickup → dropped
  ).toDF("pickup_datetime", "PULocationID")

  test("dayCount: boundary inclusion and null handling") {
    val r = DailyTransactions.dayCount(trips, "pickup_datetime",
      LocalDate.parse("2024-03-01")).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 2L)
  }

  test("dayCountTyped: Dataset[Trip] surface round-trips the 24-col schema") {
    import graft.model.{Trip, TripSchema}
    val row = org.apache.spark.sql.Row.fromSeq(Seq(
      "HV0003", "B03404", "B03404",
      ts("2024-03-01 11:00:00"), ts("2024-03-01 11:05:00"),
      ts("2024-03-01 11:10:00"), ts("2024-03-01 11:30:00"),
      7L, 9L, 2.5, 1200L, 25.0, 0.0, 0.75, 2.2, 2.75, 0.0, 5.0, 18.0,
      "N", "N", "N", "N", "N"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)), TripSchema.schema)
    import spark.implicits._
    val typed = df.as[Trip]
    val r = DailyTransactions.dayCountTyped(typed, LocalDate.parse("2024-03-01"))
      .head()
    assert(r.getLong(1) == 1L)
  }

  test("dayCount: empty day still yields one row with 0 (reference D3 guard)") {
    val r = DailyTransactions.dayCount(trips, "pickup_datetime",
      LocalDate.parse("2024-03-05")).collect()
    assert(r.length == 1 && r(0).getLong(1) == 0L)
  }

  test("topZones: dense_rank ties keep >N rows and skip no ranks") {
    // zone counts: z1=3, z2=3, z3=2, z4=2, z5=1 → top-2 by dense_rank = 4 rows
    val rows = Seq(
      (ts("2024-03-01 01:00:00"), 1L), (ts("2024-03-01 02:00:00"), 1L), (ts("2024-03-01 03:00:00"), 1L),
      (ts("2024-03-01 01:00:00"), 2L), (ts("2024-03-01 02:00:00"), 2L), (ts("2024-03-01 03:00:00"), 2L),
      (ts("2024-03-01 01:00:00"), 3L), (ts("2024-03-01 02:00:00"), 3L),
      (ts("2024-03-01 01:00:00"), 4L), (ts("2024-03-01 02:00:00"), 4L),
      (ts("2024-03-01 01:00:00"), 5L),
    ).toDF("pickup_datetime", "PULocationID")
    val r = TopZones.topZones(rows, "pickup_datetime", "PULocationID",
      LocalDate.parse("2024-03-02"), 2).collect()
    assert(r.length == 4, "two rank-1 ties + two rank-2 ties")
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 1L, 2L, 2L), "dense ranks, no gaps")
  }

  test("topZones: cutoff is inclusive of the whole cutoff day") {
    val rows = Seq(
      (ts("2024-03-01 12:00:00"), 1L),
      (ts("2024-03-02 23:59:59"), 2L),   // ≤ cutoff 2024-03-02 → kept
      (ts("2024-03-03 00:00:00"), 3L),   // past cutoff → dropped
    ).toDF("pickup_datetime", "PULocationID")
    val r = TopZones.topZones(rows, "pickup_datetime", "PULocationID",
      LocalDate.parse("2024-03-02"), 5)
    assert(r.select("taxi_zone_id").as[Long].collect().toSet == Set(1L, 2L))
  }
}
