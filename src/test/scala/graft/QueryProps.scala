package graft

import java.sql.Timestamp
import java.time.LocalDate

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{DailyTransactions, TopZones}

/** Query-level invariants over generated trip-shaped frames (SURVEY.md §5
  * step 3): day-slice counts are additive, dense ranks are gap-free and
  * permutation-invariant. Few trials — each runs Spark jobs. */
object QueryProps extends Properties("queries") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSession.spark

  private val day0 = LocalDate.parse("2024-03-01")
  private val tripGen: Gen[List[(Timestamp, Long)]] = Gen.nonEmptyListOf(for {
    day <- Gen.choose(0, 4)
    hour <- Gen.choose(0, 23)
    zone <- Gen.choose(1L, 6L)
  } yield (Timestamp.valueOf(day0.plusDays(day).atTime(hour, 0)), zone))

  property("sum of per-day counts == total count") = forAll(tripGen) { rows =>
    import spark.implicits._
    val df = rows.toDF("pickup_datetime", "PULocationID")
    val perDay = (0 to 4).map { d =>
      DailyTransactions.dayCount(df, "pickup_datetime", day0.plusDays(d))
        .head().getLong(1)
    }.sum
    perDay == rows.length.toLong
  }

  property("dense ranks are gap-free and input-order-invariant") =
    forAll(tripGen) { rows =>
      import spark.implicits._
      val a = rows.toDF("pickup_datetime", "PULocationID")
      val b = scala.util.Random.shuffle(rows).toDF("pickup_datetime", "PULocationID")
      def ranks(df: org.apache.spark.sql.DataFrame) =
        TopZones.topZones(df, "pickup_datetime", "PULocationID", day0.plusDays(5), 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ra = ranks(a)
      val rankVals = ra.map(_._3)
      ranks(b) == ra && rankVals == (1L to rankVals.max).toSet
    }
}
