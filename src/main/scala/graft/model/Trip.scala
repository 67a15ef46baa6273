package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Canonical NYC HVFHV trip schema — the reference's only input table.
  *
  * 24 columns, all nullable, hand-declared in the reference at
  * `dags/spark_jobs/calculate_daily_transactions.py:19-46` and re-derived
  * per-file at `calculate_top_taxi_zones.py:21-27` to tolerate schema drift
  * across monthly files (SURVEY.md §1.3).
  */
object TripSchema {
  val schema: StructType = StructType(Seq(
    StructField("hvfhs_license_num", StringType),
    StructField("dispatching_base_num", StringType),
    StructField("originating_base_num", StringType),
    StructField("request_datetime", TimestampType),
    StructField("on_scene_datetime", TimestampType),
    StructField("pickup_datetime", TimestampType),
    StructField("dropoff_datetime", TimestampType),
    StructField("PULocationID", LongType),
    StructField("DOLocationID", LongType),
    StructField("trip_miles", DoubleType),
    StructField("trip_time", LongType),
    StructField("base_passenger_fare", DoubleType),
    StructField("tolls", DoubleType),
    StructField("bcf", DoubleType),
    StructField("sales_tax", DoubleType),
    StructField("congestion_surcharge", DoubleType),
    StructField("airport_fee", DoubleType),
    StructField("tips", DoubleType),
    StructField("driver_pay", DoubleType),
    StructField("shared_request_flag", StringType),
    StructField("shared_match_flag", StringType),
    StructField("access_a_ride_flag", StringType),
    StructField("wav_request_flag", StringType),
    StructField("wav_match_flag", StringType),
  ))
}

/** Typed view of the same schema for the `Dataset[Trip]` surface. */
case class Trip(
    hvfhs_license_num: Option[String],
    dispatching_base_num: Option[String],
    originating_base_num: Option[String],
    request_datetime: Option[Timestamp],
    on_scene_datetime: Option[Timestamp],
    pickup_datetime: Option[Timestamp],
    dropoff_datetime: Option[Timestamp],
    PULocationID: Option[Long],
    DOLocationID: Option[Long],
    trip_miles: Option[Double],
    trip_time: Option[Long],
    base_passenger_fare: Option[Double],
    tolls: Option[Double],
    bcf: Option[Double],
    sales_tax: Option[Double],
    congestion_surcharge: Option[Double],
    airport_fee: Option[Double],
    tips: Option[Double],
    driver_pay: Option[Double],
    shared_request_flag: Option[String],
    shared_match_flag: Option[String],
    access_a_ride_flag: Option[String],
    wav_request_flag: Option[String],
    wav_match_flag: Option[String],
)
