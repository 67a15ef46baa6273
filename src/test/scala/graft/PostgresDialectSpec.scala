package graft

import org.apache.spark.sql.types._

import graft.sources.JdbcSink

/** Pins the exact SQL the Postgres dialect generates for the sink paths the
  * reference exercises against live Postgres (`daily_transactions_dag.py:
  * 34-40`, `calculate_top_taxi_zones.py:42-55`) — no network needed: the
  * dialect's text IS the contract. A Spark upgrade that changes these
  * strings changes what lands in the database and must be caught here. */
class PostgresDialectSpec extends SparkSpec {
  private val url = "jdbc:postgresql://db:5432/graft"

  private val dailySchema = StructType(Seq(
    StructField("event_day", DateType, nullable = false),
    StructField("n_events", LongType),
    StructField("calculated_at", TimestampType)))

  private val zonesSchema = StructType(Seq(
    StructField("zone", StringType),
    StructField("n_trips", LongType),
    StructField("rank", IntegerType),
    StructField("score", DoubleType)))

  test("bootstrap DDL matches what DataFrameWriter.jdbc would create") {
    // TIMESTAMP WITH TIME ZONE: Spark 4 maps tz-aware TimestampType to
    // timestamptz (TimestampNTZType would map to plain TIMESTAMP) — the
    // reference's DAG DDL used plain TIMESTAMP, a real dialect divergence
    // this test documents
    assert(JdbcSink.createTableDdl(dailySchema, "daily_transactions", url,
      constraints = "PRIMARY KEY (\"event_day\")") ==
      """CREATE TABLE IF NOT EXISTS daily_transactions ("event_day" DATE NOT NULL, "n_events" BIGINT , "calculated_at" TIMESTAMP WITH TIME ZONE , PRIMARY KEY ("event_day"))""")
    assert(JdbcSink.createTableDdl(zonesSchema, "top_zones", url) ==
      """CREATE TABLE IF NOT EXISTS top_zones ("zone" TEXT , "n_trips" BIGINT , "rank" INTEGER , "score" FLOAT8 )""")
  }

  test("overwrite+truncate issues TRUNCATE TABLE ONLY (keeps inheritance children)") {
    assert(JdbcSink.truncateSql("top_zones", url) ==
      "TRUNCATE TABLE ONLY top_zones")
  }

  test("Derby and Postgres dialects diverge where expected (string type)") {
    // the Derby-backed integration tests cover semantics; this pins why
    // they can't cover the Postgres type surface: TEXT isn't Derby SQL
    val derby = JdbcSink.createTableDdl(zonesSchema, "t", "jdbc:derby:memory:x")
    assert(derby.contains("CLOB") && !derby.contains("TEXT"))
  }
}
