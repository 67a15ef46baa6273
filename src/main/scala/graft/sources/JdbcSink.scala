package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame

/** JDBC sink configuration — injected, never resolved from an orchestrator
  * (the reference couples to Airflow's `BaseHook.get_connection`,
  * `calculate_daily_transactions.py:67`; SURVEY.md §3.3 flags this as the
  * design consequence for us). */
case class JdbcConfig(url: String, user: String = "", password: String = "",
                      driver: String = "") {
  def connProps: java.util.Properties = {
    val p = new java.util.Properties()
    if (user.nonEmpty) p.setProperty("user", user)
    if (password.nonEmpty) p.setProperty("password", password)
    if (driver.nonEmpty) p.setProperty("driver", driver)
    p
  }
}

/** The reference's sink surface (SURVEY.md §2.1 S7/S8/S10).
  *
  * Executors write partitions concurrently over their own connections; at
  * cluster scale bound the fan-in with `df.coalesce(n)` before the write so
  * the database sees n writers, not one per task.
  *
  * Coverage note: the reference classpaths `postgresql-42.7.4.jar` and
  * writes to Postgres (`Dockerfile:14-15`, `daily_transactions_dag.py:80-86`,
  * incl. a `DATE PRIMARY KEY` table). This environment has no network and
  * no Postgres driver jar, so sink semantics (append, overwrite+truncate,
  * DDL bootstrap idempotence) are verified against embedded Derby only;
  * Postgres-specific type mapping (DATE PK, TEXT vs VARCHAR) is untested
  * here and should be smoke-checked once against a real instance when one
  * is reachable — the code path is identical modulo the JDBC dialect.
  */
object JdbcSink {
  /** S7: append (`calculate_daily_transactions.py:65-78`). */
  def append(df: DataFrame, conf: JdbcConfig, table: String): Unit =
    df.write.mode("append").jdbc(conf.url, table, conf.connProps)

  /** S8: overwrite. The reference's plain overwrite drops and recreates the
    * table, clobbering externally-authored DDL
    * (`daily_topfive_taxi_zone_dag.py:34-40` vs
    * `calculate_top_taxi_zones.py:54`); `truncate=true` preserves it —
    * SURVEY.md §7.4 calls for making this policy explicit. */
  def overwriteTruncate(df: DataFrame, conf: JdbcConfig, table: String): Unit =
    df.write.mode("overwrite").option("truncate", "true")
      .jdbc(conf.url, table, conf.connProps)

  /** Dialect-correct `CREATE TABLE IF NOT EXISTS` DDL for a schema — what
    * [[ensureTable]] should execute. Column types come from Spark's own
    * `JdbcDialect` for the url (Postgres: TEXT/BIGINT/DATE/…), so the
    * bootstrap DDL creates exactly the table `DataFrameWriter.jdbc` would —
    * no drift between the sensor-time bootstrap and the write path. Extra
    * table constraints (e.g. the reference's `DATE PRIMARY KEY`,
    * `daily_transactions_dag.py:34-40`) append via `constraints`. */
  def createTableDdl(schema: org.apache.spark.sql.types.StructType,
                     table: String, url: String,
                     constraints: String = ""): String = {
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    val cols = org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
      .schemaString(dialect, schema, caseSensitive = false, None)
    val tail = if (constraints.isEmpty) "" else s", $constraints"
    s"CREATE TABLE IF NOT EXISTS $table ($cols$tail)"
  }

  /** The dialect's TRUNCATE statement — what `overwrite` + `truncate=true`
    * issues under the hood (Postgres: `TRUNCATE TABLE ONLY t`, so child
    * partitions of an inherited table are NOT clobbered). */
  def truncateSql(table: String, url: String): String =
    org.apache.spark.sql.jdbc.JdbcDialects.get(url).getTruncateQuery(table)

  /** S10: idempotent sink DDL bootstrap — plain JDBC, the job-runner
    * equivalent of the DAG's `CREATE TABLE IF NOT EXISTS` step
    * (`daily_transactions_dag.py:34-40,67-73`). */
  def ensureTable(conf: JdbcConfig, ddl: String): Unit = {
    if (conf.driver.nonEmpty) Class.forName(conf.driver)
    val c = DriverManager.getConnection(conf.url, conf.connProps)
    try {
      val st = c.createStatement()
      try st.execute(ddl) finally st.close()
    } finally c.close()
  }

  /** JDBC source, single connection — for dimension-sized tables only. */
  def read(spark: org.apache.spark.sql.SparkSession, conf: JdbcConfig,
           table: String): DataFrame =
    spark.read.jdbc(conf.url, table, conf.connProps)

  /** Partitioned JDBC source: N executors each issue a range-bounded query
    * on `partCol` (`WHERE partCol >= lo AND partCol < hi`), so a large
    * table streams in parallel instead of through one connection — the
    * read-side mirror of the sink's bounded fan-in. Filters pushed on top
    * of this frame reach the database as SQL (JDBCRelation pushdown). */
  def readPartitioned(spark: org.apache.spark.sql.SparkSession,
                      conf: JdbcConfig, table: String, partCol: String,
                      lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(conf.url, table, partCol, lower, upper, numPartitions,
      conf.connProps)
}
