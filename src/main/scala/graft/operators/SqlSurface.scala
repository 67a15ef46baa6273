package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The `spark.sql(...)` entry point of the engine: users who speak SQL run
  * the identical text Spark executes — each query string here doubles as
  * its own DuckDB oracle (shared ANSI subset: no backticks, no QUALIFY,
  * explicit casts). Catalyst treats the parsed plan exactly like the
  * DataFrame-built ones — same pushdown, pruning, and codegen — which the
  * plan audit asserts, so the SQL surface inherits every scale property of
  * the column-algebra surface for free.
  */
object SqlSurface {
  type Q = (SparkSession, String) => DataFrame

  /** Register the corpus tables as temp views, then run the shared text. */
  private def runSql(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.load(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql(sql)
  }

  private val aggSql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  private val windowSql =
    """SELECT lang, doc_id, rn FROM (
      |  SELECT lang, doc_id,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn
      |  FROM documents) t
      |WHERE rn <= 3 ORDER BY lang, rn""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_sql_agg" -> ((s, dir) => runSql(s, dir, aggSql)),
    "q_sql_window" -> ((s, dir) => runSql(s, dir, windowSql)),
  )

  // the oracle IS the executed text — byte-identical on both engines
  val oracle: Map[String, String] = Map(
    "q_sql_agg" -> aggSql,
    "q_sql_window" -> windowSql,
  )
}
