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

  // custom catalyst expressions called FROM SQL via the registered
  // graft_* functions ([[graft.functions.SqlFunctions]]). The oracle can't
  // share this text (the functions are ours), so it re-expresses both:
  // ln is bit-identical libm on both engines (PortableLn exists for
  // exactly that), and the 8-bit Morton interleave expands to exact
  // integer arithmetic.
  private val fnSql =
    """SELECT doc_id,
      |  graft_ln(CAST(n_chars AS DOUBLE)) AS ln_chars,
      |  graft_bit_interleave(CAST(doc_id % 256 AS INT),
      |                       CAST(n_chars % 256 AS INT), 8) AS z
      |FROM documents ORDER BY doc_id""".stripMargin

  private val fnOracleSql = {
    val interleave = (0 until 8).map { k =>
      s"(((doc_id % 256) >> $k) & 1) * ${1L << (2 * k + 1)} + " +
        s"(((n_chars % 256) >> $k) & 1) * ${1L << (2 * k)}"
    }.mkString(" + ")
    s"""SELECT doc_id, ln(CAST(n_chars AS DOUBLE)) AS ln_chars,
       |  CAST($interleave AS BIGINT) AS z
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_sql_agg" -> ((s, dir) => runSql(s, dir, aggSql)),
    "q_sql_window" -> ((s, dir) => runSql(s, dir, windowSql)),
    "q_sql_fn" -> ((s, dir) => {
      graft.functions.SqlFunctions.register(s)
      runSql(s, dir, fnSql)
    }),
  )

  // the oracle IS the executed text — byte-identical on both engines
  // (except q_sql_fn, re-expressed above)
  val oracle: Map[String, String] = Map(
    "q_sql_agg" -> aggSql,
    "q_sql_window" -> windowSql,
    "q_sql_fn" -> fnOracleSql,
  )
}
