package graft

import org.apache.spark.sql.{GraftBridge, SparkSessionExtensions}

import graft.plans.{GraftExtensions, RewriteToDatePredicates, TopKPerKeyStrategy}

/** The SparkSessionExtensions hook must register both the optimizer rule
  * and the planner strategy (a user wiring `spark.sql.extensions=
  * graft.plans.GraftExtensions` gets the full engine). */
class ExtensionsSpec extends SparkSpec {
  test("GraftExtensions registers rule and strategy") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = GraftBridge.builtOptimizerRules(ext, spark)
    val strategies = GraftBridge.builtPlannerStrategies(ext, spark)
    assert(rules.contains(RewriteToDatePredicates), rules.toString)
    assert(strategies.contains(TopKPerKeyStrategy), strategies.toString)
    // config-based wiring registers every graft_* SQL function too
    val fns = GraftBridge.builtFunctionNames(ext)
    graft.functions.SqlFunctions.builders.foreach { case (name, _) =>
      assert(fns.contains(name), s"$name missing from extension registry")
    }
  }

  test("SQL-registered graft_* functions match the column API") {
    import org.apache.spark.sql.functions._
    import graft.functions.{Sketches, SqlFunctions}
    SqlFunctions.register(spark)
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_simhash64(split(lower(text), ' ')) AS sh,
        |  graft_shingle_minhashes(split(text, ' '), 3, 64) AS mh,
        |  graft_winnow64(text, 5, 8) AS wf
        |FROM ext_docs""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Long](2), r.getLong(3)))).toMap
    val viaCol = docs.select(col("doc_id"),
        Sketches.simhash64(split(lower(col("text")), " ")).as("sh"),
        Sketches.shingleMinhashes(split(col("text"), " "), 3, 64).as("mh"),
        Sketches.winnow64(col("text"), 5, 8).as("wf"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Long](2), r.getLong(3)))).toMap
    assert(viaSql == viaCol)
    // shape params must be literals — a column there is a loud error
    val err = intercept[Exception] {
      spark.sql("SELECT graft_winnow64(text, CAST(doc_id AS INT), 8) FROM ext_docs")
        .collect()
    }
    assert(err.getMessage.contains("INTEGER literal"), err.getMessage)
  }
}
