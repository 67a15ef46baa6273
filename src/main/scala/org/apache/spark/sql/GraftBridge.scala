package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 split Column
  * from catalyst Expression for Connect; a classic-session library that
  * defines custom catalyst expressions needs exactly these two hops.
  */
object GraftBridge {
  def toCol(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (classic sessions only). */
  def analyzedPlan(df: Dataset[Row]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Materialize the rules/strategies an extensions hook registered
    * (testing aid — `buildOptimizerRules`/`buildPlannerStrategies` are
    * private[sql]). */
  def builtOptimizerRules(ext: SparkSessionExtensions, spark: SparkSession) =
    ext.buildOptimizerRules(spark)
  def builtPlannerStrategies(ext: SparkSessionExtensions, spark: SparkSession) =
    ext.buildPlannerStrategies(spark)

  /** Function names an extensions hook would register (testing aid). */
  def builtFunctionNames(ext: SparkSessionExtensions): Seq[String] = {
    val reg = new catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }

  /** Register a session-scoped SQL function backed by a catalyst
    * expression builder (`sessionState.functionRegistry` is private[sql];
    * this is the supported path for a library registering functions on an
    * already-built classic session — config-based wiring goes through
    * `SparkSessionExtensions.injectFunction` instead). Idempotent. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
