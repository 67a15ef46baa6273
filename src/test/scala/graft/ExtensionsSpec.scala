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
  }
}
