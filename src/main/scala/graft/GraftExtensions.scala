package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions=graft.GraftExtensions` — config-time injection of
  * the library's planner extensions (the as-of join strategy). Sessions
  * built without the config get the same strategy lazily through
  * [[graft.plans.AsOf.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => plans.PushFilterThroughAsOf)
    ext.injectOptimizerRule(_ => plans.RewriteRangeJoin)
    ()
  }
}
