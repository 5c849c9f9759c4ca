package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one blessed crossing from graft's packages into Spark's
  * `private[sql]` plan constructor: wrap a custom [[LogicalPlan]] as a
  * DataFrame so it flows through the normal analyzer/optimizer/planner.
  * The standard bridge idiom of out-of-tree Spark plan libraries — no
  * Spark internals are modified, only the constructor is re-exported.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
