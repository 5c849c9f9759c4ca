package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All model plans live in graft.layers (Spark-first re-expressions of the
  * reference's 62 dbt models); Registry pairs each with its DuckDB oracle.
  */
object SparkEntry {
  /** Flagship: TPC-H Q1 pricing summary (reference
    * models/wh/rpt_pricing_summary.sql) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    layers.Wh.rptPricingSummary(Ctx(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  def oracleSql: Map[String, String] = Registry.oracleSql
}
