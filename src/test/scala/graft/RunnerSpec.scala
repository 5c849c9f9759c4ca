package graft

import org.apache.spark.sql.functions.col

/** The dbt-build lifecycle twin end to end: topological materialization with
  * per-run housekeeping constants and the schema-test gate. */
class RunnerSpec extends SparkSpec {

  test("buildAll materializes all table-layer models with housekeeping") {
    val out = java.nio.file.Files.createTempDirectory("graft-build").toString
    val results = Runner.buildAll(ctx, out)
    assert(results.forall(_.rows > 0), "every materialized table has rows")
    assert(results.exists(_.table == "orders_items"))
    assert(results.exists(_.table == "supplier_scorecard"))
    // wh-layer tables carry the audit columns with ONE constant per run
    val fo = spark.read.parquet(s"$out/fct_orders")
    assert(fo.columns.contains("dbt_batch_id") && fo.columns.contains("dbt_batch_ts"))
    assert(fo.select("dbt_batch_id").distinct().count() == 1)
    val dc = spark.read.parquet(s"$out/dim_customer")
    assert(fo.select("dbt_batch_id").head().getString(0)
      == dc.select("dbt_batch_id").head().getString(0),
      "housekeeping constants are per-invocation, shared across models")
    // ods layer has no audit columns (dbt_project.yml: housekeeping is wh-only)
    assert(!spark.read.parquet(s"$out/orders_items").columns.contains("dbt_batch_id"))
  }
}
