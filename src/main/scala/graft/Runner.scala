package graft

import graft.layers._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The `dbt build` lifecycle twin (SURVEY §3): materializes every
  * table-layer model in topological order with per-run housekeeping
  * constants, then runs the schema-test gate.
  *
  * dbt semantics reproduced:
  *  - ephemeral base models are never materialized (they're plain defs);
  *  - `table` models are written (parquet here; bucketed via Lake at
  *    cluster scale) in dependency order;
  *  - wh-layer models carry dbt_batch_id/dbt_batch_ts audit columns with
  *    constants fixed once per invocation (macros/dbt_housekeeping.sql:1-4);
  *  - schema tests (unique/not_null/relationships) gate the build: a
  *    failure aborts before downstream layers, like `dbt build`.
  */
object Runner {

  final case class BuildResult(table: String, rows: Long, path: String,
      seconds: Double = 0.0)

  /** Full dbt-build twin. `threads` mirrors the reference's `dbt build`
    * concurrency (profiles threads: 8): models WITHIN a phase have no
    * dependencies on each other, so each phase materializes its models as
    * concurrent Spark actions — the scheduler interleaves their stages and
    * keeps all cores busy even while one model sits in a narrow stage.
    * Dependencies ACROSS phases (ods -> wh -> gate -> reports) stay strictly
    * ordered, exactly like dbt's DAG-ordered, intra-level-parallel run. */
  def buildAll(ctx: Ctx, outDir: String, threads: Int = 8): Seq[BuildResult] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val runId = java.util.UUID.randomUUID().toString
    val runTs = new java.sql.Timestamp(System.currentTimeMillis())
    val hk = Macros.housekeeping(runId, runTs)

    def write(name: String, df: DataFrame, housekeeping: Boolean): BuildResult = {
      val t0 = System.nanoTime()
      val out = if (housekeeping) df.select(col("*") +: hk: _*) else df
      val path = s"$outDir/$name"
      out.write.mode("overwrite").parquet(path)
      BuildResult(name, ctx.spark.read.parquet(path).count(), path,
        (System.nanoTime() - t0) / 1e9)
    }

    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    def phase(models: Seq[(String, DataFrame)], housekeeping: Boolean): Seq[BuildResult] =
      Await.result(
        Future.sequence(models.map { case (n, df) =>
          Future(write(n, df, housekeeping))
        }),
        Duration.Inf)

    try {
      // ods layer (dbt `table`, no housekeeping — dbt_project.yml:31-32)
      val ods = phase(Seq(
        "customers" -> Ods.customers(ctx), "nations" -> Ods.nations(ctx),
        "regions" -> Ods.regions(ctx), "parts" -> Ods.parts(ctx),
        "suppliers" -> Ods.suppliers(ctx), "orders" -> Ods.orders(ctx),
        "orders_items" -> Ods.ordersItems(ctx),
        "parts_suppliers" -> Ods.partsSuppliers(ctx)), housekeeping = false)

      // wh layer (dbt `table` with housekeeping — dbt_project.yml:33-34)
      val wh = phase(Seq(
        "dim_customer" -> Wh.dimCustomer(ctx),
        "dim_supplier" -> Wh.dimSupplier(ctx),
        "dim_part" -> Wh.dimPart(ctx),
        "dim_part_supplier_xrf" -> Wh.dimPartSupplierXrf(ctx),
        "fct_orders" -> Wh.fctOrders(ctx),
        "fct_orders_items" -> Wh.fctOrdersItems(ctx),
        "rpt_pricing_summary" -> Wh.rptPricingSummary(ctx),
        "rpt_minimum_cost_suppliers" -> Wh.rptMinimumCostSuppliers(ctx)),
        housekeeping = true)

      // schema-test gate (reference fct_orders.yml / fct_orders_items.yml):
      // violations abort the build before the reporting layers
      schemaGate(ctx)

      // shared rollup boundary (layers.Rollups — the dbt table-layer reuse
      // twin): materialize each fact-grain rollup once, concurrently, so
      // the report fan-out below aggregates grain-reduced relations instead
      // of ~20 independent fact scans. Not written: an internal Store
      // boundary (a bucketed-parquet write at cluster scale).
      Await.result(
        Future.sequence(Rollups.all(ctx).map { case (_, df) =>
          Future { df.count(); () }
        }),
        Duration.Inf)

      // metrics + reports layers (dbt `table`, no housekeeping); intermediate
      // models stay views (dbt_project.yml:35-36) and extension operators are
      // not dbt models — selected via the Registry materialization tag
      val reports = phase(
        Registry.all.iterator
          .collect { case (n, en) if en.mat == Registry.Mat.Table =>
            n -> en.fn(ctx)
          }.toSeq,
        housekeeping = false)

      ods ++ wh ++ reports
    } finally { pool.shutdown() }
  }

  /** unique / not_null / relationships checks; throws on violation. */
  def schemaGate(ctx: Ctx): Unit = {
    val fo = Wh.fctOrders(ctx)
    require(fo.count() == fo.select("order_key").distinct().count(),
      "fct_orders.order_key not unique")
    val foi = Wh.fctOrdersItems(ctx)
    require(foi.count() == foi.select("order_item_key").distinct().count(),
      "fct_orders_items.order_item_key not unique")
    val orphans = foi.select("customer_key")
      .join(Wh.dimCustomer(ctx).select("customer_key"), Seq("customer_key"), "left_anti")
      .count()
    require(orphans == 0, s"fct_orders_items has $orphans orphan customer keys")
  }
}
