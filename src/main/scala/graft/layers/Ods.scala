package graft.layers

import graft.{Ctx, Store, Macros => M}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ods layer (reference models/ods/ layer, dbt `table` materialization).
  *
  * orders_items and parts_suppliers are the hot mid-DAG nodes ~40 downstream
  * models reuse — they go through [[Store]] (the dbt-table materialization
  * boundary). The pure projections (customers/orders/...) stay lazy: Catalyst
  * collapses them and prunes columns at the scan.
  */
object Ods {
  import M._

  def customers(ctx: Ctx): DataFrame = Base.customer(ctx)
  def nations(ctx: Ctx): DataFrame = Base.nation(ctx)
  def regions(ctx: Ctx): DataFrame = Base.region(ctx)
  def parts(ctx: Ctx): DataFrame = Base.part(ctx)
  def suppliers(ctx: Ctx): DataFrame = Base.supplier(ctx)

  def orders(ctx: Ctx): DataFrame =
    Base.orders(ctx).select(
      "order_key", "order_date", "customer_key", "order_status_code",
      "order_priority_code", "order_amount")

  /** Reference models/ods/orders_items.sql — the price-decomposition fact.
    * Stage 1 computes money-rounded base/discount amounts; stage 2 derives
    * tax and net from the *rounded* stage-1 columns, exactly as the
    * reference's CTE structure does (orders_items.sql:43-82). */
  def ordersItems(ctx: Ctx): DataFrame = Store.table(ctx, "orders_items") {
    val o = Base.orders(ctx)
      .select("order_key", "order_date", "customer_key", "order_status_code")
    // The projection below is the most compute-dense in the library (md5
    // surrogate over 7 rendered columns + exact scaled-integer money math
    // per row), and with a broadcast orders side NOTHING shuffles — its
    // parallelism would be the parquet scan's row-group count (3 at sf0.1:
    // 600k heavy rows on 3 tasks). One keyed repartition on the fact's
    // natural key spreads the compute across the cluster AND leaves the
    // persisted table hash-partitioned on order_key for downstream
    // joins/aggregations — the bucketed-table layout a warehouse would
    // choose for this fact anyway.
    val l = Base.lineItem(ctx).repartition(col("order_key"))
    val stage1 = o.join(l, Seq("order_key"))
      .select(
        // Reference keys on (order_key, order_line_number)
        // (models/ods/orders_items.sql:19) — valid under TPC-H's PK. The
        // driver testdata duplicates (order_key, line_number) pairs and even
        // (…, part_key, supplier_key) quadruples, so the surrogate covers
        // the measures too (decimal/date -> string rendering is identical in
        // both engines at these types).
        surrogateKey(col("order_key"), col("order_line_number"),
          col("part_key"), col("supplier_key"), col("quantity"),
          col("extended_price"), col("ship_date")).as("order_item_key"),
        col("order_key"), col("order_date"), col("customer_key"), col("order_status_code"),
        col("part_key"), col("supplier_key"), col("return_status_code"),
        col("order_line_number"), col("order_line_status_code"), col("ship_date"),
        col("commit_date"), col("receipt_date"), col("ship_mode_name"),
        col("quantity"), col("discount_percentage"), col("tax_rate"), col("extended_price"),
        moneyDiv("extended_price", "quantity").as("base_price"),
        moneyR(col("extended_price") * (lit(1) - col("discount_percentage")))
          .as("discounted_item_sales_amount"),
        moneyR(lit(-1) * col("extended_price") * col("discount_percentage"))
          .as("item_discount_amount"))
    stage1.select(
      col("order_item_key"), col("order_key"), col("order_date"), col("customer_key"),
      col("order_status_code"), col("part_key"), col("supplier_key"),
      col("return_status_code"), col("order_line_number"), col("order_line_status_code"),
      col("ship_date"), col("commit_date"), col("receipt_date"), col("ship_mode_name"),
      col("quantity"), col("base_price"), col("discount_percentage"),
      moneyR(col("base_price") * (lit(1) - col("discount_percentage"))).as("discounted_price"),
      col("extended_price").as("gross_item_sales_amount"),
      col("discounted_item_sales_amount"),
      col("item_discount_amount"),
      col("tax_rate"),
      moneyR((col("extended_price") + col("item_discount_amount")) * col("tax_rate"))
        .as("item_tax_amount"),
      moneyR(col("extended_price") + col("item_discount_amount")
        + (col("extended_price") + col("item_discount_amount")) * col("tax_rate"))
        .as("net_item_sales_amount"))
  }

  /** Reference models/ods/parts_suppliers.sql (part ⋈ partsupp ⋈ supplier).
    * partsupp is synthesized — see Base.partSupplier. part/supplier are small
    * relative to the pair table at every scale -> broadcast-friendly, but we
    * let AQE pick; at 100 TB partsupp is the big side and shuffles on its
    * composite key. */
  def partsSuppliers(ctx: Ctx): DataFrame = Store.table(ctx, "parts_suppliers") {
    val p = Base.part(ctx)
    val s = Base.supplier(ctx)
    val ps = Base.partSupplier(ctx)
    p.join(ps, Seq("part_key"))
      .join(s, Seq("supplier_key"))
      .select(
        surrogateKey(col("part_key"), col("supplier_key")).as("part_supplier_key"),
        col("part_key"), col("part_name"), col("part_brand_name"), col("part_type_name"),
        col("part_size"), col("retail_price"),
        col("supplier_key"), col("supplier_name"), col("nation_key"),
        col("supplier_availabe_quantity"), col("supplier_cost_amount"))
  }
}
