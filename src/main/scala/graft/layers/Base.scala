package graft.layers

import graft.{Ctx, Macros => M}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** The 8 ephemeral rename-projections (reference models/base/ (all 8 files)).
  *
  * Like dbt ephemerals (dbt_project.yml:29-30) these are never materialized —
  * Catalyst's CollapseProject fuses them into downstream plans, so the parquet
  * scan only reads the columns a consumer actually uses.
  *
  * Testdata divergence (SURVEY §1): comment/address/phone/clerk/shippriority/
  * commit/receipt/shipinstruct/shipmode columns don't exist in the driver
  * parquet and are omitted. Dates arrive as timestamps -> cast to DateType;
  * money columns arrive as doubles -> cast to DECIMAL(16,4) (the money()
  * contract, macros/dt_convert_money.sql:1-3). Quantity is also taken to
  * decimal so every SUM in the tree is exact and order-insensitive.
  */
object Base {
  import M.money

  def lineItem(ctx: Ctx): DataFrame =
    ctx.tbl("lineitem").select(
      col("l_orderkey").as("order_key"),
      col("l_partkey").as("part_key"),
      col("l_suppkey").as("supplier_key"),
      col("l_linenumber").as("order_line_number"),
      money(col("l_quantity")).as("quantity"),
      money(col("l_extendedprice")).as("extended_price"),
      money(col("l_discount")).as("discount_percentage"),
      money(col("l_tax")).as("tax_rate"),
      col("l_returnflag").as("return_status_code"),
      col("l_linestatus").as("order_line_status_code"),
      col("l_shipdate").cast(DateType).as("ship_date"),
      // commit/receipt dates and ship mode don't exist in the driver
      // testdata (SURVEY §1); synthesized deterministically from keys so the
      // reference's delivery-performance models stay expressible. Exact
      // textual twins in Oracle.CTES base_line_item.
      date_add(col("l_shipdate").cast(DateType),
        ((col("l_orderkey") * 7 + col("l_linenumber") * 3) % 61 - 30).cast("int"))
        .as("commit_date"),
      date_add(col("l_shipdate").cast(DateType),
        (lit(1) + (col("l_orderkey") * 11 + col("l_partkey") * 5) % 30).cast("int"))
        .as("receipt_date"),
      element_at(
        array(lit("AIR"), lit("FOB"), lit("MAIL"), lit("RAIL"),
          lit("REG AIR"), lit("SHIP"), lit("TRUCK")),
        ((col("l_orderkey") + col("l_linenumber")) % 7 + 1).cast("int"))
        .as("ship_mode_name"))

  def orders(ctx: Ctx): DataFrame =
    ctx.tbl("orders").select(
      col("o_orderkey").as("order_key"),
      col("o_custkey").as("customer_key"),
      col("o_orderstatus").as("order_status_code"),
      money(col("o_totalprice")).as("order_amount"),
      col("o_orderdate").cast(DateType).as("order_date"),
      col("o_orderpriority").as("order_priority_code"))

  def customer(ctx: Ctx): DataFrame =
    ctx.tbl("customer").select(
      col("c_custkey").as("customer_key"),
      col("c_name").as("customer_name"),
      col("c_nationkey").as("nation_key"),
      money(col("c_acctbal")).as("customer_account_balance"),
      col("c_mktsegment").as("customer_market_segment_name"))

  def supplier(ctx: Ctx): DataFrame =
    ctx.tbl("supplier").select(
      col("s_suppkey").as("supplier_key"),
      col("s_name").as("supplier_name"),
      col("s_nationkey").as("nation_key"),
      money(col("s_acctbal")).as("supplier_account_balance"))

  def part(ctx: Ctx): DataFrame =
    ctx.tbl("part").select(
      col("p_partkey").as("part_key"),
      col("p_name").as("part_name"),
      col("p_brand").as("part_brand_name"),
      col("p_type").as("part_type_name"),
      col("p_size").as("part_size"),
      money(col("p_retailprice")).as("retail_price"))

  def nation(ctx: Ctx): DataFrame =
    ctx.tbl("nation").select(
      col("n_nationkey").as("nation_key"),
      col("n_name").as("nation_name"),
      col("n_regionkey").as("region_key"))

  def region(ctx: Ctx): DataFrame =
    ctx.tbl("region").select(
      col("r_regionkey").as("region_key"),
      col("r_name").as("region_name"))

  /** Synthesized partsupp (testdata has no partsupp table — SURVEY §1/§7
    * option b): deterministic pseudo-attributes over the distinct
    * (part, supplier) pairs observed in lineitem. Exact textual twin in
    * Oracle.CTES `base_part_supplier`. Mirrors reference
    * models/base/base_part_supplier.sql's column surface. */
  def partSupplier(ctx: Ctx): DataFrame = {
    val pairs = ctx.tbl("lineitem")
      .select(col("l_partkey").as("part_key"), col("l_suppkey").as("supplier_key"))
      .distinct()
    pairs.join(part(ctx).select("part_key", "retail_price"), Seq("part_key"))
      .select(
        col("part_key"),
        col("supplier_key"),
        ((col("part_key") * 11 + col("supplier_key") * 17) % 9973 + 10).cast("int")
          .as("supplier_availabe_quantity"),
        // pure-decimal (division-free) so both engines compute it exactly
        M.moneyR((col("retail_price")
          * (lit(50) + (col("part_key") * 7 + col("supplier_key") * 3) % 41))
          * lit(new java.math.BigDecimal("0.01"))).as("supplier_cost_amount"))
  }
}
