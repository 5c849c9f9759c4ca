package graft.layers

import graft.{Ctx, Macros => M}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** intermediate layer (reference models/intermediate/ directory): dbt `view`
  * models — lazy plans re-derived per consumer, exactly like dbt views.
  *
  * All aggregate ratio/avg outputs follow the parity rules in [[graft.Macros]]:
  * decimal-exact sums, double ratios rounded with the cross-engine-exact
  * Macros.rnd (the reference's round(x, s) semantics).
  */
object Intermediate {
  import M._

  /** Reference models/intermediate/int_customer_lifetime_value.sql — served
    * from the customer rollup (orderless customers: distinct count 0, null
    * sums/dates, exactly the left-join-then-aggregate semantics). */
  def customerLifetimeValue(ctx: Ctx): DataFrame =
    Wh.dimCustomer(ctx)
      .join(Rollups.customerOrders(ctx), Seq("customer_key"), "left")
      .select(
        col("customer_key"), col("customer_name"), col("customer_nation_name"),
        col("customer_region_name"), col("customer_market_segment_name"),
        col("customer_account_balance"),
        coalesce(col("order_count"), lit(0L)).as("lifetime_orders"),
        col("gross_d").cast("double").as("lifetime_revenue"),
        col("net_d").cast("double").as("lifetime_net_revenue"),
        col("first_order_date"), col("last_order_date"),
        datediff(col("last_order_date"), col("first_order_date"))
          .as("customer_tenure_days"),
        rnd(dv(col("gross_d"),
          nullifZero(coalesce(col("order_count"), lit(0L)))), 2)
          .as("avg_order_value"))

  /** Reference models/intermediate/int_customer_orders_summary.sql — served
    * from the customer rollup; per-status distinct order counts are the
    * rollup's conditional row counts (order grain). */
  def customerOrdersSummary(ctx: Ctx): DataFrame =
    Wh.dimCustomer(ctx)
      .join(Rollups.customerOrders(ctx), Seq("customer_key"), "left")
      .select(
        col("customer_key"), col("customer_name"), col("customer_nation_name"),
        col("customer_region_name"), col("customer_market_segment_name"),
        coalesce(col("order_count"), lit(0L)).as("order_count"),
        col("gross_d").cast("double").as("total_revenue"),
        col("net_d").cast("double").as("total_net_revenue"),
        dv(col("gross_d"), col("order_count")).as("avg_order_value"),
        col("first_order_date"), col("last_order_date"),
        coalesce(col("fulfilled_orders"), lit(0L)).as("fulfilled_orders"),
        coalesce(col("open_orders"), lit(0L)).as("open_orders"),
        coalesce(col("partial_orders"), lit(0L)).as("partial_orders"))

  /** Reference models/intermediate/int_discount_impact.sql. */
  def discountImpact(ctx: Ctx): DataFrame =
    Wh.fctOrdersItems(ctx)
      .groupBy("order_key", "order_date", "customer_key")
      .agg(
        count(lit(1)).as("line_item_count"),
        sum("quantity").cast("double").as("total_quantity"),
        sum("gross_item_sales_amount").cast("double").as("revenue_before_discount"),
        sum("discounted_item_sales_amount").cast("double").as("revenue_after_discount"),
        sum("item_discount_amount").cast("double").as("total_discount_amount"),
        sum("net_item_sales_amount").cast("double").as("net_revenue"),
        rnd(dv(abs(sum("item_discount_amount")),
          nullifZero(sum("gross_item_sales_amount"))) * 100, 2)
          .as("effective_discount_pct"),
        avgE(col("discount_percentage")).as("avg_line_discount_pct"),
        sum(when(col("discount_percentage") > 0, 1).otherwise(0))
          .as("discounted_line_items"),
        sum(when(col("discount_percentage") === 0, 1).otherwise(0))
          .as("full_price_line_items"))

  /** Reference models/intermediate/int_market_basket.sql: self-join over
    * de-duped (order, part) pairs with a theta (<) component. The equi-key
    * on order_key keeps it a hash join (quadratic only within an order,
    * bounded by order size — safe at any scale factor). */
  def marketBasket(ctx: Ctx): DataFrame = {
    val op = Wh.fctOrdersItems(ctx).select("order_key", "part_key").distinct()
    // pair generation as basket-explosion instead of the reference's
    // self-join (int_market_basket.sql joins the item relation to itself):
    // one aggregate on order_key + an in-row i<j expansion replaces two
    // exchanges and a join of the same relation. Quadratic only within an
    // order (baskets are bounded by order size); a pair occurs at most
    // once per basket, so count(*) over pairs == the self-join's
    // count(distinct order_key).
    val baskets = op.groupBy("order_key")
      .agg(sort_array(collect_set(col("part_key"))).as("parts"))
    val pairs = baskets
      .select(explode(expr(
        """CASE WHEN size(parts) >= 2
          |  THEN flatten(transform(sequence(0, size(parts) - 2),
          |    i -> transform(sequence(i + 1, size(parts) - 1),
          |      j -> named_struct('part_a', parts[i], 'part_b', parts[j]))))
          |  ELSE array() END""".stripMargin)).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("co_occurrence_count"))
    val totals = op.groupBy("part_key")
      .agg(countDistinct(col("order_key")).as("order_count"))
    pairs
      .join(totals.select(col("part_key").as("part_a"),
        col("order_count").as("part_a_orders")), Seq("part_a"))
      .join(totals.select(col("part_key").as("part_b"),
        col("order_count").as("part_b_orders")), Seq("part_b"))
      .filter(col("co_occurrence_count") >= 5)
      .select(
        col("part_a"), col("part_b"), col("co_occurrence_count"),
        col("part_a_orders"), col("part_b_orders"),
        rnd(dv(col("co_occurrence_count"), nullifZero(col("part_a_orders"))) * 100, 2)
          .as("pct_of_part_a_orders"),
        rnd(dv(col("co_occurrence_count"), nullifZero(col("part_b_orders"))) * 100, 2)
          .as("pct_of_part_b_orders"))
  }

  /** Reference models/intermediate/int_nation_economics.sql. */
  def nationEconomics(ctx: Ctx): DataFrame = {
    val cs = Wh.dimCustomer(ctx)
      .groupBy(col("customer_nation_name").as("nation_name"),
        col("customer_region_name").as("region_name"))
      .agg(
        countDistinct(col("customer_key")).as("customer_count"),
        sum("customer_account_balance").as("total_customer_balance_d"),
        avgE(col("customer_account_balance")).as("avg_customer_balance"))
    val ss = Wh.dimSupplier(ctx)
      .groupBy(col("supplier_nation_name").as("nation_name"))
      .agg(
        countDistinct(col("supplier_key")).as("supplier_count"),
        sum("supplier_account_balance").as("total_supplier_balance_d"),
        avgE(col("supplier_account_balance")).as("avg_supplier_balance_d"))
    val os = Wh.fctOrders(ctx)
      .join(Wh.dimCustomer(ctx).select("customer_key", "customer_nation_name"),
        Seq("customer_key"))
      .groupBy(col("customer_nation_name").as("nation_name"))
      .agg(
        sum("gross_item_sales_amount").as("total_order_revenue_d"),
        sum("net_item_sales_amount").as("total_net_revenue_d"),
        countDistinct(col("order_key")).as("total_orders_d"))
    cs.join(ss, Seq("nation_name"), "left")
      .join(os, Seq("nation_name"), "left")
      .select(
        col("nation_name"), col("region_name"), col("customer_count"),
        coalesce(col("supplier_count"), lit(0L)).as("supplier_count"),
        col("total_customer_balance_d").cast("double").as("total_customer_balance"),
        col("avg_customer_balance"),
        coalesce(col("total_supplier_balance_d").cast("double"), lit(0d))
          .as("total_supplier_balance"),
        coalesce(col("avg_supplier_balance_d"), lit(0d)).as("avg_supplier_balance"),
        coalesce(col("total_order_revenue_d").cast("double"), lit(0d))
          .as("total_order_revenue"),
        coalesce(col("total_net_revenue_d").cast("double"), lit(0d))
          .as("total_net_revenue"),
        coalesce(col("total_orders_d"), lit(0L)).as("total_orders"),
        rnd(dv(coalesce(col("total_order_revenue_d"), lit(0)),
          nullifZero(col("customer_count"))), 2).as("revenue_per_customer"))
  }

  /** Reference models/intermediate/int_regional_trade_flows.sql — a direct
    * projection of the nation-flow rollup (trade_type is functionally
    * dependent on the nation/region keys, so deriving it post-aggregation
    * yields the identical row set). */
  def regionalTradeFlows(ctx: Ctx): DataFrame =
    Rollups.nationFlows(ctx).select(
      col("supplier_nation_name").as("supplier_nation"),
      col("supplier_region_name").as("supplier_region"),
      col("customer_nation_name").as("customer_nation"),
      col("customer_region_name").as("customer_region"),
      col("ship_year"),
      when(col("supplier_nation_name") === col("customer_nation_name"), "domestic")
        .when(col("supplier_region_name") === col("customer_region_name"), "intra_regional")
        .otherwise("inter_regional").as("trade_type"),
      col("shipments").as("total_shipments"),
      col("qty_d").cast("double").as("total_quantity"),
      col("gross_d").cast("double").as("total_revenue"),
      col("net_d").cast("double").as("total_net_revenue"))

  /** Reference models/intermediate/int_part_profitability.sql
    * (testdata: no manufacturer/container columns). */
  def partProfitability(ctx: Ctx): DataFrame =
    Rollups.partMonth(ctx).groupBy("part_key")
      .agg(
        sum("line_count").as("total_line_items"),
        sum("units_d").as("units_t"),
        sum("gross_d").as("gross_t"),
        sum("net_d").as("net_t"),
        sum("cost_d").as("cost_t"),
        sum("disc_sum_d").as("disc_sum_t"),
        sum("disc_cnt").as("disc_cnt_t"))
      .join(Wh.dimPart(ctx).select("part_key", "part_name", "part_type_name",
        "part_brand_name", "part_size", "retail_price"), Seq("part_key"))
      .select(
        col("part_key"), col("part_name"), col("part_type_name"),
        col("part_brand_name"), col("part_size"), col("retail_price"),
        col("total_line_items"),
        col("units_t").cast("double").as("total_quantity_sold"),
        col("gross_t").cast("double").as("total_revenue"),
        col("net_t").cast("double").as("total_net_revenue"),
        col("cost_t").cast("double").as("total_cost"),
        (col("gross_t") - col("cost_t")).cast("double").as("total_profit"),
        rnd(dv(col("gross_t") - col("cost_t"),
          nullifZero(col("gross_t"))) * 100, 2).as("profit_margin_pct"),
        dv(col("disc_sum_t"), col("disc_cnt_t")).as("avg_discount_pct"))

  /** Reference models/intermediate/int_supplier_parts_catalog.sql. */
  def supplierPartsCatalog(ctx: Ctx): DataFrame =
    Wh.dimPartSupplierXrf(ctx).select(
      col("supplier_key"), col("supplier_name"), col("supplier_nation_name"),
      col("supplier_region_name"), col("part_key"), col("part_name"),
      col("part_type_name"), col("part_brand_name"), col("part_size"),
      col("supplier_availabe_quantity"), col("supplier_cost_amount"),
      col("retail_price"),
      (col("retail_price") - col("supplier_cost_amount")).as("unit_margin"),
      rnd(dv(col("retail_price") - col("supplier_cost_amount"),
        nullifZero(col("retail_price"))) * 100, 2).as("margin_pct"),
      (col("supplier_availabe_quantity") * col("supplier_cost_amount"))
        .as("inventory_value"))

  /** Reference models/intermediate/int_shipping_delays.sql. */
  def shippingDelays(ctx: Ctx): DataFrame =
    Wh.fctOrdersItems(ctx)
      .filter(col("receipt_date").isNotNull)
      .join(Wh.dimSupplier(ctx)
        .select("supplier_key", "supplier_name", "supplier_nation_name"),
        Seq("supplier_key"))
      .select(
        col("order_item_key"), col("order_key"), col("order_date"),
        col("ship_date"), col("commit_date"), col("receipt_date"),
        col("ship_mode_name"), col("customer_key"), col("supplier_key"),
        col("supplier_name"), col("supplier_nation_name"), col("part_key"),
        col("quantity"), col("gross_item_sales_amount"),
        datediff(col("receipt_date"), col("commit_date")).as("days_past_commit"),
        datediff(col("receipt_date"), col("ship_date")).as("transit_days"),
        datediff(col("ship_date"), col("order_date")).as("processing_days"),
        when(col("receipt_date") > col("commit_date"), "late")
          .when(col("receipt_date") === col("commit_date"), "on_time")
          .otherwise("early").as("delivery_status"))

  /** Reference models/intermediate/int_supplier_performance.sql — the
    * unfiltered supplier aggregates straight off the supplier rollup. */
  def supplierPerformance(ctx: Ctx): DataFrame =
    Rollups.supplierSales(ctx)
      .join(Wh.dimSupplier(ctx)
        .select("supplier_key", "supplier_name", "supplier_nation_name",
          "supplier_region_name"), Seq("supplier_key"))
      .select(
        col("supplier_key"), col("supplier_name"), col("supplier_nation_name"),
        col("supplier_region_name"),
        col("line_count").as("total_line_items"),
        col("order_count").as("total_orders"),
        col("qty_d").cast("double").as("total_quantity"),
        col("gross_d").cast("double").as("total_revenue"),
        col("net_d").cast("double").as("total_net_revenue"),
        col("late_deliveries"), col("on_time_deliveries"),
        rnd(dv(col("on_time_deliveries"), nullifZero(col("line_count"))) * 100, 2)
          .as("on_time_pct"),
        dv(col("transit_sum"), col("transit_cnt")).as("avg_delivery_days"),
        col("returned_items"),
        rnd(dv(col("returned_items"), nullifZero(col("line_count"))) * 100, 2)
          .as("return_rate_pct"))

  /** Reference models/intermediate/int_order_items_enriched.sql: the wide
    * denormalized line-item view (3 broadcast-friendly dim left joins). */
  def orderItemsEnriched(ctx: Ctx): DataFrame =
    Wh.fctOrdersItems(ctx)
      .join(Wh.dimCustomer(ctx)
        .select("customer_key", "customer_name", "customer_nation_name",
          "customer_region_name", "customer_market_segment_name"),
        Seq("customer_key"), "left")
      .join(Wh.dimSupplier(ctx)
        .select("supplier_key", "supplier_name", "supplier_nation_name",
          "supplier_region_name"), Seq("supplier_key"), "left")
      .join(Wh.dimPart(ctx)
        .select("part_key", "part_name", "part_type_name", "part_brand_name",
          "part_size"), Seq("part_key"), "left")
      .select(
        col("order_item_key"), col("order_key"), col("order_date"),
        col("order_status_code"), col("order_line_number"),
        col("order_line_status_code"), col("return_status_code"),
        col("ship_date"), col("commit_date"), col("receipt_date"),
        col("ship_mode_name"), col("customer_key"), col("customer_name"),
        col("customer_nation_name"), col("customer_region_name"),
        col("customer_market_segment_name"), col("supplier_key"),
        col("supplier_name"), col("supplier_nation_name"),
        col("supplier_region_name"), col("part_key"), col("part_name"),
        col("part_type_name"), col("part_brand_name"), col("part_size"),
        col("quantity"), col("base_price"), col("discount_percentage"),
        col("tax_rate"), col("supplier_cost_amount"),
        col("gross_item_sales_amount"), col("discounted_item_sales_amount"),
        col("item_discount_amount"), col("item_tax_amount"),
        col("net_item_sales_amount"),
        (col("gross_item_sales_amount") - col("supplier_cost_amount") * col("quantity"))
          .as("profit_amount"))

  /** Reference models/intermediate/int_seasonal_demand.sql. */
  def seasonalDemand(ctx: Ctx): DataFrame =
    Wh.fctOrders(ctx)
      .groupBy(
        year(col("order_date")).as("order_year"),
        quarter(col("order_date")).as("order_quarter"),
        month(col("order_date")).as("order_month"))
      .agg(
        countDistinct(col("order_key")).as("order_count"),
        sum("gross_item_sales_amount").cast("double").as("total_revenue"),
        sum("net_item_sales_amount").cast("double").as("total_net_revenue"),
        avgE(col("gross_item_sales_amount")).as("avg_order_value"),
        sum("item_discount_amount").cast("double").as("total_discounts"))
}
