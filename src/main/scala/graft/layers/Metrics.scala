package graft.layers

import graft.{Ctx, Macros => M}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** metrics layer (reference models/metrics/ directory). All ten models
  * aggregate the materialized facts; group keys are low-cardinality
  * (dates/months/nations), so the plans are single-shuffle hash aggregates
  * with partial aggregation map-side — the shape that scales to 100 TB.
  */
object Metrics {
  import M._

  /** Reference models/metrics/metrics_daily_revenue.sql. */
  def dailyRevenue(ctx: Ctx): DataFrame =
    Wh.fctOrders(ctx).groupBy("order_date").agg(
      countDistinct(col("order_key")).as("order_count"),
      sum("gross_item_sales_amount").cast("double").as("gross_revenue"),
      sum("net_item_sales_amount").cast("double").as("net_revenue"),
      sum("item_discount_amount").cast("double").as("total_discounts"),
      sum("item_tax_amount").cast("double").as("total_tax"))

  /** Reference models/metrics/metrics_monthly_orders.sql — served from the
    * customer-month rollup (months partition orders; a customer-month cell
    * is one row, so distinct customers per month is a plain row count and
    * avgE(gross per order) = Σ cell gross / Σ cell orders). */
  def monthlyOrders(ctx: Ctx): DataFrame =
    Rollups.customerMonth(ctx)
      .groupBy("order_month")
      .agg(
        sum("orders_in_month").as("order_count"),
        sum("gross_d").cast("double").as("gross_revenue"),
        sum("net_d").cast("double").as("net_revenue"),
        dv(sum("gross_d"), sum("orders_in_month")).as("avg_order_value"),
        sum("discount_d").cast("double").as("total_discounts"),
        count(lit(1)).as("unique_customers"))

  /** Reference models/metrics/metrics_regional_revenue.sql — customer-month
    * rollup ⋈ dims; a customer has one nation, so per-(month, nation)
    * distinct customers is a row count over the rollup cells. */
  def regionalRevenue(ctx: Ctx): DataFrame =
    Rollups.customerMonth(ctx)
      .join(Wh.dimCustomer(ctx), Seq("customer_key"))
      .groupBy(
        col("order_month"),
        col("customer_region_name").as("region_name"),
        col("customer_nation_name").as("nation_name"))
      .agg(
        sum("orders_in_month").as("order_count"),
        count(lit(1)).as("customer_count"),
        sum("gross_d").cast("double").as("gross_revenue"),
        sum("net_d").cast("double").as("net_revenue"))

  /** Reference models/metrics/metrics_customer_retention.sql: cohort =
    * month of first order; activity joined back per customer-month. */
  def customerRetention(ctx: Ctx): DataFrame = {
    val firstOrder = Rollups.customerOrders(ctx).select(col("customer_key"),
      date_trunc("month", col("first_order_date")).cast(DateType).as("cohort_month"))
    val monthly = Rollups.customerMonth(ctx)
      .select(col("customer_key"), col("order_month"), col("orders_in_month"))
    firstOrder.join(monthly, Seq("customer_key"))
      .groupBy(col("cohort_month"), col("order_month"),
        ((year(col("order_month")) - year(col("cohort_month"))) * 12
          + (month(col("order_month")) - month(col("cohort_month"))))
          .as("months_since_first"))
      .agg(
        countDistinct(col("customer_key")).as("active_customers"),
        sum("orders_in_month").as("total_orders"))
  }

  /** Reference models/metrics/metrics_discount_utilization.sql. */
  def discountUtilization(ctx: Ctx): DataFrame =
    Wh.fctOrdersItems(ctx)
      .groupBy(date_trunc("month", col("ship_date")).cast(DateType).as("ship_month"))
      .agg(
        count(lit(1)).as("total_line_items"),
        sum(when(col("discount_percentage") > 0, 1).otherwise(0)).as("discounted_items"),
        sum(when(col("discount_percentage") === 0, 1).otherwise(0)).as("full_price_items"),
        rnd(dv(sum(when(col("discount_percentage") > 0, 1).otherwise(0)),
          nullifZero(count(lit(1)))) * 100, 2).as("discount_usage_pct"),
        avgE(when(col("discount_percentage") > 0, col("discount_percentage")))
          .as("avg_discount_when_used"),
        sum("gross_item_sales_amount").cast("double").as("gross_revenue"),
        sum(abs(col("item_discount_amount"))).cast("double").as("total_discount_given"),
        rnd(dv(sum(abs(col("item_discount_amount"))),
          nullifZero(sum(col("gross_item_sales_amount")))) * 100, 2)
          .as("discount_as_pct_of_revenue"))

  /** Reference models/metrics/metrics_profit_margin_trend.sql — part-month
    * rollup ⋈ part type, regrouped to (month, type); decimal sums regroup
    * exactly. */
  def profitMarginTrend(ctx: Ctx): DataFrame =
    Rollups.partMonth(ctx)
      .join(Wh.dimPart(ctx).select("part_key", "part_type_name"), Seq("part_key"))
      .groupBy(col("order_month"), col("part_type_name"))
      .agg(
        sum("line_count").as("line_item_count"),
        sum("gross_d").cast("double").as("total_revenue"),
        sum("cost_d").cast("double").as("total_cost"),
        (sum("gross_d") - sum("cost_d")).cast("double").as("total_profit"),
        rnd(dv(sum("gross_d") - sum("cost_d"),
          nullifZero(sum("gross_d"))) * 100, 2).as("profit_margin_pct"))

  /** Reference models/metrics/metrics_inventory_coverage.sql. */
  def inventoryCoverage(ctx: Ctx): DataFrame = {
    val demand = Rollups.partMonth(ctx).groupBy("part_key").agg(
      sum("units_d").as("total_demand_d"),
      sum("order_count").as("order_count_d"))
    val supply = Wh.dimPartSupplierXrf(ctx).groupBy("part_key").agg(
      sum("supplier_availabe_quantity").as("total_supply_d"),
      countDistinct(col("supplier_key")).as("supplier_count_d"),
      avgE(col("supplier_cost_amount")).as("avg_cost"))
    Wh.dimPart(ctx).select("part_key", "part_name", "part_type_name", "part_brand_name")
      .join(supply, Seq("part_key"), "left")
      .join(demand, Seq("part_key"), "left")
      .select(
        col("part_key"), col("part_name"), col("part_type_name"), col("part_brand_name"),
        coalesce(col("total_supply_d"), lit(0L)).as("total_supply"),
        coalesce(col("total_demand_d").cast("double"), lit(0d)).as("total_demand"),
        coalesce(col("supplier_count_d"), lit(0L)).as("supplier_count"),
        coalesce(col("order_count_d"), lit(0L)).as("order_count"),
        col("avg_cost"),
        rnd(dv(coalesce(col("total_supply_d"), lit(0L)),
          nullifZero(coalesce(col("total_demand_d"), lit(0)))), 2)
          .as("supply_demand_ratio"))
  }

  /** Reference models/metrics/metrics_shipping_efficiency.sql. */
  def shippingEfficiency(ctx: Ctx): DataFrame =
    Wh.fctOrdersItems(ctx)
      .filter(col("receipt_date").isNotNull)
      .groupBy(date_trunc("month", col("ship_date")).cast(DateType).as("ship_month"),
        col("ship_mode_name"))
      .agg(
        count(lit(1)).as("shipment_count"),
        avgE(datediff(col("receipt_date"), col("ship_date"))).as("avg_transit_days"),
        avgE(datediff(col("ship_date"), col("order_date"))).as("avg_processing_days"),
        avgE(datediff(col("receipt_date"), col("order_date"))).as("avg_total_days"),
        sum(when(col("receipt_date") > col("commit_date"), 1).otherwise(0)).as("late_count"),
        rnd(dv(sum(when(col("receipt_date") > col("commit_date"), 1).otherwise(0)),
          nullifZero(count(lit(1)))) * 100, 2).as("late_pct"))

  /** Reference models/metrics/metrics_supplier_reliability.sql. */
  def supplierReliability(ctx: Ctx): DataFrame =
    Wh.fctOrdersItems(ctx)
      .filter(col("receipt_date").isNotNull)
      .join(Wh.dimSupplier(ctx)
        .select("supplier_key", "supplier_name", "supplier_nation_name"),
        Seq("supplier_key"))
      .groupBy(date_trunc("month", col("ship_date")).cast(DateType).as("ship_month"),
        col("supplier_key"), col("supplier_name"), col("supplier_nation_name"))
      .agg(
        count(lit(1)).as("total_shipments"),
        sum(when(col("receipt_date") <= col("commit_date"), 1).otherwise(0)).as("on_time_count"),
        sum(when(col("receipt_date") > col("commit_date"), 1).otherwise(0)).as("late_count"),
        rnd(dv(sum(when(col("receipt_date") <= col("commit_date"), 1).otherwise(0)),
          nullifZero(count(lit(1)))) * 100, 2).as("on_time_pct"))

  /** Reference models/metrics/metrics_top_parts_trending.sql: monthly part
    * revenue, rank within month, lag across months, top-50 filter. */
  def topPartsTrending(ctx: Ctx): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = Rollups.partMonth(ctx)
      .join(Wh.dimPart(ctx).select("part_key", "part_name", "part_type_name"), Seq("part_key"))
      .select(
        col("order_month"), col("part_key"), col("part_name"), col("part_type_name"),
        col("units_d").as("total_quantity_d"),
        col("gross_d").as("total_revenue_d"),
        col("order_count"))
    val ranked = monthly
      .withColumn("revenue_rank",
        rank().over(Window.partitionBy("order_month")
          .orderBy(col("total_revenue_d").desc)))
      .withColumn("prev_month_revenue_d",
        lag("total_revenue_d", 1).over(Window.partitionBy("part_key")
          .orderBy("order_month")))
    ranked.filter(col("revenue_rank") <= 50)
      .select(
        col("order_month"), col("part_key"), col("part_name"), col("part_type_name"),
        col("total_quantity_d").cast("double").as("total_quantity"),
        col("total_revenue_d").cast("double").as("total_revenue"),
        col("order_count"), col("revenue_rank"),
        col("prev_month_revenue_d").cast("double").as("prev_month_revenue"),
        rnd(dv(col("total_revenue_d") - coalesce(col("prev_month_revenue_d"), lit(0)),
          nullifZero(coalesce(col("prev_month_revenue_d"), lit(0)))) * 100, 2)
          .as("revenue_growth_pct"))
  }
}
