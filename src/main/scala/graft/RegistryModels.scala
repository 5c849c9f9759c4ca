package graft

import graft.layers._
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import OracleModel.{Entry, e, T, F, oiCols, foiCols}

/** ods/wh-layer oracle entries (tables the reference's dbt_project.yml
  * materializes first) — split from the monolithic Registry.scala for
  * maintainability only (r11 verdict item 8): same keys, same builders,
  * same oracle SQL; Registry.all concatenates the per-layer objects. */
private[graft] object RegistryModels {
  import Oracle.{avgE, d, dump, dv, q, rnd, rndDec, stddevE, sumD}
  import Macros.outD

  val models: ListMap[String, Entry] = ListMap(
    // ---- ods layer ---------------------------------------------------
    "ods_customers" -> e(
      ctx => outD(Ods.customers(ctx)).orderBy("customer_key"),
      dump("base_customer", Seq("customer_key" -> F, "customer_name" -> F,
        "nation_key" -> F, "customer_account_balance" -> T,
        "customer_market_segment_name" -> F), "customer_key")),
    "ods_nations" -> e(
      ctx => Ods.nations(ctx).orderBy("nation_key"),
      "SELECT * FROM base_nation ORDER BY nation_key"),
    "ods_regions" -> e(
      ctx => Ods.regions(ctx).orderBy("region_key"),
      "SELECT * FROM base_region ORDER BY region_key"),
    "ods_parts" -> e(
      ctx => outD(Ods.parts(ctx)).orderBy("part_key"),
      dump("base_part", Seq("part_key" -> F, "part_name" -> F,
        "part_brand_name" -> F, "part_type_name" -> F, "part_size" -> F,
        "retail_price" -> T), "part_key")),
    "ods_suppliers" -> e(
      ctx => outD(Ods.suppliers(ctx)).orderBy("supplier_key"),
      dump("base_supplier", Seq("supplier_key" -> F, "supplier_name" -> F,
        "nation_key" -> F, "supplier_account_balance" -> T), "supplier_key")),
    "ods_orders" -> e(
      ctx => outD(Ods.orders(ctx)).orderBy("order_key"),
      dump("base_orders", Seq("order_key" -> F, "order_date" -> F,
        "customer_key" -> F, "order_status_code" -> F,
        "order_priority_code" -> F, "order_amount" -> T), "order_key")),
    "ods_orders_items" -> e(
      ctx => outD(Ods.ordersItems(ctx)).orderBy("order_item_key"),
      dump("o_oi", oiCols, "order_item_key")),
    "ods_parts_suppliers" -> e(
      ctx => outD(Ods.partsSuppliers(ctx)).orderBy("part_supplier_key"),
      dump("o_ps", Seq("part_supplier_key" -> F, "part_key" -> F,
        "part_name" -> F, "part_brand_name" -> F, "part_type_name" -> F,
        "part_size" -> F, "retail_price" -> T, "supplier_key" -> F,
        "supplier_name" -> F, "nation_key" -> F,
        "supplier_availabe_quantity" -> F, "supplier_cost_amount" -> T),
        "part_supplier_key")),

    // ---- wh layer ----------------------------------------------------
    "dim_customer" -> e(
      ctx => outD(Wh.dimCustomer(ctx)).orderBy("customer_key"),
      dump("w_dim_customer", Seq("customer_key" -> F, "customer_name" -> F,
        "customer_nation_key" -> F, "customer_nation_name" -> F,
        "customer_region_key" -> F, "customer_region_name" -> F,
        "customer_account_balance" -> T, "customer_market_segment_name" -> F),
        "customer_key")),
    "dim_supplier" -> e(
      ctx => outD(Wh.dimSupplier(ctx)).orderBy("supplier_key"),
      dump("w_dim_supplier", Seq("supplier_key" -> F, "supplier_name" -> F,
        "supplier_nation_key" -> F, "supplier_nation_name" -> F,
        "supplier_region_key" -> F, "supplier_region_name" -> F,
        "supplier_account_balance" -> T), "supplier_key")),
    "dim_part" -> e(
      ctx => outD(Wh.dimPart(ctx)).orderBy("part_key"),
      dump("w_dim_part", Seq("part_key" -> F, "part_name" -> F,
        "part_brand_name" -> F, "part_type_name" -> F, "part_size" -> F,
        "retail_price" -> T), "part_key")),
    "fct_orders" -> e(
      ctx => outD(Wh.fctOrders(ctx)).orderBy("order_key"),
      dump("w_fct_orders", Seq("order_key" -> F, "order_date" -> F,
        "customer_key" -> F, "order_status_code" -> F,
        "order_priority_code" -> F, "order_count" -> F,
        "gross_item_sales_amount" -> T, "item_discount_amount" -> T,
        "item_tax_amount" -> T, "net_item_sales_amount" -> T), "order_key")),
    "fct_orders_items" -> e(
      ctx => outD(Wh.fctOrdersItems(ctx)).orderBy("order_item_key"),
      dump("w_fct_orders_items", foiCols, "order_item_key")),
    "rpt_pricing_summary" -> e(
      ctx => outD(Wh.rptPricingSummary(ctx))
        .orderBy("return_status_code", "order_line_status_code"),
      s"""SELECT f.return_status_code, f.order_line_status_code,
         |  ${sumD("f.quantity")} AS quantity,
         |  ${sumD("f.gross_item_sales_amount")} AS gross_item_sales_amount,
         |  ${sumD("f.discounted_item_sales_amount")} AS discounted_item_sales_amount,
         |  ${sumD("f.net_item_sales_amount")} AS net_item_sales_amount,
         |  ${avgE("f.quantity")} AS avg_quantity,
         |  ${avgE("f.base_price")} AS avg_base_price,
         |  ${avgE("f.discount_percentage")} AS avg_discount_percentage,
         |  CAST(SUM(f.order_item_count) AS BIGINT) AS order_item_count
         |FROM w_fct_orders_items f
         |WHERE f.ship_date <= DATE '1998-09-02'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ---- metrics layer ----------------------------------------------
    "metrics_daily_revenue" -> e(
      ctx => Metrics.dailyRevenue(ctx).orderBy("order_date"),
      s"""SELECT o.order_date,
         |  COUNT(DISTINCT o.order_key) AS order_count,
         |  ${sumD("o.gross_item_sales_amount")} AS gross_revenue,
         |  ${sumD("o.net_item_sales_amount")} AS net_revenue,
         |  ${sumD("o.item_discount_amount")} AS total_discounts,
         |  ${sumD("o.item_tax_amount")} AS total_tax
         |FROM w_fct_orders o GROUP BY 1 ORDER BY 1""".stripMargin),
    "metrics_monthly_orders" -> e(
      ctx => Metrics.monthlyOrders(ctx).orderBy("order_month"),
      s"""SELECT CAST(date_trunc('month', o.order_date) AS DATE) AS order_month,
         |  COUNT(DISTINCT o.order_key) AS order_count,
         |  ${sumD("o.gross_item_sales_amount")} AS gross_revenue,
         |  ${sumD("o.net_item_sales_amount")} AS net_revenue,
         |  ${avgE("o.gross_item_sales_amount")} AS avg_order_value,
         |  ${sumD("o.item_discount_amount")} AS total_discounts,
         |  COUNT(DISTINCT o.customer_key) AS unique_customers
         |FROM w_fct_orders o GROUP BY 1 ORDER BY 1""".stripMargin),
    "metrics_regional_revenue" -> e(
      ctx => Metrics.regionalRevenue(ctx)
        .orderBy("order_month", "region_name", "nation_name"),
      s"""SELECT CAST(date_trunc('month', o.order_date) AS DATE) AS order_month,
         |  c.customer_region_name AS region_name,
         |  c.customer_nation_name AS nation_name,
         |  COUNT(DISTINCT o.order_key) AS order_count,
         |  COUNT(DISTINCT o.customer_key) AS customer_count,
         |  ${sumD("o.gross_item_sales_amount")} AS gross_revenue,
         |  ${sumD("o.net_item_sales_amount")} AS net_revenue
         |FROM w_fct_orders o JOIN w_dim_customer c ON o.customer_key = c.customer_key
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
    "metrics_customer_retention" -> e(
      ctx => Metrics.customerRetention(ctx).orderBy("cohort_month", "order_month"),
      s"""SELECT cfo.cohort_month, mo.order_month,
         |  CAST((EXTRACT(YEAR FROM mo.order_month) - EXTRACT(YEAR FROM cfo.cohort_month)) * 12
         |     + (EXTRACT(MONTH FROM mo.order_month) - EXTRACT(MONTH FROM cfo.cohort_month)) AS INT) AS months_since_first,
         |  COUNT(DISTINCT mo.customer_key) AS active_customers,
         |  CAST(SUM(mo.orders_in_month) AS BIGINT) AS total_orders
         |FROM (SELECT customer_key, CAST(date_trunc('month', MIN(order_date)) AS DATE) AS cohort_month
         |      FROM w_fct_orders GROUP BY 1) cfo
         |JOIN (SELECT o.customer_key, CAST(date_trunc('month', o.order_date) AS DATE) AS order_month,
         |             COUNT(DISTINCT o.order_key) AS orders_in_month
         |      FROM w_fct_orders o GROUP BY 1, 2) mo
         |  ON cfo.customer_key = mo.customer_key
         |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin),
    "metrics_discount_utilization" -> e(
      ctx => Metrics.discountUtilization(ctx).orderBy("ship_month"),
      s"""SELECT CAST(date_trunc('month', i.ship_date) AS DATE) AS ship_month,
         |  COUNT(*) AS total_line_items,
         |  CAST(SUM(CASE WHEN i.discount_percentage > 0 THEN 1 ELSE 0 END) AS BIGINT) AS discounted_items,
         |  CAST(SUM(CASE WHEN i.discount_percentage = 0 THEN 1 ELSE 0 END) AS BIGINT) AS full_price_items,
         |  ${rnd(dv("SUM(CASE WHEN i.discount_percentage > 0 THEN 1 ELSE 0 END)", "NULLIF(COUNT(*), 0)") + " * 100", 2)} AS discount_usage_pct,
         |  ${avgE("CASE WHEN i.discount_percentage > 0 THEN i.discount_percentage END")} AS avg_discount_when_used,
         |  ${sumD("i.gross_item_sales_amount")} AS gross_revenue,
         |  ${sumD("ABS(i.item_discount_amount)")} AS total_discount_given,
         |  ${rnd(dv("SUM(ABS(i.item_discount_amount))", "NULLIF(SUM(i.gross_item_sales_amount), 0)") + " * 100", 2)} AS discount_as_pct_of_revenue
         |FROM w_fct_orders_items i GROUP BY 1 ORDER BY 1""".stripMargin),
    "metrics_top_parts_trending" -> e(
      ctx => Metrics.topPartsTrending(ctx).orderBy("order_month", "part_key"),
      s"""SELECT order_month, part_key, part_name, part_type_name,
         |  ${d("total_quantity_d")} AS total_quantity,
         |  ${d("total_revenue_d")} AS total_revenue,
         |  order_count,
         |  CAST(revenue_rank AS INT) AS revenue_rank,
         |  ${d("prev_month_revenue_d")} AS prev_month_revenue,
         |  ${rnd(dv("(total_revenue_d - COALESCE(prev_month_revenue_d, 0))", "NULLIF(COALESCE(prev_month_revenue_d, 0), 0)") + " * 100", 2)} AS revenue_growth_pct
         |FROM (
         |  SELECT *,
         |    RANK() OVER (PARTITION BY order_month ORDER BY total_revenue_d DESC) AS revenue_rank,
         |    LAG(total_revenue_d) OVER (PARTITION BY part_key ORDER BY order_month) AS prev_month_revenue_d
         |  FROM (SELECT CAST(date_trunc('month', i.order_date) AS DATE) AS order_month,
         |          i.part_key, p.part_name, p.part_type_name,
         |          SUM(i.quantity) AS total_quantity_d,
         |          SUM(i.gross_item_sales_amount) AS total_revenue_d,
         |          COUNT(DISTINCT i.order_key) AS order_count
         |        FROM w_fct_orders_items i
         |        JOIN w_dim_part p ON i.part_key = p.part_key
         |        GROUP BY 1, 2, 3, 4) m) r
         |WHERE revenue_rank <= 50
         |ORDER BY order_month, part_key""".stripMargin),
  )

  /** intermediate-layer queries (reference models/intermediate/). */
}
