package graft

import graft.layers._
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import OracleModel.{Entry, e, T, F, oiCols, foiCols}

/** intermediate-layer (dbt view) oracle entries — split from
  * Registry.scala, see RegistryModels. */
private[graft] object RegistryIntermediate {
  import Oracle.{avgE, d, dump, dv, q, rnd, rndDec, stddevE, sumD}
  import Macros.outD

  val models: ListMap[String, Entry] = ListMap(
    "int_customer_lifetime_value" -> e(
      ctx => outD(Intermediate.customerLifetimeValue(ctx)).orderBy("customer_key"),
      s"""SELECT c.customer_key, c.customer_name, c.customer_nation_name,
         |  c.customer_region_name, c.customer_market_segment_name,
         |  ${d("c.customer_account_balance")} AS customer_account_balance,
         |  COUNT(DISTINCT o.order_key) AS lifetime_orders,
         |  ${sumD("o.gross_item_sales_amount")} AS lifetime_revenue,
         |  ${sumD("o.net_item_sales_amount")} AS lifetime_net_revenue,
         |  MIN(o.order_date) AS first_order_date,
         |  MAX(o.order_date) AS last_order_date,
         |  CAST(MAX(o.order_date) - MIN(o.order_date) AS INT) AS customer_tenure_days,
         |  ${rnd(dv("SUM(o.gross_item_sales_amount)", "NULLIF(COUNT(DISTINCT o.order_key), 0)"), 2)} AS avg_order_value
         |FROM w_dim_customer c LEFT JOIN w_fct_orders o ON c.customer_key = o.customer_key
         |GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY 1""".stripMargin),
    "int_customer_orders_summary" -> e(
      ctx => outD(Intermediate.customerOrdersSummary(ctx)).orderBy("customer_key"),
      s"""SELECT c.customer_key, c.customer_name, c.customer_nation_name,
         |  c.customer_region_name, c.customer_market_segment_name,
         |  COUNT(DISTINCT o.order_key) AS order_count,
         |  ${sumD("o.gross_item_sales_amount")} AS total_revenue,
         |  ${sumD("o.net_item_sales_amount")} AS total_net_revenue,
         |  ${avgE("o.gross_item_sales_amount")} AS avg_order_value,
         |  MIN(o.order_date) AS first_order_date,
         |  MAX(o.order_date) AS last_order_date,
         |  COUNT(DISTINCT CASE WHEN o.order_status_code = 'F' THEN o.order_key END) AS fulfilled_orders,
         |  COUNT(DISTINCT CASE WHEN o.order_status_code = 'O' THEN o.order_key END) AS open_orders,
         |  COUNT(DISTINCT CASE WHEN o.order_status_code = 'P' THEN o.order_key END) AS partial_orders
         |FROM w_dim_customer c LEFT JOIN w_fct_orders o ON c.customer_key = o.customer_key
         |GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""".stripMargin),
    "int_discount_impact" -> e(
      ctx => outD(Intermediate.discountImpact(ctx)).orderBy("order_key"),
      s"""SELECT i.order_key, i.order_date, i.customer_key,
         |  COUNT(*) AS line_item_count,
         |  ${sumD("i.quantity")} AS total_quantity,
         |  ${sumD("i.gross_item_sales_amount")} AS revenue_before_discount,
         |  ${sumD("i.discounted_item_sales_amount")} AS revenue_after_discount,
         |  ${sumD("i.item_discount_amount")} AS total_discount_amount,
         |  ${sumD("i.net_item_sales_amount")} AS net_revenue,
         |  ${rnd(dv("ABS(SUM(i.item_discount_amount))", "NULLIF(SUM(i.gross_item_sales_amount), 0)") + " * 100", 2)} AS effective_discount_pct,
         |  ${avgE("i.discount_percentage")} AS avg_line_discount_pct,
         |  CAST(SUM(CASE WHEN i.discount_percentage > 0 THEN 1 ELSE 0 END) AS BIGINT) AS discounted_line_items,
         |  CAST(SUM(CASE WHEN i.discount_percentage = 0 THEN 1 ELSE 0 END) AS BIGINT) AS full_price_line_items
         |FROM w_fct_orders_items i GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin),
    "int_market_basket" -> e(
      ctx => outD(Intermediate.marketBasket(ctx)).orderBy("part_a", "part_b"),
      s""", r_op AS (SELECT DISTINCT order_key, part_key FROM w_fct_orders_items)
         |SELECT pp.part_a, pp.part_b, pp.co_occurrence_count,
         |  pa.order_count AS part_a_orders, pb.order_count AS part_b_orders,
         |  ${rnd(dv("pp.co_occurrence_count", "NULLIF(pa.order_count, 0)") + " * 100", 2)} AS pct_of_part_a_orders,
         |  ${rnd(dv("pp.co_occurrence_count", "NULLIF(pb.order_count, 0)") + " * 100", 2)} AS pct_of_part_b_orders
         |FROM (SELECT a.part_key AS part_a, b.part_key AS part_b,
         |        COUNT(DISTINCT a.order_key) AS co_occurrence_count
         |      FROM r_op a JOIN r_op b
         |        ON a.order_key = b.order_key AND a.part_key < b.part_key
         |      GROUP BY 1, 2) pp
         |JOIN (SELECT part_key, COUNT(DISTINCT order_key) AS order_count FROM r_op GROUP BY 1) pa
         |  ON pp.part_a = pa.part_key
         |JOIN (SELECT part_key, COUNT(DISTINCT order_key) AS order_count FROM r_op GROUP BY 1) pb
         |  ON pp.part_b = pb.part_key
         |WHERE pp.co_occurrence_count >= 5
         |ORDER BY 1, 2""".stripMargin),
    "int_nation_economics" -> e(
      ctx => outD(Intermediate.nationEconomics(ctx)).orderBy("nation_name"),
      s""", r_cs AS (SELECT c.customer_nation_name AS nation_name,
         |    c.customer_region_name AS region_name,
         |    COUNT(DISTINCT c.customer_key) AS customer_count,
         |    SUM(c.customer_account_balance) AS total_customer_balance_d,
         |    ${avgE("c.customer_account_balance")} AS avg_customer_balance
         |  FROM w_dim_customer c GROUP BY 1, 2)
         |, r_ss AS (SELECT s.supplier_nation_name AS nation_name,
         |    COUNT(DISTINCT s.supplier_key) AS supplier_count,
         |    SUM(s.supplier_account_balance) AS total_supplier_balance_d,
         |    ${avgE("s.supplier_account_balance")} AS avg_supplier_balance_d
         |  FROM w_dim_supplier s GROUP BY 1)
         |, r_os AS (SELECT c.customer_nation_name AS nation_name,
         |    SUM(o.gross_item_sales_amount) AS total_order_revenue_d,
         |    SUM(o.net_item_sales_amount) AS total_net_revenue_d,
         |    COUNT(DISTINCT o.order_key) AS total_orders_d
         |  FROM w_fct_orders o JOIN w_dim_customer c ON o.customer_key = c.customer_key
         |  GROUP BY 1)
         |SELECT cs.nation_name, cs.region_name, cs.customer_count,
         |  COALESCE(ss.supplier_count, 0) AS supplier_count,
         |  ${d("cs.total_customer_balance_d")} AS total_customer_balance,
         |  cs.avg_customer_balance,
         |  COALESCE(${d("ss.total_supplier_balance_d")}, 0) AS total_supplier_balance,
         |  COALESCE(ss.avg_supplier_balance_d, 0) AS avg_supplier_balance,
         |  COALESCE(${d("os.total_order_revenue_d")}, 0) AS total_order_revenue,
         |  COALESCE(${d("os.total_net_revenue_d")}, 0) AS total_net_revenue,
         |  COALESCE(os.total_orders_d, 0) AS total_orders,
         |  ${rnd(dv("COALESCE(os.total_order_revenue_d, 0)", "NULLIF(cs.customer_count, 0)"), 2)} AS revenue_per_customer
         |FROM r_cs cs
         |LEFT JOIN r_ss ss ON cs.nation_name = ss.nation_name
         |LEFT JOIN r_os os ON cs.nation_name = os.nation_name
         |ORDER BY 1""".stripMargin),
    "int_regional_trade_flows" -> e(
      ctx => outD(Intermediate.regionalTradeFlows(ctx))
        .orderBy("supplier_nation", "customer_nation", "ship_year"),
      s"""SELECT s.supplier_nation_name AS supplier_nation,
         |  s.supplier_region_name AS supplier_region,
         |  c.customer_nation_name AS customer_nation,
         |  c.customer_region_name AS customer_region,
         |  CAST(EXTRACT(YEAR FROM i.ship_date) AS INT) AS ship_year,
         |  CASE WHEN s.supplier_nation_name = c.customer_nation_name THEN 'domestic'
         |       WHEN s.supplier_region_name = c.customer_region_name THEN 'intra_regional'
         |       ELSE 'inter_regional' END AS trade_type,
         |  COUNT(*) AS total_shipments,
         |  ${sumD("i.quantity")} AS total_quantity,
         |  ${sumD("i.gross_item_sales_amount")} AS total_revenue,
         |  ${sumD("i.net_item_sales_amount")} AS total_net_revenue
         |FROM w_fct_orders_items i
         |JOIN w_dim_customer c ON i.customer_key = c.customer_key
         |JOIN w_dim_supplier s ON i.supplier_key = s.supplier_key
         |GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY 1, 3, 5""".stripMargin),
    "int_seasonal_demand" -> e(
      ctx => outD(Intermediate.seasonalDemand(ctx))
        .orderBy("order_year", "order_quarter", "order_month"),
      s"""SELECT CAST(EXTRACT(YEAR FROM o.order_date) AS INT) AS order_year,
         |  CAST(EXTRACT(QUARTER FROM o.order_date) AS INT) AS order_quarter,
         |  CAST(EXTRACT(MONTH FROM o.order_date) AS INT) AS order_month,
         |  COUNT(DISTINCT o.order_key) AS order_count,
         |  ${sumD("o.gross_item_sales_amount")} AS total_revenue,
         |  ${sumD("o.net_item_sales_amount")} AS total_net_revenue,
         |  ${avgE("o.gross_item_sales_amount")} AS avg_order_value,
         |  ${sumD("o.item_discount_amount")} AS total_discounts
         |FROM w_fct_orders o GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
  )

  /** reports-layer queries (reference models/reports/). */
}
