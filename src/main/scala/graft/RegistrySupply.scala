package graft

import graft.layers._
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import OracleModel.{Entry, e, T, F, oiCols, foiCols}

/** supply-chain model oracle entries — split from Registry.scala, see
  * RegistryModels. */
private[graft] object RegistrySupply {
  import Oracle.{avgE, d, dump, dv, q, rnd, rndDec, stddevE, sumD}
  import Macros.outD

  val models: ListMap[String, Entry] = ListMap(
    "dim_part_supplier_xrf" -> e(
      ctx => outD(Wh.dimPartSupplierXrf(ctx)).orderBy("part_key", "supplier_key"),
      dump("w_xrf", Seq("part_supplier_key" -> F, "part_key" -> F,
        "part_name" -> F, "part_brand_name" -> F, "part_type_name" -> F,
        "part_size" -> F, "retail_price" -> T, "supplier_key" -> F,
        "supplier_name" -> F, "supplier_account_balance" -> T,
        "supplier_nation_key" -> F, "supplier_nation_name" -> F,
        "supplier_region_key" -> F, "supplier_region_name" -> F,
        "supplier_availabe_quantity" -> F, "supplier_cost_amount" -> T),
        "part_key, supplier_key")),
    "rpt_minimum_cost_suppliers" -> e(
      ctx => outD(Wh.rptMinimumCostSuppliers(ctx)).orderBy("supplier_name", "part_key"),
      s"""SELECT ${d("supplier_account_balance")} AS supplier_account_balance,
         |  supplier_name, supplier_nation_key, supplier_region_key,
         |  supplier_nation_name, supplier_region_name, supplier_key, part_key,
         |  part_size, part_type_name,
         |  ${d("supplier_cost_amount")} AS supplier_cost_amount,
         |  CAST(supplier_cost_rank AS INT) AS supplier_cost_rank,
         |  CAST(supplier_rank AS INT) AS supplier_rank
         |FROM (SELECT *,
         |    RANK() OVER (PARTITION BY supplier_region_key, part_key
         |      ORDER BY supplier_cost_amount) AS supplier_cost_rank,
         |    ROW_NUMBER() OVER (PARTITION BY supplier_region_key, part_key, supplier_cost_amount
         |      ORDER BY supplier_account_balance DESC, supplier_key) AS supplier_rank
         |  FROM w_xrf) x
         |WHERE supplier_cost_rank = 1 AND supplier_rank <= 100
         |ORDER BY supplier_name, part_key""".stripMargin),
    "int_part_profitability" -> e(
      ctx => outD(Intermediate.partProfitability(ctx)).orderBy("part_key"),
      s"""SELECT p.part_key, p.part_name, p.part_type_name, p.part_brand_name,
         |  p.part_size, ${d("p.retail_price")} AS retail_price,
         |  COUNT(*) AS total_line_items,
         |  ${sumD("i.quantity")} AS total_quantity_sold,
         |  ${sumD("i.gross_item_sales_amount")} AS total_revenue,
         |  ${sumD("i.net_item_sales_amount")} AS total_net_revenue,
         |  ${sumD("i.supplier_cost_amount * i.quantity")} AS total_cost,
         |  ${d("SUM(i.gross_item_sales_amount) - SUM(i.supplier_cost_amount * i.quantity)")} AS total_profit,
         |  ${rnd(dv("(SUM(i.gross_item_sales_amount) - SUM(i.supplier_cost_amount * i.quantity))", "NULLIF(SUM(i.gross_item_sales_amount), 0)") + " * 100", 2)} AS profit_margin_pct,
         |  ${avgE("i.discount_percentage")} AS avg_discount_pct
         |FROM w_fct_orders_items i JOIN w_dim_part p ON i.part_key = p.part_key
         |GROUP BY p.part_key, p.part_name, p.part_type_name, p.part_brand_name,
         |  p.part_size, p.retail_price
         |ORDER BY p.part_key""".stripMargin),
    "int_supplier_parts_catalog" -> e(
      ctx => outD(Intermediate.supplierPartsCatalog(ctx))
        .orderBy("part_key", "supplier_key"),
      s"""SELECT supplier_key, supplier_name, supplier_nation_name,
         |  supplier_region_name, part_key, part_name, part_type_name,
         |  part_brand_name, part_size, supplier_availabe_quantity,
         |  ${d("supplier_cost_amount")} AS supplier_cost_amount,
         |  ${d("retail_price")} AS retail_price,
         |  ${d("retail_price - supplier_cost_amount")} AS unit_margin,
         |  ${rnd(dv("(retail_price - supplier_cost_amount)", "NULLIF(retail_price, 0)") + " * 100", 2)} AS margin_pct,
         |  ${d("supplier_availabe_quantity * supplier_cost_amount")} AS inventory_value
         |FROM w_xrf ORDER BY part_key, supplier_key""".stripMargin),
    "int_shipping_delays" -> e(
      ctx => outD(Intermediate.shippingDelays(ctx)).orderBy("order_item_key"),
      s"""SELECT i.order_item_key, i.order_key, i.order_date, i.ship_date,
         |  i.commit_date, i.receipt_date, i.ship_mode_name, i.customer_key,
         |  i.supplier_key, s.supplier_name, s.supplier_nation_name, i.part_key,
         |  ${d("i.quantity")} AS quantity,
         |  ${d("i.gross_item_sales_amount")} AS gross_item_sales_amount,
         |  CAST(i.receipt_date - i.commit_date AS INT) AS days_past_commit,
         |  CAST(i.receipt_date - i.ship_date AS INT) AS transit_days,
         |  CAST(i.ship_date - i.order_date AS INT) AS processing_days,
         |  CASE WHEN i.receipt_date > i.commit_date THEN 'late'
         |       WHEN i.receipt_date = i.commit_date THEN 'on_time'
         |       ELSE 'early' END AS delivery_status
         |FROM w_fct_orders_items i
         |JOIN w_dim_supplier s ON i.supplier_key = s.supplier_key
         |WHERE i.receipt_date IS NOT NULL
         |ORDER BY i.order_item_key""".stripMargin),
    "int_supplier_performance" -> e(
      ctx => outD(Intermediate.supplierPerformance(ctx)).orderBy("supplier_key"),
      s"""SELECT s.supplier_key, s.supplier_name, s.supplier_nation_name,
         |  s.supplier_region_name,
         |  COUNT(*) AS total_line_items,
         |  COUNT(DISTINCT i.order_key) AS total_orders,
         |  ${sumD("i.quantity")} AS total_quantity,
         |  ${sumD("i.gross_item_sales_amount")} AS total_revenue,
         |  ${sumD("i.net_item_sales_amount")} AS total_net_revenue,
         |  CAST(SUM(CASE WHEN i.receipt_date > i.commit_date THEN 1 ELSE 0 END) AS BIGINT) AS late_deliveries,
         |  CAST(SUM(CASE WHEN i.receipt_date <= i.commit_date THEN 1 ELSE 0 END) AS BIGINT) AS on_time_deliveries,
         |  ${rnd(dv("SUM(CASE WHEN i.receipt_date <= i.commit_date THEN 1 ELSE 0 END)", "NULLIF(COUNT(*), 0)") + " * 100", 2)} AS on_time_pct,
         |  ${avgE("(i.receipt_date - i.ship_date)")} AS avg_delivery_days,
         |  CAST(SUM(CASE WHEN i.return_status_code = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_items,
         |  ${rnd(dv("SUM(CASE WHEN i.return_status_code = 'R' THEN 1 ELSE 0 END)", "NULLIF(COUNT(*), 0)") + " * 100", 2)} AS return_rate_pct
         |FROM w_fct_orders_items i
         |JOIN w_dim_supplier s ON i.supplier_key = s.supplier_key
         |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin),
    "int_order_items_enriched" -> e(
      ctx => outD(Intermediate.orderItemsEnriched(ctx)).orderBy("order_item_key"),
      s"""SELECT f.order_item_key, f.order_key, f.order_date, f.order_status_code,
         |  f.order_line_number, f.order_line_status_code, f.return_status_code,
         |  f.ship_date, f.commit_date, f.receipt_date, f.ship_mode_name,
         |  c.customer_key, c.customer_name, c.customer_nation_name,
         |  c.customer_region_name, c.customer_market_segment_name,
         |  s.supplier_key, s.supplier_name, s.supplier_nation_name,
         |  s.supplier_region_name,
         |  p.part_key, p.part_name, p.part_type_name, p.part_brand_name, p.part_size,
         |  ${d("f.quantity")} AS quantity,
         |  ${d("f.base_price")} AS base_price,
         |  ${d("f.discount_percentage")} AS discount_percentage,
         |  ${d("f.tax_rate")} AS tax_rate,
         |  ${d("f.supplier_cost_amount")} AS supplier_cost_amount,
         |  ${d("f.gross_item_sales_amount")} AS gross_item_sales_amount,
         |  ${d("f.discounted_item_sales_amount")} AS discounted_item_sales_amount,
         |  ${d("f.item_discount_amount")} AS item_discount_amount,
         |  ${d("f.item_tax_amount")} AS item_tax_amount,
         |  ${d("f.net_item_sales_amount")} AS net_item_sales_amount,
         |  ${d("f.gross_item_sales_amount - f.supplier_cost_amount * f.quantity")} AS profit_amount
         |FROM w_fct_orders_items f
         |LEFT JOIN w_dim_customer c ON f.customer_key = c.customer_key
         |LEFT JOIN w_dim_supplier s ON f.supplier_key = s.supplier_key
         |LEFT JOIN w_dim_part p ON f.part_key = p.part_key
         |ORDER BY f.order_item_key""".stripMargin),
    "metrics_profit_margin_trend" -> e(
      ctx => outD(Metrics.profitMarginTrend(ctx)).orderBy("order_month", "part_type_name"),
      s"""SELECT CAST(date_trunc('month', i.order_date) AS DATE) AS order_month,
         |  p.part_type_name,
         |  COUNT(*) AS line_item_count,
         |  ${sumD("i.gross_item_sales_amount")} AS total_revenue,
         |  ${sumD("i.supplier_cost_amount * i.quantity")} AS total_cost,
         |  ${d("SUM(i.gross_item_sales_amount) - SUM(i.supplier_cost_amount * i.quantity)")} AS total_profit,
         |  ${rnd(dv("(SUM(i.gross_item_sales_amount) - SUM(i.supplier_cost_amount * i.quantity))", "NULLIF(SUM(i.gross_item_sales_amount), 0)") + " * 100", 2)} AS profit_margin_pct
         |FROM w_fct_orders_items i JOIN w_dim_part p ON i.part_key = p.part_key
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "metrics_inventory_coverage" -> e(
      ctx => outD(Metrics.inventoryCoverage(ctx)).orderBy("part_key"),
      s""", r_demand AS (SELECT part_key, SUM(quantity) AS total_demand_d,
         |    COUNT(DISTINCT order_key) AS order_count_d
         |  FROM w_fct_orders_items GROUP BY 1)
         |, r_supply AS (SELECT part_key,
         |    CAST(SUM(supplier_availabe_quantity) AS BIGINT) AS total_supply_d,
         |    COUNT(DISTINCT supplier_key) AS supplier_count_d,
         |    ${avgE("supplier_cost_amount")} AS avg_cost
         |  FROM w_xrf GROUP BY 1)
         |SELECT p.part_key, p.part_name, p.part_type_name, p.part_brand_name,
         |  COALESCE(s.total_supply_d, 0) AS total_supply,
         |  COALESCE(${d("d.total_demand_d")}, 0) AS total_demand,
         |  COALESCE(s.supplier_count_d, 0) AS supplier_count,
         |  COALESCE(d.order_count_d, 0) AS order_count,
         |  s.avg_cost,
         |  ${rnd(dv("COALESCE(s.total_supply_d, 0)", "NULLIF(COALESCE(d.total_demand_d, 0), 0)"), 2)} AS supply_demand_ratio
         |FROM w_dim_part p
         |LEFT JOIN r_supply s ON p.part_key = s.part_key
         |LEFT JOIN r_demand d ON p.part_key = d.part_key
         |ORDER BY p.part_key""".stripMargin),
    "metrics_shipping_efficiency" -> e(
      ctx => outD(Metrics.shippingEfficiency(ctx)).orderBy("ship_month", "ship_mode_name"),
      s"""SELECT CAST(date_trunc('month', i.ship_date) AS DATE) AS ship_month,
         |  i.ship_mode_name,
         |  COUNT(*) AS shipment_count,
         |  ${avgE("(i.receipt_date - i.ship_date)")} AS avg_transit_days,
         |  ${avgE("(i.ship_date - i.order_date)")} AS avg_processing_days,
         |  ${avgE("(i.receipt_date - i.order_date)")} AS avg_total_days,
         |  CAST(SUM(CASE WHEN i.receipt_date > i.commit_date THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
         |  ${rnd(dv("SUM(CASE WHEN i.receipt_date > i.commit_date THEN 1 ELSE 0 END)", "NULLIF(COUNT(*), 0)") + " * 100", 2)} AS late_pct
         |FROM w_fct_orders_items i
         |WHERE i.receipt_date IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "metrics_supplier_reliability" -> e(
      ctx => outD(Metrics.supplierReliability(ctx)).orderBy("ship_month", "supplier_key"),
      s"""SELECT CAST(date_trunc('month', i.ship_date) AS DATE) AS ship_month,
         |  s.supplier_key, s.supplier_name, s.supplier_nation_name,
         |  COUNT(*) AS total_shipments,
         |  CAST(SUM(CASE WHEN i.receipt_date <= i.commit_date THEN 1 ELSE 0 END) AS BIGINT) AS on_time_count,
         |  CAST(SUM(CASE WHEN i.receipt_date > i.commit_date THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
         |  ${rnd(dv("SUM(CASE WHEN i.receipt_date <= i.commit_date THEN 1 ELSE 0 END)", "NULLIF(COUNT(*), 0)") + " * 100", 2)} AS on_time_pct
         |FROM w_fct_orders_items i
         |JOIN w_dim_supplier s ON i.supplier_key = s.supplier_key
         |WHERE i.receipt_date IS NOT NULL
         |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin),
    "inventory_turnover" -> e(
      ctx => outD(Reports.inventoryTurnover(ctx)).orderBy("part_key", "supplier_key"),
      s""", r_sales AS (SELECT part_key, supplier_key, SUM(quantity) AS units_sold_d,
         |    SUM(gross_item_sales_amount) AS revenue_d
         |  FROM w_fct_orders_items GROUP BY 1, 2)
         |SELECT s.part_key, p.part_name, p.part_type_name, s.supplier_key,
         |  sup.supplier_name,
         |  su.supplier_availabe_quantity AS available_quantity,
         |  ${d("su.supplier_cost_amount")} AS supply_cost,
         |  ${d("s.units_sold_d")} AS units_sold,
         |  ${d("s.revenue_d")} AS revenue,
         |  ${rnd(dv("s.units_sold_d", "NULLIF(su.supplier_availabe_quantity, 0)"), 2)} AS turnover_ratio,
         |  CASE WHEN su.supplier_availabe_quantity = 0 THEN 'out_of_stock'
         |       WHEN ${dv("s.units_sold_d", "su.supplier_availabe_quantity")} > 2 THEN 'fast_mover'
         |       WHEN ${dv("s.units_sold_d", "su.supplier_availabe_quantity")} > 0.5 THEN 'normal'
         |       WHEN ${dv("s.units_sold_d", "su.supplier_availabe_quantity")} > 0 THEN 'slow_mover'
         |       ELSE 'dead_stock' END AS turnover_category
         |FROM r_sales s
         |JOIN o_ps su ON s.part_key = su.part_key AND s.supplier_key = su.supplier_key
         |JOIN w_dim_part p ON s.part_key = p.part_key
         |JOIN w_dim_supplier sup ON s.supplier_key = sup.supplier_key
         |ORDER BY 1, 4""".stripMargin),
    "supplier_concentration_risk" -> e(
      ctx => outD(Reports.supplierConcentrationRisk(ctx)).orderBy("part_key", "supplier_key"),
      s""", r_psc AS (SELECT part_key, COUNT(DISTINCT supplier_key) AS supplier_count,
         |    CAST(SUM(supplier_availabe_quantity) AS BIGINT) AS total_available_qty
         |  FROM w_xrf GROUP BY 1)
         |SELECT ps.part_key, p.part_name, p.part_type_name, ps.supplier_key,
         |  s.supplier_name, s.supplier_nation_name,
         |  psc.supplier_count AS total_suppliers_for_part,
         |  ps.supplier_availabe_quantity,
         |  psc.total_available_qty AS part_total_supply,
         |  ${rnd(dv("ps.supplier_availabe_quantity", "NULLIF(psc.total_available_qty, 0)") + " * 100", 2)} AS supply_share_pct,
         |  CASE WHEN psc.supplier_count = 1 THEN 'single_source'
         |       WHEN ${rnd(dv("ps.supplier_availabe_quantity", "NULLIF(psc.total_available_qty, 0)") + " * 100", 2)} > 80 THEN 'dominant_supplier'
         |       WHEN psc.supplier_count <= 3 THEN 'limited_sources'
         |       ELSE 'diversified' END AS concentration_risk
         |FROM w_xrf ps
         |JOIN r_psc psc ON ps.part_key = psc.part_key
         |JOIN w_dim_part p ON ps.part_key = p.part_key
         |JOIN w_dim_supplier s ON ps.supplier_key = s.supplier_key
         |ORDER BY 1, 4""".stripMargin),
    "part_type_performance" -> e(
      ctx => outD(Reports.partTypePerformance(ctx))
        .orderBy("part_type_name", "part_brand_name", "size_category"),
      s"""SELECT p.part_type_name, p.part_brand_name,
         |  CASE WHEN p.part_size <= 10 THEN 'small'
         |       WHEN p.part_size <= 30 THEN 'medium'
         |       ELSE 'large' END AS size_category,
         |  COUNT(DISTINCT p.part_key) AS part_count,
         |  COUNT(*) AS line_item_count,
         |  COUNT(DISTINCT i.order_key) AS order_count,
         |  COUNT(DISTINCT i.customer_key) AS customer_count,
         |  ${sumD("i.quantity")} AS total_units,
         |  ${sumD("i.gross_item_sales_amount")} AS total_revenue,
         |  ${rnd(avgE("i.base_price"), 2)} AS avg_unit_price,
         |  ${rnd(avgE("i.discount_percentage") + " * 100", 2)} AS avg_discount_pct,
         |  ${sumD("i.gross_item_sales_amount - i.supplier_cost_amount * i.quantity")} AS total_profit
         |FROM w_fct_orders_items i JOIN w_dim_part p ON i.part_key = p.part_key
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
    "supplier_lead_time_distribution" -> e(
      ctx => outD(Reports.supplierLeadTimeDistribution(ctx)).orderBy("supplier_key"),
      s""", r_sh AS (SELECT supplier_key,
         |    CAST(receipt_date - order_date AS INT) AS lead_time_days,
         |    CAST(ship_date - order_date AS INT) AS processing_days,
         |    CAST(receipt_date - ship_date AS INT) AS transit_days
         |  FROM w_fct_orders_items WHERE receipt_date IS NOT NULL)
         |SELECT sh.supplier_key, s.supplier_name, s.supplier_nation_name,
         |  COUNT(*) AS shipment_count,
         |  ${rnd(avgE("sh.lead_time_days"), 1)} AS avg_lead_time,
         |  ${rnd(avgE("sh.processing_days"), 1)} AS avg_processing_days,
         |  ${rnd(avgE("sh.transit_days"), 1)} AS avg_transit_days,
         |  MIN(sh.lead_time_days) AS min_lead_time,
         |  MAX(sh.lead_time_days) AS max_lead_time,
         |  percentile_cont(0.50) WITHIN GROUP (ORDER BY sh.lead_time_days) AS p50_lead_time,
         |  percentile_cont(0.90) WITHIN GROUP (ORDER BY sh.lead_time_days) AS p90_lead_time,
         |  percentile_cont(0.95) WITHIN GROUP (ORDER BY sh.lead_time_days) AS p95_lead_time,
         |  ${rnd(stddevE("sh.lead_time_days"), 2)} AS lead_time_stddev,
         |  ${rnd(stddevE("sh.lead_time_days") + " / NULLIF(" + avgE("sh.lead_time_days") + ", 0)", 3)} AS lead_time_cv
         |FROM r_sh sh JOIN w_dim_supplier s ON sh.supplier_key = s.supplier_key
         |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin),
    "supplier_scorecard" -> e(
      ctx => outD(Reports.supplierScorecard(ctx)).orderBy("supplier_key"),
      s""", r_delivery AS (SELECT supplier_key, COUNT(*) AS total_shipments,
         |    CAST(SUM(CASE WHEN receipt_date <= commit_date THEN 1 ELSE 0 END) AS BIGINT) AS on_time_shipments,
         |    CAST(SUM(CASE WHEN return_status_code = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_items,
         |    ${avgE("(receipt_date - ship_date)")} AS avg_transit_days,
         |    ${avgE("(receipt_date - commit_date)")} AS avg_delay_days
         |  FROM w_fct_orders_items WHERE receipt_date IS NOT NULL GROUP BY 1)
         |, r_revenue AS (SELECT supplier_key,
         |    SUM(gross_item_sales_amount) AS total_revenue_d,
         |    SUM(net_item_sales_amount) AS total_net_revenue_d,
         |    COUNT(DISTINCT order_key) AS order_count,
         |    COUNT(DISTINCT customer_key) AS customer_reach,
         |    COUNT(DISTINCT part_key) AS parts_supplied
         |  FROM w_fct_orders_items GROUP BY 1)
         |, r_inventory AS (SELECT supplier_key,
         |    CAST(SUM(supplier_availabe_quantity) AS BIGINT) AS total_available_qty_d,
         |    ${avgE("supplier_cost_amount")} AS avg_supply_cost_d
         |  FROM w_xrf GROUP BY 1)
         |SELECT s.supplier_key, s.supplier_name, s.supplier_nation_name,
         |  s.supplier_region_name,
         |  ${d("s.supplier_account_balance")} AS supplier_account_balance,
         |  ${d("r.total_revenue_d")} AS total_revenue,
         |  ${d("r.total_net_revenue_d")} AS total_net_revenue,
         |  r.order_count, r.customer_reach, r.parts_supplied,
         |  dl.total_shipments, dl.on_time_shipments,
         |  ${rnd(dv("dl.on_time_shipments", "NULLIF(dl.total_shipments, 0)") + " * 100", 2)} AS on_time_pct,
         |  dl.returned_items,
         |  ${rnd(dv("dl.returned_items", "NULLIF(dl.total_shipments, 0)") + " * 100", 2)} AS return_rate_pct,
         |  ${rnd("dl.avg_transit_days", 1)} AS avg_transit_days,
         |  ${rnd("dl.avg_delay_days", 1)} AS avg_delay_days,
         |  COALESCE(dl_i.total_available_qty_d, 0) AS total_available_qty,
         |  ${rnd("dl_i.avg_supply_cost_d", 2)} AS avg_supply_cost
         |FROM w_dim_supplier s
         |LEFT JOIN r_revenue r ON s.supplier_key = r.supplier_key
         |LEFT JOIN r_delivery dl ON s.supplier_key = dl.supplier_key
         |LEFT JOIN r_inventory dl_i ON s.supplier_key = dl_i.supplier_key
         |ORDER BY s.supplier_key""".stripMargin),
  )

  // ---- extension track: text / dedup / similarity / events --------------
  // DuckDB twins of the shared text expressions (graft.extensions.Text)
}
