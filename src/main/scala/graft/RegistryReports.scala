package graft

import graft.layers._
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import OracleModel.{Entry, e, T, F, oiCols, foiCols}

/** reports/metrics-layer oracle entries — split from Registry.scala,
  * see RegistryModels. */
private[graft] object RegistryReports {
  import Oracle.{avgE, d, dump, dv, q, rnd, rndDec, stddevE, sumD}
  import Macros.outD

  val models: ListMap[String, Entry] = ListMap(
    "customer_concentration_risk" -> e(
      ctx => outD(Reports.customerConcentrationRisk(ctx)).orderBy("revenue_rank"),
      s""", r_crev AS (SELECT o.customer_key, c.customer_name, c.customer_nation_name,
         |    c.customer_market_segment_name,
         |    SUM(o.gross_item_sales_amount) AS total_revenue_d,
         |    COUNT(DISTINCT o.order_key) AS order_count
         |  FROM w_fct_orders o JOIN w_dim_customer c ON o.customer_key = c.customer_key
         |  GROUP BY 1, 2, 3, 4)
         |, r_cranked AS (SELECT *,
         |    CAST(ROW_NUMBER() OVER (ORDER BY total_revenue_d DESC, customer_key) AS INT) AS revenue_rank,
         |    COUNT(*) OVER () AS total_customers,
         |    SUM(total_revenue_d) OVER () AS grand_total_revenue_d,
         |    SUM(total_revenue_d) OVER (ORDER BY total_revenue_d DESC) AS cumulative_revenue_d
         |  FROM r_crev)
         |SELECT revenue_rank, customer_key, customer_name, customer_nation_name,
         |  customer_market_segment_name, order_count,
         |  ${d("total_revenue_d")} AS total_revenue,
         |  ${d("cumulative_revenue_d")} AS cumulative_revenue,
         |  ${d("grand_total_revenue_d")} AS grand_total_revenue,
         |  ${rnd(dv("total_revenue_d", "grand_total_revenue_d") + " * 100", 4)} AS pct_of_total_revenue,
         |  ${rnd(dv("cumulative_revenue_d", "grand_total_revenue_d") + " * 100", 2)} AS cumulative_pct,
         |  ${rnd(dv("revenue_rank", "total_customers") + " * 100", 2)} AS customer_percentile,
         |  CASE WHEN ${dv("cumulative_revenue_d", "grand_total_revenue_d")} <= 0.80 THEN 'top_80_pct'
         |       WHEN ${dv("cumulative_revenue_d", "grand_total_revenue_d")} <= 0.95 THEN 'middle_15_pct'
         |       ELSE 'bottom_5_pct' END AS pareto_tier
         |FROM r_cranked ORDER BY revenue_rank""".stripMargin),
    "customer_cohort_retention" -> e(
      ctx => outD(Reports.customerCohortRetention(ctx))
        .orderBy("cohort_month", "activity_month"),
      s""", r_cohort AS (SELECT customer_key,
         |    CAST(date_trunc('month', MIN(order_date)) AS DATE) AS cohort_month
         |  FROM w_fct_orders GROUP BY 1)
         |, r_activity AS (SELECT DISTINCT customer_key,
         |    CAST(date_trunc('month', order_date) AS DATE) AS activity_month
         |  FROM w_fct_orders)
         |, r_ca AS (SELECT cc.cohort_month, ca.activity_month,
         |    CAST((EXTRACT(YEAR FROM ca.activity_month) - EXTRACT(YEAR FROM cc.cohort_month)) * 12
         |       + EXTRACT(MONTH FROM ca.activity_month) - EXTRACT(MONTH FROM cc.cohort_month) AS INT) AS period_number,
         |    COUNT(DISTINCT ca.customer_key) AS active_customers
         |  FROM r_cohort cc JOIN r_activity ca ON cc.customer_key = ca.customer_key
         |  GROUP BY 1, 2, 3)
         |, r_sizes AS (SELECT cohort_month, COUNT(DISTINCT customer_key) AS cohort_size
         |  FROM r_cohort GROUP BY 1)
         |SELECT ca.cohort_month, ca.activity_month, ca.period_number, cs.cohort_size,
         |  ca.active_customers,
         |  ${rnd(dv("ca.active_customers", "cs.cohort_size") + " * 100", 2)} AS retention_pct
         |FROM r_ca ca JOIN r_sizes cs ON ca.cohort_month = cs.cohort_month
         |ORDER BY 1, 2""".stripMargin),
    "customer_churn_risk" -> e(
      ctx => outD(Reports.customerChurnRisk(ctx)).orderBy("customer_key"),
      s""", r_gaps AS (SELECT customer_key, order_date,
         |    CAST(order_date - LAG(order_date) OVER (PARTITION BY customer_key ORDER BY order_date, order_key) AS INT) AS days_between_orders
         |  FROM w_fct_orders)
         |, r_cadence AS (SELECT customer_key, COUNT(*) AS total_orders,
         |    ${avgE("days_between_orders")} AS avg_days_between_orders,
         |    MAX(order_date) AS last_order_date
         |  FROM r_gaps GROUP BY 1)
         |, r_ref AS (SELECT MAX(order_date) AS reference_date FROM w_fct_orders)
         |SELECT cc.customer_key, c.customer_name, c.customer_nation_name,
         |  c.customer_market_segment_name, cc.total_orders, cc.last_order_date,
         |  CAST(r.reference_date - cc.last_order_date AS INT) AS days_since_last_order,
         |  ${rnd("cc.avg_days_between_orders", 1)} AS avg_days_between_orders,
         |  CASE WHEN cc.total_orders <= 1 THEN NULL
         |       ELSE ${rnd(dv("(r.reference_date - cc.last_order_date)", "NULLIF(cc.avg_days_between_orders, 0)"), 2)} END AS recency_ratio,
         |  CASE WHEN cc.total_orders <= 1 THEN 'insufficient_data'
         |       WHEN (r.reference_date - cc.last_order_date) <= cc.avg_days_between_orders THEN 'active'
         |       WHEN (r.reference_date - cc.last_order_date) <= cc.avg_days_between_orders * 2 THEN 'at_risk'
         |       ELSE 'churned' END AS churn_status
         |FROM r_cadence cc CROSS JOIN r_ref r
         |JOIN w_dim_customer c ON cc.customer_key = c.customer_key
         |ORDER BY 1""".stripMargin),
    "customer_geographic_summary" -> e(
      ctx => outD(Reports.customerGeographicSummary(ctx))
        .orderBy("region_name", "nation_name"),
      s"""SELECT c.customer_region_name AS region_name,
         |  c.customer_nation_name AS nation_name,
         |  COUNT(DISTINCT c.customer_key) AS customer_count,
         |  COUNT(DISTINCT o.order_key) AS order_count,
         |  ${sumD("o.gross_item_sales_amount")} AS total_revenue,
         |  ${sumD("o.net_item_sales_amount")} AS total_net_revenue,
         |  ${rnd(avgE("o.gross_item_sales_amount"), 2)} AS avg_order_value,
         |  ${rnd(dv("SUM(o.gross_item_sales_amount)", "NULLIF(COUNT(DISTINCT c.customer_key), 0)"), 2)} AS revenue_per_customer,
         |  ${rnd(dv("COUNT(DISTINCT o.order_key)", "NULLIF(COUNT(DISTINCT c.customer_key), 0)"), 2)} AS orders_per_customer,
         |  ${sumD("c.customer_account_balance")} AS total_account_balance
         |FROM w_dim_customer c LEFT JOIN w_fct_orders o ON c.customer_key = o.customer_key
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "customer_purchase_frequency_bands" -> e(
      ctx => outD(Reports.customerPurchaseFrequencyBands(ctx)).orderBy("frequency_band"),
      s""", r_bands AS (SELECT customer_key, order_count, total_revenue_d,
         |    CASE WHEN order_count = 1 THEN 'one_time'
         |         WHEN order_count BETWEEN 2 AND 5 THEN 'occasional'
         |         WHEN order_count BETWEEN 6 AND 15 THEN 'regular'
         |         WHEN order_count > 15 THEN 'power_buyer' END AS frequency_band
         |  FROM (SELECT customer_key, COUNT(DISTINCT order_key) AS order_count,
         |          SUM(gross_item_sales_amount) AS total_revenue_d
         |        FROM w_fct_orders GROUP BY 1) x)
         |, r_bagg AS (SELECT frequency_band, COUNT(*) AS customer_count,
         |    SUM(total_revenue_d) AS band_total_revenue_d,
         |    ${avgE("total_revenue_d")} AS avg_revenue_per_customer,
         |    ${avgE("order_count")} AS avg_orders_per_customer,
         |    MIN(order_count) AS min_orders, MAX(order_count) AS max_orders
         |  FROM r_bands GROUP BY 1)
         |SELECT frequency_band, customer_count,
         |  ${rnd(dv("customer_count", "SUM(customer_count) OVER ()") + " * 100", 2)} AS pct_of_customers,
         |  ${d("band_total_revenue_d")} AS band_total_revenue,
         |  ${rnd(dv("band_total_revenue_d", "SUM(band_total_revenue_d) OVER ()") + " * 100", 2)} AS pct_of_revenue,
         |  ${rnd("avg_revenue_per_customer", 2)} AS avg_revenue_per_customer,
         |  avg_orders_per_customer, min_orders, max_orders
         |FROM r_bagg ORDER BY 1""".stripMargin),
    "customer_rfm_segments" -> e(
      ctx => outD(Reports.customerRfmSegments(ctx)).orderBy("customer_key"),
      s""", r_om AS (SELECT customer_key, MAX(order_date) AS last_order_date,
         |    COUNT(DISTINCT order_key) AS frequency,
         |    SUM(gross_item_sales_amount) AS monetary_d
         |  FROM w_fct_orders GROUP BY 1)
         |, r_ref2 AS (SELECT MAX(order_date) AS reference_date FROM w_fct_orders)
         |, r_scores AS (SELECT om.customer_key, om.last_order_date,
         |    CAST(md.reference_date - om.last_order_date AS INT) AS recency_days,
         |    om.frequency, om.monetary_d,
         |    CAST(NTILE(5) OVER (ORDER BY (md.reference_date - om.last_order_date) DESC, om.customer_key) AS INT) AS r_score,
         |    CAST(NTILE(5) OVER (ORDER BY om.frequency, om.customer_key) AS INT) AS f_score,
         |    CAST(NTILE(5) OVER (ORDER BY om.monetary_d, om.customer_key) AS INT) AS m_score
         |  FROM r_om om CROSS JOIN r_ref2 md)
         |SELECT r.customer_key, c.customer_name, c.customer_nation_name,
         |  c.customer_market_segment_name, r.last_order_date, r.recency_days,
         |  r.frequency, ${d("r.monetary_d")} AS monetary,
         |  r.r_score, r.f_score, r.m_score,
         |  CAST(r.r_score + r.f_score + r.m_score AS INT) AS rfm_total,
         |  CASE WHEN r.r_score >= 4 AND r.f_score >= 4 AND r.m_score >= 4 THEN 'champion'
         |       WHEN r.r_score >= 3 AND r.f_score >= 3 AND r.m_score >= 3 THEN 'loyal'
         |       WHEN r.r_score >= 4 AND r.f_score <= 2 THEN 'new_customer'
         |       WHEN r.r_score >= 3 AND r.f_score >= 3 AND r.m_score <= 2 THEN 'potential_loyalist'
         |       WHEN r.r_score <= 2 AND r.f_score >= 3 AND r.m_score >= 3 THEN 'at_risk'
         |       WHEN r.r_score <= 2 AND r.f_score >= 4 AND r.m_score >= 4 THEN 'cant_lose_them'
         |       WHEN r.r_score <= 2 AND r.f_score <= 2 THEN 'hibernating'
         |       ELSE 'need_attention' END AS rfm_segment
         |FROM r_scores r JOIN w_dim_customer c ON r.customer_key = c.customer_key
         |ORDER BY 1""".stripMargin),
    "discount_depth_analysis" -> e(
      ctx => outD(Reports.discountDepthAnalysis(ctx)).orderBy("discount_band"),
      s""", r_dd AS (SELECT *,
         |    CASE WHEN discount_percentage = 0 THEN '0_no_discount'
         |         WHEN discount_percentage <= 0.03 THEN '1_low_1_3pct'
         |         WHEN discount_percentage <= 0.06 THEN '2_medium_4_6pct'
         |         WHEN discount_percentage <= 0.08 THEN '3_high_7_8pct'
         |         ELSE '4_deep_9pct_plus' END AS discount_band
         |  FROM w_fct_orders_items)
         |, r_dagg AS (SELECT discount_band, COUNT(*) AS line_item_count,
         |    ${sumD("quantity")} AS total_quantity,
         |    ${sumD("gross_item_sales_amount")} AS gross_revenue,
         |    ${sumD("discounted_item_sales_amount")} AS discounted_revenue,
         |    ${sumD("ABS(item_discount_amount)")} AS total_discount_given,
         |    ${rnd(avgE("quantity"), 2)} AS avg_quantity_per_item,
         |    ${rnd(avgE("gross_item_sales_amount"), 2)} AS avg_item_revenue,
         |    COUNT(DISTINCT order_key) AS distinct_orders,
         |    COUNT(DISTINCT customer_key) AS distinct_customers
         |  FROM r_dd GROUP BY 1)
         |SELECT discount_band, line_item_count, total_quantity, gross_revenue,
         |  discounted_revenue, total_discount_given, avg_quantity_per_item,
         |  avg_item_revenue, distinct_orders, distinct_customers,
         |  ${rnd(dv("line_item_count", "SUM(line_item_count) OVER ()") + " * 100", 2)} AS pct_of_items
         |FROM r_dagg ORDER BY 1""".stripMargin),
    "discount_effectiveness" -> e(
      ctx => outD(Reports.discountEffectiveness(ctx)).orderBy("order_discount_type"),
      s""", r_ol AS (SELECT order_key, customer_key, order_date,
         |    SUM(CASE WHEN discount_percentage > 0 THEN 1 ELSE 0 END) AS discounted_lines,
         |    SUM(CASE WHEN NOT (discount_percentage > 0) THEN 1 ELSE 0 END) AS full_price_lines,
         |    SUM(quantity) AS total_quantity_d,
         |    SUM(gross_item_sales_amount) AS gross_revenue_d,
         |    SUM(ABS(item_discount_amount)) AS discount_amount_d
         |  FROM w_fct_orders_items GROUP BY 1, 2, 3)
         |SELECT CASE WHEN discounted_lines = 0 THEN 'all_full_price'
         |            WHEN full_price_lines = 0 THEN 'all_discounted'
         |            ELSE 'mixed' END AS order_discount_type,
         |  COUNT(DISTINCT order_key) AS order_count,
         |  COUNT(DISTINCT customer_key) AS customer_count,
         |  ${rnd(avgE("total_quantity_d"), 2)} AS avg_items_per_order,
         |  ${rnd(avgE("gross_revenue_d"), 2)} AS avg_order_value,
         |  ${sumD("gross_revenue_d")} AS total_revenue,
         |  ${sumD("discount_amount_d")} AS total_discount_given,
         |  ${rnd(dv("SUM(discount_amount_d)", "NULLIF(SUM(gross_revenue_d), 0)") + " * 100", 2)} AS effective_discount_rate
         |FROM r_ol GROUP BY 1 ORDER BY 1""".stripMargin),
    "fulfillment_priority_analysis" -> e(
      ctx => outD(Reports.fulfillmentPriorityAnalysis(ctx))
        .orderBy("order_priority_code", "ship_mode_name"),
      s""", r_fp AS (SELECT i.order_key, i.customer_key, i.quantity,
         |    i.gross_item_sales_amount, o.order_priority_code, i.ship_mode_name,
         |    CAST(i.ship_date - i.order_date AS INT) AS fulfillment_days
         |  FROM w_fct_orders_items i JOIN w_fct_orders o ON i.order_key = o.order_key)
         |SELECT order_priority_code, ship_mode_name,
         |  COUNT(*) AS line_item_count,
         |  COUNT(DISTINCT order_key) AS order_count,
         |  COUNT(DISTINCT customer_key) AS customer_count,
         |  ${sumD("gross_item_sales_amount")} AS total_revenue,
         |  ${rnd(avgE("fulfillment_days"), 1)} AS avg_fulfillment_days,
         |  MIN(fulfillment_days) AS min_fulfillment_days,
         |  MAX(fulfillment_days) AS max_fulfillment_days,
         |  ${rnd(avgE("quantity"), 1)} AS avg_quantity_per_line,
         |  CAST(SUM(CASE WHEN fulfillment_days <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_within_7d,
         |  CAST(SUM(CASE WHEN fulfillment_days <= 14 THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_within_14d,
         |  ${rnd(dv("SUM(CASE WHEN fulfillment_days <= 7 THEN 1 ELSE 0 END) * 100", "COUNT(*)"), 2)} AS pct_within_7d,
         |  ${rnd(dv("SUM(CASE WHEN fulfillment_days <= 14 THEN 1 ELSE 0 END) * 100", "COUNT(*)"), 2)} AS pct_within_14d
         |FROM r_fp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "monthly_order_trends" -> e(
      ctx => outD(Reports.monthlyOrderTrends(ctx)).orderBy("order_month"),
      s""", r_mot AS (SELECT CAST(date_trunc('month', o.order_date) AS DATE) AS order_month,
         |    COUNT(DISTINCT o.order_key) AS total_orders,
         |    COUNT(DISTINCT o.customer_key) AS unique_customers,
         |    COUNT(DISTINCT CASE WHEN date_trunc('month', o.order_date) = date_trunc('month', cf.first_order_date)
         |      THEN o.customer_key END) AS new_customers,
         |    COUNT(DISTINCT CASE WHEN NOT (date_trunc('month', o.order_date) = date_trunc('month', cf.first_order_date))
         |      THEN o.customer_key END) AS returning_customers,
         |    SUM(o.gross_item_sales_amount) AS total_revenue_d,
         |    SUM(CASE WHEN date_trunc('month', o.order_date) = date_trunc('month', cf.first_order_date)
         |      THEN o.gross_item_sales_amount ELSE 0 END) AS new_customer_revenue_d,
         |    SUM(CASE WHEN NOT (date_trunc('month', o.order_date) = date_trunc('month', cf.first_order_date))
         |      THEN o.gross_item_sales_amount ELSE 0 END) AS returning_customer_revenue_d,
         |    ${rnd(avgE("o.gross_item_sales_amount"), 2)} AS avg_order_value
         |  FROM w_fct_orders o
         |  JOIN (SELECT customer_key, MIN(order_date) AS first_order_date
         |        FROM w_fct_orders GROUP BY 1) cf
         |    ON o.customer_key = cf.customer_key
         |  GROUP BY 1)
         |SELECT order_month, total_orders, unique_customers, new_customers,
         |  returning_customers,
         |  ${d("total_revenue_d")} AS total_revenue,
         |  ${d("new_customer_revenue_d")} AS new_customer_revenue,
         |  ${d("returning_customer_revenue_d")} AS returning_customer_revenue,
         |  avg_order_value,
         |  ${d("LAG(total_revenue_d) OVER (ORDER BY order_month)")} AS prev_month_revenue,
         |  ${rnd(dv("(total_revenue_d - LAG(total_revenue_d) OVER (ORDER BY order_month))", "NULLIF(LAG(total_revenue_d) OVER (ORDER BY order_month), 0)") + " * 100", 2)} AS revenue_mom_growth_pct
         |FROM r_mot ORDER BY 1""".stripMargin),
    "monthly_revenue_kpis" -> e(
      ctx => outD(Reports.monthlyRevenueKpis(ctx)).orderBy("order_month"),
      s""", r_mk AS (SELECT CAST(date_trunc('month', order_date) AS DATE) AS order_month,
         |    COUNT(DISTINCT order_key) AS order_count,
         |    COUNT(DISTINCT customer_key) AS unique_customers,
         |    SUM(gross_item_sales_amount) AS gross_revenue_d,
         |    ${sumD("net_item_sales_amount")} AS net_revenue,
         |    ${sumD("item_discount_amount")} AS total_discounts,
         |    ${rnd(avgE("gross_item_sales_amount"), 2)} AS avg_order_value
         |  FROM w_fct_orders GROUP BY 1)
         |SELECT order_month, order_count, unique_customers,
         |  ${d("gross_revenue_d")} AS gross_revenue,
         |  net_revenue, total_discounts, avg_order_value,
         |  ${d("LAG(gross_revenue_d) OVER (ORDER BY order_month)")} AS prev_month_revenue,
         |  ${rnd(dv("(gross_revenue_d - LAG(gross_revenue_d) OVER (ORDER BY order_month))", "NULLIF(LAG(gross_revenue_d) OVER (ORDER BY order_month), 0)") + " * 100", 2)} AS revenue_mom_growth_pct,
         |  ${rnd(dv("SUM(gross_revenue_d) OVER (ORDER BY order_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", "COUNT(*) OVER (ORDER BY order_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"), 2)} AS rolling_3m_avg_revenue,
         |  ${d("SUM(gross_revenue_d) OVER (ORDER BY order_month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS cumulative_revenue
         |FROM r_mk ORDER BY 1""".stripMargin),
    "order_status_funnel" -> e(
      ctx => outD(Reports.orderStatusFunnel(ctx)).orderBy("order_status_code"),
      s""", r_osf AS (SELECT order_status_code,
         |    COUNT(DISTINCT order_key) AS order_count,
         |    SUM(gross_item_sales_amount) AS total_revenue_d,
         |    ${rnd(avgE("gross_item_sales_amount"), 2)} AS avg_order_value,
         |    COUNT(DISTINCT customer_key) AS unique_customers
         |  FROM w_fct_orders GROUP BY 1)
         |SELECT order_status_code, order_count,
         |  ${rnd(dv("order_count", "SUM(order_count) OVER ()") + " * 100", 2)} AS pct_of_orders,
         |  ${d("total_revenue_d")} AS total_revenue,
         |  ${rnd(dv("total_revenue_d", "SUM(total_revenue_d) OVER ()") + " * 100", 2)} AS pct_of_revenue,
         |  avg_order_value, unique_customers
         |FROM r_osf ORDER BY 1""".stripMargin),
    "part_abc_classification" -> e(
      ctx => outD(Reports.partAbcClassification(ctx)).orderBy("revenue_rank"),
      s""", r_prev AS (SELECT i.part_key, p.part_name, p.part_type_name, p.part_brand_name,
         |    SUM(i.gross_item_sales_amount) AS total_revenue_d,
         |    SUM(i.quantity) AS total_quantity_d,
         |    COUNT(DISTINCT i.order_key) AS order_count
         |  FROM w_fct_orders_items i JOIN w_dim_part p ON i.part_key = p.part_key
         |  GROUP BY 1, 2, 3, 4)
         |, r_pranked AS (SELECT *,
         |    SUM(total_revenue_d) OVER () AS grand_total_d,
         |    SUM(total_revenue_d) OVER (ORDER BY total_revenue_d DESC) AS running_total_d,
         |    CAST(ROW_NUMBER() OVER (ORDER BY total_revenue_d DESC, part_key) AS INT) AS revenue_rank
         |  FROM r_prev)
         |SELECT revenue_rank, part_key, part_name, part_type_name, part_brand_name,
         |  ${d("total_revenue_d")} AS total_revenue,
         |  ${d("total_quantity_d")} AS total_quantity,
         |  order_count,
         |  ${rnd(dv("total_revenue_d", "grand_total_d") + " * 100", 4)} AS pct_of_revenue,
         |  ${rnd(dv("running_total_d", "grand_total_d") + " * 100", 2)} AS cumulative_pct,
         |  CASE WHEN ${dv("running_total_d", "grand_total_d")} <= 0.80 THEN 'A'
         |       WHEN ${dv("running_total_d", "grand_total_d")} <= 0.95 THEN 'B'
         |       ELSE 'C' END AS abc_class
         |FROM r_pranked ORDER BY revenue_rank""".stripMargin),
    "part_sales_velocity" -> e(
      ctx => outD(Reports.partSalesVelocity(ctx)).orderBy("part_key"),
      s""", r_pm AS (SELECT part_key, CAST(date_trunc('month', order_date) AS DATE) AS order_month,
         |    SUM(quantity) AS monthly_units_d,
         |    SUM(gross_item_sales_amount) AS monthly_revenue_d
         |  FROM w_fct_orders_items GROUP BY 1, 2)
         |, r_pstats AS (SELECT part_key,
         |    COUNT(DISTINCT order_month) AS active_months,
         |    SUM(monthly_units_d) AS total_units_d,
         |    SUM(monthly_revenue_d) AS total_revenue_d,
         |    ${avgE("monthly_units_d")} AS avg_monthly_units,
         |    ${avgE("monthly_revenue_d")} AS avg_monthly_revenue
         |  FROM r_pm GROUP BY 1)
         |SELECT part_key, part_name, part_type_name, part_brand_name, active_months,
         |  total_units, total_revenue, avg_monthly_units, avg_monthly_revenue,
         |  velocity_quartile,
         |  CASE WHEN velocity_quartile = 4 THEN 'fast_mover'
         |       WHEN velocity_quartile = 3 THEN 'moderate'
         |       WHEN velocity_quartile = 2 THEN 'slow_mover'
         |       ELSE 'very_slow' END AS velocity_category
         |FROM (SELECT ps.part_key, p.part_name, p.part_type_name, p.part_brand_name,
         |        ps.active_months,
         |        ${d("ps.total_units_d")} AS total_units,
         |        ${d("ps.total_revenue_d")} AS total_revenue,
         |        ${rnd("ps.avg_monthly_units", 2)} AS avg_monthly_units,
         |        ${rnd("ps.avg_monthly_revenue", 2)} AS avg_monthly_revenue,
         |        CAST(NTILE(4) OVER (ORDER BY ps.avg_monthly_units, ps.part_key) AS INT) AS velocity_quartile
         |      FROM r_pstats ps JOIN w_dim_part p ON ps.part_key = p.part_key) v
         |ORDER BY part_key""".stripMargin),
    "regional_trade_balance" -> e(
      ctx => outD(Reports.regionalTradeBalance(ctx)).orderBy("nation"),
      s""", r_flows AS (SELECT s.supplier_nation_name AS exporter_nation,
         |    s.supplier_region_name AS exporter_region,
         |    c.customer_nation_name AS importer_nation,
         |    c.customer_region_name AS importer_region,
         |    SUM(i.gross_item_sales_amount) AS trade_value,
         |    SUM(i.quantity) AS trade_volume
         |  FROM w_fct_orders_items i
         |  JOIN w_dim_supplier s ON i.supplier_key = s.supplier_key
         |  JOIN w_dim_customer c ON i.customer_key = c.customer_key
         |  GROUP BY 1, 2, 3, 4)
         |, r_exp AS (SELECT exporter_nation AS nation, exporter_region AS region,
         |    SUM(trade_value) AS export_value_d, SUM(trade_volume) AS export_volume_d
         |  FROM r_flows WHERE exporter_nation != importer_nation GROUP BY 1, 2)
         |, r_imp AS (SELECT importer_nation AS nation, importer_region AS region,
         |    SUM(trade_value) AS import_value_d, SUM(trade_volume) AS import_volume_d
         |  FROM r_flows WHERE exporter_nation != importer_nation GROUP BY 1, 2)
         |, r_dom AS (SELECT exporter_nation AS nation, exporter_region AS region,
         |    SUM(trade_value) AS domestic_value_d, SUM(trade_volume) AS domestic_volume_d
         |  FROM r_flows WHERE exporter_nation = importer_nation GROUP BY 1, 2)
         |SELECT COALESCE(e.nation, i.nation, d.nation) AS nation,
         |  COALESCE(e.region, i.region, d.region) AS region,
         |  COALESCE(${d("e.export_value_d")}, 0) AS export_value,
         |  COALESCE(${d("i.import_value_d")}, 0) AS import_value,
         |  COALESCE(${d("d.domestic_value_d")}, 0) AS domestic_value,
         |  ${d("COALESCE(e.export_value_d, 0) - COALESCE(i.import_value_d, 0)")} AS trade_balance,
         |  COALESCE(${d("e.export_volume_d")}, 0) AS export_volume,
         |  COALESCE(${d("i.import_volume_d")}, 0) AS import_volume,
         |  COALESCE(${d("d.domestic_volume_d")}, 0) AS domestic_volume,
         |  ${rnd(dv("COALESCE(d.domestic_value_d, 0) * 100", "NULLIF(COALESCE(e.export_value_d, 0) + COALESCE(i.import_value_d, 0) + COALESCE(d.domestic_value_d, 0), 0)"), 2)} AS domestic_share_pct,
         |  CASE WHEN COALESCE(e.export_value_d, 0) > COALESCE(i.import_value_d, 0) THEN 'surplus'
         |       WHEN COALESCE(e.export_value_d, 0) < COALESCE(i.import_value_d, 0) THEN 'deficit'
         |       ELSE 'balanced' END AS trade_position
         |FROM r_exp e
         |FULL OUTER JOIN r_imp i ON e.nation = i.nation
         |FULL OUTER JOIN r_dom d ON COALESCE(e.nation, i.nation) = d.nation
         |ORDER BY nation""".stripMargin),
    "repeat_purchase_analysis" -> e(
      ctx => outD(Reports.repeatPurchaseAnalysis(ctx)).orderBy("order_sequence"),
      s""", r_seq AS (SELECT customer_key, order_key, order_date, gross_item_sales_amount,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY customer_key ORDER BY order_date, order_key) AS INT) AS order_sequence,
         |    LAG(order_date) OVER (PARTITION BY customer_key ORDER BY order_date, order_key) AS prev_order_date
         |  FROM w_fct_orders)
         |, r_gaps2 AS (SELECT *, CAST(order_date - prev_order_date AS INT) AS days_since_prev_order
         |  FROM r_seq)
         |SELECT order_sequence, COUNT(*) AS order_count,
         |  COUNT(DISTINCT customer_key) AS customer_count,
         |  ${rnd(avgE("gross_item_sales_amount"), 2)} AS avg_order_value,
         |  ${rnd(avgE("days_since_prev_order"), 1)} AS avg_days_since_prev,
         |  CAST(SUM(CASE WHEN days_since_prev_order <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS repeat_within_30d,
         |  CAST(SUM(CASE WHEN days_since_prev_order <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS repeat_within_60d,
         |  CAST(SUM(CASE WHEN days_since_prev_order <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS repeat_within_90d
         |FROM r_gaps2 GROUP BY 1 ORDER BY 1""".stripMargin),
    "supplier_revenue_ranking" -> e(
      ctx => outD(Reports.supplierRevenueRanking(ctx)).orderBy("supplier_key"),
      s""", r_sr AS (SELECT i.supplier_key, s.supplier_name, s.supplier_nation_name,
         |    s.supplier_region_name,
         |    SUM(i.gross_item_sales_amount) AS total_revenue_d,
         |    COUNT(DISTINCT i.order_key) AS order_count,
         |    COUNT(DISTINCT i.part_key) AS parts_sold
         |  FROM w_fct_orders_items i JOIN w_dim_supplier s ON i.supplier_key = s.supplier_key
         |  GROUP BY 1, 2, 3, 4)
         |, r_nt AS (SELECT supplier_nation_name, SUM(total_revenue_d) AS nation_total_revenue_d
         |  FROM r_sr GROUP BY 1)
         |SELECT sr.supplier_key, sr.supplier_name, sr.supplier_nation_name,
         |  sr.supplier_region_name,
         |  ${d("sr.total_revenue_d")} AS total_revenue,
         |  sr.order_count, sr.parts_sold,
         |  CAST(RANK() OVER (ORDER BY sr.total_revenue_d DESC) AS INT) AS global_rank,
         |  CAST(RANK() OVER (PARTITION BY sr.supplier_nation_name ORDER BY sr.total_revenue_d DESC) AS INT) AS nation_rank,
         |  ${d("nt.nation_total_revenue_d")} AS nation_total_revenue,
         |  ${rnd(dv("sr.total_revenue_d", "nt.nation_total_revenue_d") + " * 100", 2)} AS nation_market_share_pct,
         |  ${rnd(dv("sr.total_revenue_d", "SUM(sr.total_revenue_d) OVER ()") + " * 100", 4)} AS global_market_share_pct
         |FROM r_sr sr JOIN r_nt nt ON sr.supplier_nation_name = nt.supplier_nation_name
         |ORDER BY sr.supplier_key""".stripMargin),
    "supply_chain_network" -> e(
      ctx => outD(Reports.supplyChainNetwork(ctx))
        .orderBy("supplier_key", "part_key", "customer_key"),
      s""", r_edges AS (SELECT supplier_key, part_key, customer_key,
         |    COUNT(*) AS shipment_count,
         |    SUM(quantity) AS total_quantity_d,
         |    SUM(gross_item_sales_amount) AS total_revenue_d
         |  FROM w_fct_orders_items GROUP BY 1, 2, 3)
         |SELECT e.supplier_key, s.supplier_name,
         |  s.supplier_nation_name AS supplier_nation,
         |  e.part_key, p.part_name, p.part_type_name,
         |  e.customer_key, c.customer_name,
         |  c.customer_nation_name AS customer_nation,
         |  e.shipment_count,
         |  ${d("e.total_quantity_d")} AS total_quantity,
         |  ${d("e.total_revenue_d")} AS total_revenue,
         |  CASE WHEN s.supplier_nation_name = c.customer_nation_name THEN 'domestic'
         |       WHEN s.supplier_region_name = c.customer_region_name THEN 'intra_regional'
         |       ELSE 'inter_regional' END AS trade_type
         |FROM r_edges e
         |JOIN w_dim_supplier s ON e.supplier_key = s.supplier_key
         |JOIN w_dim_part p ON e.part_key = p.part_key
         |JOIN w_dim_customer c ON e.customer_key = c.customer_key
         |ORDER BY 1, 4, 7""".stripMargin),
    "tax_and_discount_leakage" -> e(
      ctx => outD(Reports.taxAndDiscountLeakage(ctx)).orderBy("region_name", "nation_name"),
      s"""SELECT c.customer_region_name AS region_name,
         |  c.customer_nation_name AS nation_name,
         |  COUNT(*) AS line_item_count,
         |  ${sumD("i.gross_item_sales_amount")} AS gross_revenue,
         |  ${sumD("ABS(i.item_discount_amount)")} AS total_discounts,
         |  ${sumD("i.item_tax_amount")} AS total_tax,
         |  ${sumD("i.net_item_sales_amount")} AS net_revenue,
         |  ${rnd(dv("SUM(ABS(i.item_discount_amount))", "NULLIF(SUM(i.gross_item_sales_amount), 0)") + " * 100", 2)} AS discount_rate_pct,
         |  ${rnd(dv("SUM(i.item_tax_amount)", "NULLIF(SUM(i.gross_item_sales_amount), 0)") + " * 100", 2)} AS effective_tax_rate_pct,
         |  ${rnd(dv("SUM(i.net_item_sales_amount)", "NULLIF(SUM(i.gross_item_sales_amount), 0)") + " * 100", 2)} AS net_retention_pct
         |FROM w_fct_orders_items i
         |JOIN w_dim_customer c ON i.customer_key = c.customer_key
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
  )

  /** partsupp- and delivery-date-dependent models (synthesized inputs). */
}
