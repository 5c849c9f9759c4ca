package graft.extensions

import graft.{Ctx, Macros => M}
import graft.layers.Wh
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics surface beyond the reference's flat GROUP BYs: grouping-set
  * (ROLLUP) subtotals and distribution-position window functions
  * (percent_rank / cume_dist), both expressed scale-first.
  *
  * No reference counterpart file — the reference (dbt models, see
  * models/metrics/metrics_regional_revenue.sql:1-24 for the flat twin of
  * the rollup here) always aggregates at a single grain; warehouse users
  * routinely need the subtotal/grand-total levels in one pass, which is
  * exactly what Catalyst's Expand-based ROLLUP gives without re-scanning
  * per level.
  */
object Analytics {
  import M._

  /** Revenue at three grains in one pass — (region, nation), region
    * subtotal, grand total — via ROLLUP. Catalyst plans this as a single
    * Expand (3 rows per input row) feeding one hash aggregate: one scan,
    * one shuffle, partial-aggregatable, so it scales exactly like the flat
    * groupBy. GROUPING() flags distinguish a subtotal row from a genuine
    * NULL group, and double as the deterministic sort level. */
  def regionalRevenueRollup(ctx: Ctx): DataFrame = {
    // DetectAmbiguousSelfJoin misfires on rollup()+grouping() over a child
    // whose lineage contains a genuine self-join (fct_orders joins orders
    // against an orders_items aggregate that itself reads orders): the
    // grouping-sets expansion duplicates the child's attribute references
    // and the detector counts the dataset twice. The references here are
    // semantically unambiguous — each grouping name exists exactly once in
    // scope — so suspend the guard for this one (eager) analysis.
    val conf = ctx.spark.conf
    val key = "spark.sql.analyzer.failAmbiguousSelfJoin"
    val prev = conf.get(key, "true")
    conf.set(key, "false")
    try
      Wh.fctOrders(ctx)
        .join(Wh.dimCustomer(ctx), Seq("customer_key"))
        .select(
          col("customer_region_name").as("region_name"),
          col("customer_nation_name").as("nation_name"),
          col("order_key"), col("customer_key"),
          col("gross_item_sales_amount"), col("net_item_sales_amount"))
        .rollup("region_name", "nation_name")
        .agg(
          grouping(col("region_name")).cast("int").as("region_subtotal"),
          grouping(col("nation_name")).cast("int").as("nation_subtotal"),
          countDistinct(col("order_key")).as("order_count"),
          countDistinct(col("customer_key")).as("customer_count"),
          sum("gross_item_sales_amount").cast("double").as("gross_revenue"),
          sum("net_item_sales_amount").cast("double").as("net_revenue"))
    finally conf.set(key, prev)
  }

  /** Per-customer spend with PERCENT_RANK / CUME_DIST over the whole
    * customer population — the textbook single-partition global window,
    * rebuilt on [[graft.operators.Scale.globalOrder]]'s two-phase row
    * number so no task ever sees the full relation:
    *
    *   - rank        = min row number in the spend tie-group (one shuffle
    *                   keyed on the tie value);
    *   - percent_rank = (rank - 1) / (N - 1) — both engines evaluate the
    *                   same exact-integer ratio in IEEE double;
    *   - cume_dist   = (max row number in the tie-group) / N.
    */
  def customerValuePercentiles(ctx: Ctx): DataFrame = {
    val spend = Wh.fctOrders(ctx)
      .groupBy("customer_key")
      .agg(
        count(lit(1)).as("order_count"),
        sum("gross_item_sales_amount").as("spend_d"))
    val g = graft.operators.Scale.globalOrder(spend,
      order = Seq(col("spend_d").desc, col("customer_key")),
      rn = Some("__rn"), totalCount = Some("__n"))
    val tie = Window.partitionBy(col("spend_d"))
    g.withColumn("spend_rank",
        graft.operators.Scale.rankFromRowNumber(col("__rn"), Seq(col("spend_d"))))
      .withColumn("__tie_max", max(col("__rn")).over(tie))
      .select(
        col("customer_key"),
        col("spend_d").cast("double").as("total_spend"),
        col("order_count"),
        col("spend_rank"),
        when(col("__n") === 1, lit(0.0))
          .otherwise(dv(col("spend_rank") - 1, col("__n") - 1)).as("pct_rank"),
        dv(col("__tie_max"), col("__n")).as("cume_dist_val"))
  }
}
