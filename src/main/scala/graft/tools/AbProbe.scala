package graft.tools
import graft._
import graft.layers.Wh
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-session A/B of report plan shapes at SF10 (epoch-noise-free: both
  * variants run interleaved in one JVM against the same cached inputs,
  * with the build session's exact conf). Reads the `/tmp/graft_sf10r`
  * build output like ReportProbe. */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "128")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "256m")
      .config("spark.local.dir", Scratch.resolve(Scratch.SweepFootprint))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = "/tmp/graft_sf10r"
    val b = s"$work/__build"
    val ctx = Ctx(spark, work)
    Seq("dim_part", "fct_orders", "fct_orders_items").foreach { n =>
      Store.table(ctx, n)(
        spark.read.parquet(s"$b/$n").drop("dbt_batch_id", "dbt_batch_ts"))
    }
    import Macros._

    /** the pre-r7 single-pass form: one groupBy with 3 COUNT(DISTINCT)
      * (plans as Expand x4 over the fact) */
    def ptExpand: DataFrame =
      Wh.fctOrdersItems(ctx)
        .join(Wh.dimPart(ctx)
          .select("part_key", "part_type_name", "part_brand_name", "part_size"),
          Seq("part_key"))
        .groupBy(col("part_type_name"), col("part_brand_name"),
          when(col("part_size") <= 10, "small")
            .when(col("part_size") <= 30, "medium")
            .otherwise("large").as("size_category"))
        .agg(
          countDistinct(col("part_key")).as("part_count"),
          count(lit(1)).as("line_item_count"),
          countDistinct(col("order_key")).as("order_count"),
          countDistinct(col("customer_key")).as("customer_count"),
          sum("quantity").cast("double").as("total_units"),
          sum("gross_item_sales_amount").cast("double").as("total_revenue"),
          rnd(avgE(col("base_price")), 2).as("avg_unit_price"),
          rnd(avgE(col("discount_percentage")) * 100, 2).as("avg_discount_pct"),
          sum(col("gross_item_sales_amount") - col("supplier_cost_amount") * col("quantity"))
            .cast("double").as("total_profit"))

    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s  hash=$h%x")
    }
    /** candidate: sums at gk grain directly (map-side, ~free) + ONE narrow
      * distinct branch serving both order_count and customer_count */
    def ptNarrow: DataFrame = {
      val sizeCat = when(col("part_size") <= 10, "small")
        .when(col("part_size") <= 30, "medium")
        .otherwise("large").as("size_category")
      val dim = Wh.dimPart(ctx)
        .select(col("part_key"), col("part_type_name"), col("part_brand_name"), sizeCat)
      val fact = Wh.fctOrdersItems(ctx).select(
        "part_key", "order_key", "customer_key", "quantity",
        "gross_item_sales_amount", "base_price", "discount_percentage",
        "supplier_cost_amount")
      val gk = Seq("part_type_name", "part_brand_name", "size_category")
      val joined = fact.join(dim, Seq("part_key"))
      val sums = joined.groupBy(gk.map(col): _*).agg(
        count(lit(1)).as("line_item_count"),
        sum("quantity").cast("double").as("total_units"),
        sum("gross_item_sales_amount").cast("double").as("total_revenue"),
        rnd(avgE(col("base_price")), 2).as("avg_unit_price"),
        rnd(avgE(col("discount_percentage")) * 100, 2).as("avg_discount_pct"),
        sum(col("gross_item_sales_amount") - col("supplier_cost_amount") * col("quantity"))
          .cast("double").as("total_profit"))
      val ordCust = joined.select((gk :+ "order_key" :+ "customer_key").map(col): _*)
        .distinct()
        .groupBy(gk.map(col): _*)
        .agg(count(col("order_key")).as("order_count"),
          countDistinct(col("customer_key")).as("customer_count"))
        .select(gk.map(c => col(c).as(s"oc_$c")) :+ col("order_count") :+ col("customer_count"): _*)
      val partCounts = fact.select("part_key").distinct()
        .join(dim, Seq("part_key"))
        .groupBy(gk.map(col): _*)
        .agg(count(lit(1)).as("part_count"))
        .select(gk.map(c => col(c).as(s"pc_$c")) :+ col("part_count"): _*)
      sums
        .join(ordCust, gk.map(c => col(c) <=> col(s"oc_$c")).reduce(_ && _))
        .join(partCounts, gk.map(c => col(c) <=> col(s"pc_$c")).reduce(_ && _))
        .select(
          col("part_type_name"), col("part_brand_name"), col("size_category"),
          col("part_count"), col("line_item_count"), col("order_count"),
          col("customer_count"), col("total_units"), col("total_revenue"),
          col("avg_unit_price"), col("avg_discount_pct"), col("total_profit"))
    }

    // alternate A/B/A/B so drift hits both sides equally
    (1 to 2).foreach { round =>
      t(s"pt_staged r$round")(layers.Reports.partTypePerformance(ctx))
      t(s"pt_narrow r$round")(ptNarrow)
    }
    t("pt_expand r1")(ptExpand)
    spark.stop()
  }
}
