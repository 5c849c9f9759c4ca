package graft.tools
import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ReportProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // mirror the BenchScale build session so probed plans match built ones
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "128")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "256m")
      .config("spark.local.dir", Scratch.resolve(Scratch.SweepFootprint))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = "/tmp/graft_sf10r"
    val b = s"$work/__build"
    val ctx = Ctx(spark, work)
    val hk = Seq("dim_customer", "dim_supplier", "dim_part_supplier_xrf",
      "fct_orders", "fct_orders_items")
    val plain = Seq("orders_items", "parts_suppliers")
    val rollups = Seq("rollup_customer_orders", "rollup_customer_month",
      "rollup_part_month", "rollup_supplier_sales", "rollup_nation_flows")
    (hk ++ plain).foreach { n =>
      Store.table(ctx, n) {
        val pq = spark.read.parquet(s"$b/$n")
        if (hk.contains(n)) pq.drop("dbt_batch_id", "dbt_batch_ts") else pq
      }
    }
    rollups.foreach { n =>
      Store.table(ctx, n)(spark.read.parquet(s"$b/_rollups/$n"))
    }
    println("rollup_part_month rows: " +
      spark.read.parquet(s"$b/_rollups/rollup_part_month").count())
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$name%-38s ${(System.nanoTime()-t0)/1e9}%7.1f s")
    }
    val models = sys.env.getOrElse("PROBE_MODELS",
      "supply_chain_network,inventory_turnover,supplier_lead_time_distribution,metrics_supplier_reliability,part_type_performance,customer_concentration_risk,supplier_concentration_risk,tax_and_discount_leakage,discount_depth_analysis,fulfillment_priority_analysis,repeat_purchase_analysis,discount_effectiveness")
      .split(",").toSeq
    models.foreach { n =>
      val df = Registry.all(n).fn(ctx)
      t(s"$n compute")(
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).collect())
      t(s"$n write")(
        df.write.mode("overwrite").parquet(s"/tmp/probe_out/$n"))
    }
    spark.stop()
  }
}
