package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected queries.
  * Usage: runMain graft.Explain <sfDir> <query1,query2,...> */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("rpt_pricing_summary", "fct_orders_items", "metrics_regional_revenue")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.all(n).fn(Ctx(spark, sfDir)).explain("formatted")
    }
    spark.stop()
  }
}
