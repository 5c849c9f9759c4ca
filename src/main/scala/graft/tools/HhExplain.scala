package graft.tools
import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HhExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FreqItemsSketch.register(spark)
    val ctx = Ctx(spark, "synth:sf=0.1")
    val toks = extensions.Text.docsTok(ctx).select(explode(col("toks")).as("tok"))
    import spark.implicits._
    val candDf = Seq(("the", 100L), ("a", 100L)).toDF("tok", "n")
    println("=== join_count plan ===")
    toks.join(broadcast(candDf.select("tok")), Seq("tok"))
      .agg(count(lit(1))).explain("formatted")
    println("=== filter_group plan ===")
    toks.filter(col("tok").isInCollection(Seq("the", "a")))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt")).explain("formatted")
    spark.stop()
  }
}
