package graft.tools

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-session A/B of the shingle-set array build — the base relation every
  * text-dedup operator shares, and the largest remaining piece of the SF100
  * dedup leg after the native signature expression:
  *   A. explode -> distinct -> groupBy collect_list (two pair-sized
  *      shuffles: one keyed (doc_id, shingle), one keyed doc_id);
  *   B. explode -> groupBy collect_set (ONE shuffle; map-side partial sets
  *      dedup in place, and with doc-local input partitions the exchange
  *      moves one set-row per doc instead of every pair).
  * All consumers are order-insensitive (mins / size / intersect-size /
  * re-explodes), so the two are semantically interchangeable. */
object ShingleAb {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_PIPE_SF", "10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.Scratch.resolve(graft.Scratch.SweepFootprint))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ctx = Ctx(spark, s"synth:sf=$sf")
    def base: DataFrame = extensions.Text.shinglePairs(ctx)

    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)), sum(size(col("shingles"))),
        min(expr("array_min(shingles)"))).head()
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e9}%8.1f s  " +
        s"docs=${r.getLong(0)} shingles=${r.getLong(1)} min=${r.getString(2)}")
    }

    def varA: DataFrame = base.distinct()
      .groupBy("doc_id").agg(collect_list(col("shingle")).as("shingles"))

    def varB: DataFrame = base
      .groupBy("doc_id").agg(collect_set(col("shingle")).as("shingles"))

    (1 to 2).foreach { round =>
      t(s"A dist+list r$round")(varA)
      t(s"B set      r$round")(varB)
    }
    spark.stop()
  }
}
