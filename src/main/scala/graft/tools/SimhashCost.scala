package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for dedup_simhash_near at SF N: memo build, the cost-based
  * path choice's mass aggregation, and the chosen path — attributes the
  * SF100 sweep delta between the pre-choice record and the cost-based
  * version to its actual source. */
object SimhashCost {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_PIPE_SF", "100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.Scratch.resolve(graft.Scratch.SweepFootprint))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ctx = Ctx(spark, s"synth:sf=$sf")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val sim = extensions.Text.dedupSimhash(ctx).select("doc_id", "simhash")
    timed("1 simhash memo build (count)")(sim.count())
    val chunks = sim.select(expr(
      """stack(3,
        |  0, substring(simhash, 1, 22),
        |  1, substring(simhash, 23, 21),
        |  2, substring(simhash, 44, 21)) AS (chunk_idx, chunk_val)""".stripMargin))
    val mass = timed("2 chunk-mass aggregation") {
      chunks.groupBy("chunk_idx", "chunk_val")
        .agg(count(lit(1)).as("o"))
        .agg(sum(expr("o * (o - 1) div 2"))).head().getLong(0)
    }
    println(s"  mass=$mass")
    timed("3 dedupSimhashNear (count-pruned)") {
      val df = extensions.Text.dedupSimhashNear(ctx)
      println(s"  pairs=${df.count()}")
    }
    timed("4 bench-shaped output hash") {
      // the sweep harness's forcing action: xxhash64 over ALL columns —
      // materializes the 64-char signature strings for every output pair
      val df = extensions.Text.dedupSimhashNear(ctx)
      df.select(xxhash64(df.columns.map(col): _*).as("__h"))
        .agg(expr("bit_xor(__h)")).collect()
    }
    spark.stop()
  }
}
