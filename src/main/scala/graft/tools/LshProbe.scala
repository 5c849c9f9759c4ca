package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Occupancy/recall probe for the adaptive-grid LSH pair scan: at SF N,
  * report the bucket-occupancy distribution, the candidate-pair mass
  * (sum occ·(occ−1)/2 — the join's true output driver), the verified-pair
  * output count, and the recall a per-bucket member cap would trade away.
  * Evidence tool behind the `ann_lsh_buckets_wide` scaling decision. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_PIPE_SF", "2")
    val cap = sys.env.getOrElse("SPARK_GRAFT_LSH_CAP", "128").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.Scratch.resolve(graft.Scratch.SweepFootprint))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = Ctx(spark, s"synth:sf=$sf")
    graft.functions.LshSign.register(spark)
    graft.functions.CosineSim.register(spark)

    val n = ctx.tbl("embeddings").count()
    val bits = math.min(24, math.max(8, math.ceil(
      math.log(n / 16.0) / math.log(2)).toInt))
    val e = ctx.tbl("embeddings").select(col("vec_id"),
      expr(s"substring(lsh_sign(embedding, 24, 23), 1, $bits)").as("bucket"))
    val occ = e.groupBy("bucket").agg(count(lit(1)).as("occ"))
    occ.persist()
    val top = occ.orderBy(desc("occ")).limit(10).collect()
      .map(r => r.getLong(1)).mkString(",")
    val pairMass = occ.agg(sum(expr("occ * (occ - 1) div 2"))).head().getLong(0)
    val cappedMass = occ.agg(sum(expr(
      s"least(occ, $cap) * (least(occ, $cap) - 1) div 2"))).head().getLong(0)
    occ.unpersist()

    val full = extensions.Similarity.annLshBucketsWide(ctx)
      .select("vec_a", "vec_b").persist()
    val outRows = full.count()
    // capped variant: keep only the first `cap` members (by vec_id) of
    // each bucket before pairing — recall = surviving verified pairs
    val kept = e.withColumn("rn",
        row_number().over(Window.partitionBy("bucket").orderBy("vec_id")))
      .filter(col("rn") <= cap).select("vec_id")
    val capped = full
      .join(kept.withColumnRenamed("vec_id", "vec_a"), Seq("vec_a"))
      .join(kept.withColumnRenamed("vec_id", "vec_b"), Seq("vec_b"))
      .count()
    full.unpersist()
    println(s"""{"metric":"lsh_probe","sf":$sf,"n":$n,"bits":$bits,"cap":$cap,"top_occ":[$top],"cand_pairs":$pairMass,"cand_pairs_capped":$cappedMass,"out_pairs":$outRows,"out_pairs_capped":$capped,"recall_at_cap":${if (outRows == 0) 1.0 else capped.toDouble / outRows}}""")
    spark.stop()
  }
}
