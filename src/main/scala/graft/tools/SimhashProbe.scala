package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Chunk-bucket occupancy probe for the SimHash pigeonhole join: at SF N,
  * report the (chunk_idx, chunk_val) occupancy distribution and the
  * candidate-pair mass it implies — the evidence behind the SF100 scaling
  * decision for `dedup_simhash_near`. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_PIPE_SF", "10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.Scratch.resolve(graft.Scratch.SweepFootprint))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = Ctx(spark, s"synth:sf=$sf")
    val sig = extensions.Text.dedupSimhash(ctx).select("doc_id", "simhash")
    val chunks = sig.select(expr(
      """stack(3,
        |  0, substring(simhash, 1, 22),
        |  1, substring(simhash, 23, 21),
        |  2, substring(simhash, 44, 21)) AS (chunk_idx, chunk_val)""".stripMargin))
    val occ = chunks.groupBy("chunk_idx", "chunk_val")
      .agg(count(lit(1)).as("occ")).persist()
    val n = sig.count()
    val top = occ.orderBy(desc("occ")).limit(10).collect()
      .map(r => s"[${r.getInt(0)},${r.getLong(2)}]").mkString(",")
    val mass = occ.agg(sum(expr("occ * (occ - 1) div 2"))).head().getLong(0)
    val distinctSigs = sig.select("simhash").distinct().count()
    // distance-0 OUTPUT floor: all pairs within identical-signature groups
    // are true near-dup output — if this is quadratic, the query is
    // output-bound and no candidate scheme helps
    val sigGroups = sig.groupBy("simhash").agg(count(lit(1)).as("o")).persist()
    val d0Floor = sigGroups.agg(sum(expr("o * (o - 1) div 2"))).head().getLong(0)
    val maxSigGroup = sigGroups.agg(max("o")).head().getLong(0)
    sigGroups.unpersist()
    occ.unpersist()

    // recursive multi-index (exact, double pigeonhole): buckets over `cap`
    // re-key by 3 sub-chunks of the complement bits; their pair mass is
    // the sum over (chunk, sub) sub-buckets instead of occ²
    val cap = sys.env.getOrElse("SPARK_GRAFT_SIMHASH_CAP", "1024").toLong
    val chunks2 = sig.select(col("doc_id"), col("simhash"), expr(
      """stack(3,
        |  0, substring(simhash, 1, 22), substring(simhash, 23, 42),
        |  1, substring(simhash, 23, 21), concat(substring(simhash, 1, 22), substring(simhash, 44, 21)),
        |  2, substring(simhash, 44, 21), substring(simhash, 1, 43))
        |  AS (chunk_idx, chunk_val, rest)""".stripMargin))
    val withOcc = chunks2.join(
      chunks2.groupBy("chunk_idx", "chunk_val").agg(count(lit(1)).as("occ")),
      Seq("chunk_idx", "chunk_val"))
    val smallMass = withOcc.filter(col("occ") <= cap)
      .groupBy("chunk_idx", "chunk_val").agg(count(lit(1)).as("o"))
      .agg(sum(expr("o * (o - 1) div 2"))).head().getLong(0)
    val bigSub = withOcc.filter(col("occ") > cap).select(
      col("chunk_idx"), col("chunk_val"), expr(
        """stack(3,
          |  0, substring(rest, 1, 14),
          |  1, substring(rest, 15, 14),
          |  2, substring(rest, 29, 15)) AS (sub_idx, sub_val)""".stripMargin))
    val bigOcc = bigSub.groupBy("chunk_idx", "chunk_val", "sub_idx", "sub_val")
      .agg(count(lit(1)).as("o")).persist()
    val bigMass = bigOcc.agg(sum(expr("o * (o - 1) div 2")))
      .head().getLong(0)
    val topSub = bigOcc.orderBy(desc("o")).limit(5).collect()
      .map(_.getLong(4)).mkString(",")
    bigOcc.unpersist()
    println(s"""{"metric":"simhash_probe","sf":$sf,"docs":$n,"distinct_sigs":$distinctSigs,"top_chunk_occ":[$top],"cand_pairs":$mass,"d0_output_floor":$d0Floor,"max_sig_group":$maxSigGroup,"cap":$cap,"recursive_small_mass":$smallMass,"recursive_big_mass":$bigMass,"top_sub_occ":[$topSub]}""")
    spark.stop()
  }
}
