package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost breakdown for `dedup_minhash_lsh` at SF N — the
  * dominant leg of the SF100 pipeline sweep (250.7 s of 615.3 total).
  * Times each stage in dependency order against the same session so the
  * deltas attribute honestly:
  *   1. shingleArr materialization (explode + distinct + collect_list);
  *   2. the 16 md5 min-hash signature columns;
  *   3. band-bucket occupancy / candidate-pair mass (is it output-bound?);
  *   4. the full query (adds the exact-Jaccard verify join).
  */
object MinhashProbe {
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

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-42s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val docArr = extensions.Text.shingleArr(ctx)
    val (nDocs, nShingles) = timed("1 shingleArr (explode+distinct+collect)") {
      val r = docArr.agg(count(lit(1)), sum(size(col("shingles")))).head()
      (r.getLong(0), r.getLong(1))
    }
    println(s"  docs=$nDocs total_shingles=$nShingles avg=${nShingles / math.max(1, nDocs)}")

    val sig = extensions.Text.minhash16(docArr)
    timed("2 min-hash signatures (all 16 columns)") {
      sig.agg((0 until 16).map(i => min(col(s"h$i"))).head,
        (1 until 16).map(i => min(col(s"h$i"))): _*).head()
    }

    val bandRows = sig.select(col("doc_id"), expr(
      """stack(4,
        |  0, md5(concat(h0, h1, h2, h3)),
        |  1, md5(concat(h4, h5, h6, h7)),
        |  2, md5(concat(h8, h9, h10, h11)),
        |  3, md5(concat(h12, h13, h14, h15))) AS (band_idx, band_hash)""".stripMargin))
    val occ = bandRows.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("occ")).persist()
    timed("3 band occupancy + candidate mass") {
      val mass = occ.agg(sum(expr("occ * (occ - 1) div 2"))).head().getLong(0)
      val top = occ.orderBy(desc("occ")).limit(5).collect()
        .map(_.getLong(2)).mkString(",")
      println(s"  candidate_mass=$mass top_bucket_occ=[$top]")
    }
    occ.unpersist()

    timed("4 full dedup_minhash_lsh") {
      val out = extensions.Text.dedupMinhashLsh(ctx)
      val r = out.agg(count(lit(1)),
        sum(when(col("is_near_duplicate"), 1).otherwise(0))).head()
      println(s"  pairs=${r.getLong(0)} near_dups=${r.getLong(1)}")
    }
    spark.stop()
  }
}
