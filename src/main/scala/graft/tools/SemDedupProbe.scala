package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the SemDeDup pipeline (extensions.AnnIndex
  * .semanticDedupPipeline — r12's dedup_semantic): build the persisted
  * index at the registry shape (ceil(sqrt(N)) cells) and serve the
  * within-cell prune, timing the two halves separately at increasing SF.
  *
  * The HONEST scale statement this artifact exists to record: with
  * sqrt(N) cells, expected cell occupancy is sqrt(N), so the within-cell
  * pair scan is Θ(N^1.5) — SUPER-linear by design (5x data → ~11x pair
  * work). That is the published SemDeDup shape (pairwise cosines inside
  * each cluster); the knob that buys linearity is cell count ∝ N (fixed
  * occupancy), at the price of a heavier coarse-assignment pass —
  * `SPARK_GRAFT_SEMDEDUP_OCC` switches this probe to a fixed-occupancy
  * build so both postures are measured, and the triangle-split pair plan
  * (Similarity.bucketSelfPairs) keeps any one hot cell from funneling a
  * single task either way.
  *
  * Env: SPARK_GRAFT_SEMDEDUP_SFS (default "10,50"), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SEMDEDUP_OCC (unset = sqrt cells; an integer = fixed
  * occupancy target), SPARK_GRAFT_SEMDEDUP_DIR. */
object SemDedupProbe {

  def main(args: Array[String]): Unit = {
    val sfs = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_SFS", "10,50")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val occ = sys.env.get("SPARK_GRAFT_SEMDEDUP_OCC").map(_.toInt)
    val base = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_DIR", "/tmp/graft_semdedup_probe")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Scratch.resolve(Scratch.SweepFootprint))
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmTree)
      f.delete(); ()
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val legs = sfs.map { sf =>
      val ctx = Ctx(spark, s"synth:sf=$sf")
      val dir = s"$base/sf$sf${occ.map("_occ" + _).getOrElse("")}"
      rmTree(new java.io.File(dir))
      val n = ctx.tbl("embeddings").count()
      val nCells = occ match {
        case Some(o) => (n / o).toInt
        case None    => math.ceil(math.sqrt(n.toDouble)).toInt
      }
      val (_, buildSec) = timed(extensions.AnnIndex.build(ctx, dir, nCells = nCells))
      val ((rows, drops), serveSec) = timed {
        val d = extensions.AnnIndex.semanticDedup(spark, dir)
        val r = d.agg(count(lit(1)),
          count(when(!col("keep"), lit(1)))).head()
        (r.getLong(0), r.getLong(1))
      }
      require(rows == n, s"decision rows $rows != corpus $n")
      System.err.println(f"[semdedup] sf=$sf n=$n cells=$nCells " +
        f"build=$buildSec%.1f s serve=$serveSec%.1f s drops=$drops")
      s"""{"sf":$sf,"n_vectors":$n,"cells_param":$nCells,"build_sec":${f"$buildSec%.2f"},"serve_sec":${f"$serveSec%.2f"},"rows":$rows,"drops":$drops,"host_page_mbps":${HostProbe.pageMBps()}}"""
    }
    println(s"""{"metric":"semdedup_probe","cpus":$cpus,"occupancy":${occ.getOrElse(0)},"legs":[${legs.mkString(",")}]}""")
    spark.stop()
  }
}
