package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest→serve→compact lifecycle measurement for the persisted IVFADC
  * index — the evidence behind `AnnIndex.compact`: a streaming-ingested
  * index accretes one file set per microbatch (`AnnIndex.add` appends),
  * so the serving scan's file fan-out grows linearly with batches until a
  * compaction collapses it. This tool measures that degradation and its
  * repair on one corpus, within one session (epoch-fair ratios):
  *
  *   1. build the index, time a query batch (`serve_built`);
  *   2. ingest `batches` × (n/`batchDenom`) vectors through
  *      [[graft.extensions.AnnIndex.add]], recording per-add seconds and
  *      the coded manifest's file count as it grows;
  *   3. time the same query batch against the fragmented index
  *      (`serve_fragmented`);
  *   4. [[graft.extensions.AnnIndex.compact]], then time it again
  *      (`serve_compacted`) — the claim is serve_compacted ≈ serve_built
  *      scaled for the larger corpus, and the delta to serve_fragmented
  *      is the small-files tax.
  *
  * Env: SPARK_GRAFT_ALB_SF (default 10), SPARK_GRAFT_ALB_BATCHES (default
  * 20), SPARK_GRAFT_ALB_BATCH_DENOM (default 100 — each batch is 1% of
  * the corpus), SPARK_GRAFT_ALB_CELLS (512), SPARK_GRAFT_CPUS. */
object AnnLifecycleBench {

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_ALB_SF", "10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_ALB_BATCHES", "20").toInt
    val batchDenom = sys.env.getOrElse("SPARK_GRAFT_ALB_BATCH_DENOM", "100").toInt
    val nCells = sys.env.getOrElse("SPARK_GRAFT_ALB_CELLS", "512").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_ALB_DIR", "/tmp/graft_ann_lifecycle")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Scratch.resolve(Scratch.SweepFootprint))
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "256m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = Ctx(spark, s"synth:sf=$sf")

    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmTree)
      f.delete(); ()
    }
    rmTree(new java.io.File(dir))
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val n = ctx.tbl("embeddings").count()
    val (_, buildSec) = timed {
      extensions.AnnIndex.build(ctx, dir, nCells, 256)
    }
    val queries = ctx.tbl("embeddings")
      .filter(col("vec_id") > n - 100)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    def serve(): (Long, Double) = timed {
      val out = extensions.AnnIndex.query(spark, dir, queries,
        k = 10, nprobe = 16, shortlist = 400)
      out.select(xxhash64(out.columns.map(col): _*).as("__h"))
        .agg(count(lit(1)), expr("bit_xor(__h)")).head().getLong(0)
    } match { case (rows, sec) => (rows, sec) }

    val (rowsBuilt, serveBuilt) = serve()
    System.err.println(f"[lifecycle] built n=$n in $buildSec%.1f s, serve $serveBuilt%.1f s")

    val batchN = math.max(1L, n / batchDenom)
    val addSecs = (0 until nBatches).map { i =>
      val batch = ctx.tbl("embeddings")
        .orderBy("vec_id").limit(batchN.toInt)
        .select((col("vec_id") + n * (i + 1)).as("vec_id"), col("embedding"))
      val (_, s) = timed(extensions.AnnIndex.add(spark, dir, batch, batchId = i.toLong))
      s
    }
    val filesFragmented = Versioned.readManifest(spark, s"$dir/coded").files.size
    val (rowsFrag, serveFragmented) = serve()
    System.err.println(f"[lifecycle] after $nBatches adds: $filesFragmented coded files, " +
      f"serve $serveFragmented%.1f s")

    val compactFiles = sys.env.getOrElse("SPARK_GRAFT_ALB_COMPACT_FILES", "8").toInt
    val (_, compactSec) = timed(extensions.AnnIndex.compact(spark, dir, nFiles = compactFiles))
    val filesCompacted = Versioned.readManifest(spark, s"$dir/coded").files.size
    val (rowsComp, serveCompacted) = serve()
    require(rowsFrag == rowsComp,
      s"compact changed the serving result: $rowsFrag vs $rowsComp rows")
    System.err.println(f"[lifecycle] compacted to $filesCompacted files in " +
      f"$compactSec%.1f s, serve $serveCompacted%.1f s")

    val addJson = addSecs.map(s => f"$s%.2f").mkString("[", ",", "]")
    println(s"""{"metric":"ann_lifecycle","sf":$sf,"n_vectors":$n,"cells":$nCells,"batches":$nBatches,"batch_rows":$batchN,"build_sec":$buildSec,"serve_built_sec":$serveBuilt,"add_secs":$addJson,"files_fragmented":$filesFragmented,"serve_fragmented_sec":$serveFragmented,"compact_sec":$compactSec,"files_compacted":$filesCompacted,"serve_compacted_sec":$serveCompacted,"result_rows":$rowsBuilt,"cpus":$cpus,"host_page_mbps":${HostProbe.pageMBps()}}""")
    spark.stop()
  }
}
