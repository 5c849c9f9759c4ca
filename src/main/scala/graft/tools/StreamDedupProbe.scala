package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throughput probe for the streaming incremental dedup ingest
  * (streaming.Streams.dedupIngestSink — r11 verdict item 3): a synth
  * documents corpus splits 3:1 into an existing corpus and an arriving
  * backlog; the corpus's MinHash band index + shingle sets are
  * MATERIALIZED once (parquet, as the production ingest pipeline would
  * maintain them), then the backlog replays through the sink as an
  * 8-microbatch AvailableNow stream. Reported: docs/s drained end-to-end
  * (signature computation + band probe + exact verify + exactly-once
  * batch_id-partitioned sink) and the per-batch decision counts.
  *
  * Env: SPARK_GRAFT_SDP_SF (default 10 → 50k docs/SF... table-defined),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SDP_DIR. */
object StreamDedupProbe {

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SDP_SF", "10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val work = sys.env.getOrElse("SPARK_GRAFT_SDP_DIR", "/tmp/graft_stream_dedup")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Scratch.resolve(Scratch.SweepFootprint))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmTree)
      f.delete(); ()
    }
    rmTree(new java.io.File(work))

    val ctx = Ctx(spark, s"synth:sf=$sf")
    val docs = ctx.tbl("documents")
    val isBatch = col("doc_id") % 4 === 0

    // corpus side, materialized once (the ingest pipeline's maintained
    // tables): band index + shingle sets
    val t0 = System.nanoTime()
    val corpusArrDf = extensions.Text.shingleSetsOf(docs.filter(!isBatch))
    corpusArrDf.write.mode("overwrite").parquet(s"$work/corpus_shingles")
    val corpusArr = spark.read.parquet(s"$work/corpus_shingles")
    extensions.Text.bandRowsOf(corpusArr)
      .write.mode("overwrite").parquet(s"$work/corpus_bands")
    val corpusBands = spark.read.parquet(s"$work/corpus_bands")
    val corpusSec = (System.nanoTime() - t0) / 1e9
    val corpusDocs = corpusArr.count()

    // backlog staged as 8 files -> 8 microbatches (maxFilesPerTrigger=1)
    docs.filter(isBatch).repartition(8)
      .write.mode("overwrite").parquet(s"$work/backlog")
    val backlogDocs = spark.read.parquet(s"$work/backlog").count()
    val schema = spark.read.parquet(s"$work/backlog").schema

    val t1 = System.nanoTime()
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/backlog")
    val q = graft.streaming.Streams
      .dedupIngestSink(src, corpusBands, corpusArr,
        s"$work/decisions", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamSec = (System.nanoTime() - t1) / 1e9

    val dec = spark.read.parquet(s"$work/decisions")
    val r = dec.agg(count(lit(1)), count(when(!col("keep"), lit(1))),
      countDistinct(col("batch_id"))).head()
    require(r.getLong(0) == backlogDocs,
      s"decisions ${r.getLong(0)} != backlog $backlogDocs")
    val docsPerSec = backlogDocs / streamSec
    System.err.println(f"[streamdedup] corpus=$corpusDocs backlog=$backlogDocs " +
      f"batches=${r.getLong(2)} drops=${r.getLong(1)} " +
      f"corpus_prep=$corpusSec%.1f s stream=$streamSec%.1f s (${docsPerSec}%.0f docs/s)")
    println(s"""{"metric":"stream_dedup_ingest","sf":$sf,"cpus":$cpus,"corpus_docs":$corpusDocs,"backlog_docs":$backlogDocs,"batches":${r.getLong(2)},"drops":${r.getLong(1)},"corpus_prep_sec":${f"$corpusSec%.2f"},"stream_sec":${f"$streamSec%.2f"},"docs_per_sec":${f"$docsPerSec%.0f"},"host_page_mbps":${HostProbe.pageMBps()}}""")
    spark.stop()
  }
}
