package graft

import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental dedup (r11 verdict item 3): arriving micro-batches
  * probe a STATIC corpus band index — no corpus self-join per batch — and
  * the sink is exactly-once across a checkpoint restart (batch_id-keyed
  * dynamic-partition overwrite). Two properties pinned:
  *
  *  1. restart equivalence: stop the stream mid-replay, resume a NEW query
  *     from the checkpoint, final sink == an uninterrupted run's sink;
  *  2. batch-twin equivalence: per-doc decisions (batch_id dropped) are
  *     IDENTICAL to the batch core run over all streamed docs at once —
  *     decisions depend only on the corpus, so micro-batching must not
  *     change a single row.
  */
class StreamDedupSpec extends SparkSpec {

  test("streaming dedup vs corpus index: exactly-once restart, batch-twin identical") {
    val work = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val docs = ctx.tbl("documents")
    val isBatch = col("doc_id") % 4 === 0
    val corpusDocs = docs.filter(!isBatch)
    val batchDocs = docs.filter(isBatch)

    val corpusArr = extensions.Text.shingleSetsOf(corpusDocs)
    val corpusBands = extensions.Text.bandRowsOf(corpusArr)

    // stage the stream input as 8 files with deterministic mtime order so
    // both executions see identical batch boundaries (house pattern of
    // StreamRecoverySpec)
    val staging = s"$work/staging"
    batchDocs.repartition(8).write.mode("overwrite").parquet(staging)
    val parts = new java.io.File(staging).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length == 8)
    def place(dir: String, files: Seq[java.io.File], t0: Long): Unit = {
      new java.io.File(dir).mkdirs()
      files.zipWithIndex.foreach { case (f, i) =>
        val dst = new java.io.File(dir, f.getName)
        java.nio.file.Files.copy(f.toPath, dst.toPath)
        dst.setLastModified(t0 + i * 1000L)
      }
    }
    val schema = spark.read.parquet(staging).schema
    def run(dir: String, ckpt: String, sink: String): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2").parquet(dir)
      val q = Streams.dedupIngestSink(src, corpusBands, corpusArr, sink, ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val now = System.currentTimeMillis() - 3600 * 1000L
    // phase A: half the backlog; phase B: a NEW query resumes the checkpoint
    place(s"$work/in", parts.take(4).toSeq, now)
    run(s"$work/in", s"$work/ckpt", s"$work/sink")
    place(s"$work/in", parts.drop(4).toSeq, now + 4000L)
    run(s"$work/in", s"$work/ckpt", s"$work/sink")
    // reference: same files, fresh checkpoint + sink, no interruption
    place(s"$work/ref_in", parts.toSeq, now)
    run(s"$work/ref_in", s"$work/ref_ckpt", s"$work/ref_sink")

    def decisions(path: String): Seq[String] = {
      val df = spark.read.parquet(path).drop("batch_id")
      df.select(df.columns.sorted.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    }
    val got = decisions(s"$work/sink")
    val ref = decisions(s"$work/ref_sink")
    assert(got.nonEmpty, "no decision rows emitted")
    assert(got == ref, "restart broke exactly-once: interrupted != reference")

    // batch-twin equivalence: one shot through the shared core
    val direct = extensions.Text.dedupBatchAgainstCorpus(
      batchDocs.select("doc_id"),
      extensions.Text.shingleSetsOf(batchDocs),
      corpusBands, corpusArr)
    val directRows = direct
      .select(direct.columns.sorted.map(col): _*)
      .collect().map(_.toString).sorted.toSeq
    assert(got == directRows,
      "micro-batched decisions diverge from the batch twin")
    // and the probe actually found duplicates (fixture is non-degenerate)
    assert(spark.read.parquet(s"$work/sink").filter(!col("keep")).count() > 0,
      "expected at least one dropped near-duplicate")
  }
}
