package graft

import java.sql.Timestamp

import graft.streaming.Streams
import graft.streaming.Streams.Evt
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once across a checkpoint restart, as a CI property (the
  * at-scale numbers live in `BENCH_STREAM_RECOVERY.json` / the
  * StreamRecoveryProbe tool): the stateful sessionization is stopped
  * mid-stream, a NEW query instance resumes from the checkpoint against a
  * backlog, and the parquet sink must match an uninterrupted reference run
  * row-for-row. Sessions that SPAN the restart boundary are planted by
  * construction, so any state loss flips the comparison, not just a count.
  *
  * Determinism: input files carry strictly increasing mtimes and the
  * source reads maxFilesPerTrigger=2, so both executions see identical
  * batch boundaries and the comparison is exact. */
class StreamRecoverySpec extends SparkSpec {

  test("sessionization restarted from checkpoint matches an uninterrupted run exactly") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_recovery_spec").toString

    // 2k events, 50 users, sessions deliberately spanning the file split:
    // event times increase with event id, so user u's session around the
    // split point has events in files 3 and 4 (state must survive restart)
    def ts(i: Int): Timestamp = new Timestamp(1700000000000L + i * 60000L)
    val events = (0 until 2000).map { i =>
      Evt(i.toLong, ts(i), (i % 50).toLong, if (i % 3 == 0) "view" else "click", i.toDouble)
    }
    val staging = s"$work/staging"
    events.toDF().repartition(8).write.mode("overwrite").parquet(staging)
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
        .option("maxFilesPerTrigger", "2").parquet(dir).as[Evt]
      val q = Streams.statefulSessions(src, gapMs = 5 * 60000L)
        .writeStream.format("parquet").outputMode("append")
        .option("checkpointLocation", ckpt).option("path", sink)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val now = System.currentTimeMillis() - 3600 * 1000L
    // phase A: first half; phase B: new query resumes from the checkpoint
    place(s"$work/in", parts.take(4).toSeq, now)
    run(s"$work/in", s"$work/ckpt", s"$work/sink")
    place(s"$work/in", parts.drop(4).toSeq, now + 4000L)
    run(s"$work/in", s"$work/ckpt", s"$work/sink")
    // reference: same files, same mtime order, fresh checkpoint + sink
    place(s"$work/ref_in", parts.toSeq, now)
    run(s"$work/ref_in", s"$work/ref_ckpt", s"$work/ref_sink")

    def digest(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
      val r = df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (gotN, gotH) = digest(s"$work/sink")
    val (refN, refH) = digest(s"$work/ref_sink")
    assert(gotN > 0, "no sessions emitted — fixture too small to exercise state")
    assert(gotN == refN && gotH == refH,
      s"restart broke exactly-once: got ($gotN, $gotH) vs reference ($refN, $refH)")
  }
}
