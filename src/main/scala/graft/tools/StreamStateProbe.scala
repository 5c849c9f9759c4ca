package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** State-store scale probe for the streaming sessionization leg: the same
  * `Streams.statefulSessions` pipeline (flatMapGroupsWithState keyed by
  * user) run twice over an identical multi-batch event replay — once on
  * the default HDFSBackedStateStoreProvider (all state on the executor
  * heap: the in-memory figure the sf0.1 bench leg reports) and once on
  * RocksDBStateStoreProvider (state off-heap/on-disk: what a 100 TB
  * deployment actually runs, since keyed session state scales with the
  * distinct-user count, not with executor memory).
  *
  * Emits ONE JSON line with, per provider: events/s, total state rows,
  * and the provider's own state-size metrics (heap bytes for HDFS,
  * memtable+SST bytes for RocksDB) — the committed artifact is
  * `BENCH_STREAM_STATE.json`.
  *
  * Env: SPARK_GRAFT_STREAM_SF (events = 1M × SF, default 10),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_STREAM_DIR (replay workdir, default
  * /tmp/graft_stream_state).
  */
object StreamStateProbe {

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_STREAM_SF", "10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val work = sys.env.getOrElse("SPARK_GRAFT_STREAM_DIR", "/tmp/graft_stream_state")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.Scratch.resolve(graft.Scratch.SweepFootprint))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // replay input: synth events at SF, written once as 32 files so
    // maxFilesPerTrigger=4 yields an 8-microbatch replay (state builds
    // up and is exercised across batches, not in one degenerate batch)
    val in = s"$work/events_sf$sf"
    if (!new java.io.File(s"$in/_SUCCESS").exists()) {
      spark.read.format("graft-synth")
        .option("table", "events").option("sf", sf)
        .option("partitions", cpus)
        .load()
        .select(col("event_id"), timestamp_micros(expr("ts div 1000")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .repartition(32)
        .write.mode("overwrite").parquet(in)
    }
    val nEvents = spark.read.parquet(in).count()

    def run(provider: String): (Double, Long, Map[String, Long]) = {
      val ckpt = s"$work/ckpt-$provider-${java.util.UUID.randomUUID()}"
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        s"org.apache.spark.sql.execution.streaming.state.$provider")
      val schema = spark.read.parquet(in).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(in)
        .as[graft.streaming.Streams.Evt]
      val t0 = System.nanoTime()
      val q = graft.streaming.Streams.statefulSessions(src)
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      // last progress with a state operator carries the final state size
      val stateOp = q.recentProgress.reverse
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .headOption
      val rows = stateOp.map(_.numRowsTotal).getOrElse(-1L)
      val mem: Map[String, Long] = stateOp.map { so =>
        val base = Map("memory_used_bytes" -> so.memoryUsedBytes)
        val custom = Option(so.customMetrics).map { cm =>
          import scala.jdk.CollectionConverters._
          cm.asScala.collect {
            case (k, v) if k.toLowerCase.contains("memory") ||
              k.toLowerCase.contains("sstfilessize") ||
              k.toLowerCase.contains("totalbytes") =>
              k -> Long2long(v)
          }.toMap
        }.getOrElse(Map.empty[String, Long])
        base ++ custom
      }.getOrElse(Map.empty)
      (nEvents / sec, rows, mem)
    }

    // warm once (JIT/codegen/file-index), unmeasured, on the default store
    run("HDFSBackedStateStoreProvider")
    val (hRate, hRows, hMem) = run("HDFSBackedStateStoreProvider")
    val (rRate, rRows, rMem) = run("RocksDBStateStoreProvider")
    require(hRows == rRows,
      s"provider state-row mismatch: hdfs=$hRows rocksdb=$rRows")
    def memJson(m: Map[String, Long]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(
      s"""{"metric":"stream_state_sessionize","unit":"events_per_sec","sf":$sf,""" +
        s""""events":$nEvents,"state_rows":$hRows,"cpus":$cpus,""" +
        s""""hdfs":{"events_per_sec":${math.round(hRate)},${memJson(hMem)}},""" +
        s""""rocksdb":{"events_per_sec":${math.round(rRate)},${memJson(rMem)}},""" +
        s""""host_page_mbps":${graft.HostProbe.pageMBps()}}""")
    spark.stop()
  }
}
