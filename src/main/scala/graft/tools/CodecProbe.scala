package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** In-session A/B of parquet write codecs on the SF10 build's widest
  * output (fct_orders_items, ~60M rows / 5.7 GB snappy). Writes land on
  * the same disk the real build writes to; variants alternate in one JVM
  * against one cached input so epoch drift hits all sides equally.
  * Prints wall seconds + output bytes per codec. */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", graft.Scratch.resolve(graft.Scratch.SweepFootprint))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = spark.read.parquet("/tmp/graft_sf10r/__build/fct_orders_items")
    src.persist().count()
    def sizeOf(dir: String): Long = {
      val p = Paths.get(dir)
      if (!Files.exists(p)) 0L
      else Files.walk(p).filter(Files.isRegularFile(_))
        .mapToLong(Files.size).sum()
    }
    val codecs = Seq("snappy", "zstd", "lz4_raw")
    // base=/dev/shm isolates encode CPU from disk I/O; base=/tmp is the
    // real write path the build uses.
    val base = args.headOption.getOrElse("/tmp")
    (1 to 2).foreach { round =>
      codecs.foreach { c =>
        val out = s"$base/graft_codec_probe/$c"
        val t0 = System.nanoTime()
        src.write.mode("overwrite").option("compression", c).parquet(out)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"codec=$c%-8s r$round  $sec%6.1f s  ${sizeOf(out) / 1e9}%6.2f GB")
      }
    }
    spark.stop()
  }
}
