package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up benchmark: replicate the sf0.1 TPC-H tables `copies`× with
  * key-offset blocks into an sf1-equivalent parquet lake, then time a COLD
  * full `Runner.buildAll` — the twin of the reference's published number
  * (the ~5-minute end-to-end `dbt build` of all 62 models at SF10 on a
  * Snowflake XS warehouse, reference README.md:71).
  *
  * The replica is BENCH-ONLY synthetic data (never used for the correctness
  * gate): block i adds i×stride to every key column, so all FK joins stay
  * consistent (replicated facts reference replicated dims in the same
  * block; nation/region are fixed dimensions, copied once, exactly like
  * TPC-H scaling). Deterministic — no randomness.
  *
  * Env: SPARK_GRAFT_SF_DIR (source, default sf0.1), SPARK_GRAFT_SCALE_DIR
  * (replica+build workdir, default /tmp/graft_sf1), SPARK_GRAFT_COPIES
  * (default 10), SPARK_GRAFT_CPUS. Alternatively SPARK_GRAFT_SYNTH_SF=<N>
  * feeds the build from the zero-storage `graft-synth` generator at SF N —
  * no replica parquet at all (the SF100+ path: input storage is zero, only
  * the build OUTPUT hits disk).
  */
object BenchScale {

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val synthSf = sys.env.get("SPARK_GRAFT_SYNTH_SF")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val srcCtx = synthSf match {
      case Some(sf) => Ctx(spark, s"synth:sf=$sf")
      case None =>
        if (!new java.io.File(s"$work/_READY").exists())
          replicate(spark, src, work, copies)
        Ctx(spark, work)
    }

    Store.clear(spark)
    val buildDir = s"$work/__build"
    val threads = sys.env.getOrElse("SPARK_GRAFT_BUILD_THREADS", "8").toInt
    val t0 = System.nanoTime()
    val built = Runner.buildAll(srcCtx, buildDir, threads)
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = built.map(_.rows).sum
    built.sortBy(-_.seconds).take(10).foreach(b =>
      System.err.println(f"[benchscale] ${b.table}%-32s ${b.seconds}%8.1f s ${b.rows}%12d rows"))
    val srcLabel = synthSf.map(sf => s"synth:sf=$sf").getOrElse(src)
    val metric = synthSf.map(sf => s"build_sf$sf").getOrElse("build_sf1")
    println(s"""{"metric":"$metric","value":$sec,"unit":"sec","tables":${built.size},"total_rows":$rows,"cpus":$cpus,"src":"$srcLabel"}""")
    spark.stop()
  }

  /** Key-offset replication of the 8 TPC-H tables. */
  private def replicate(spark: SparkSession, src: String, work: String,
      copies: Int): Unit = {
    def tbl(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1

    val oStride = stride(tbl("orders").selectExpr("CAST(o_orderkey AS BIGINT) AS o_orderkey"), "o_orderkey")
    val cStride = stride(tbl("customer").selectExpr("CAST(c_custkey AS BIGINT) AS c_custkey"), "c_custkey")
    val pStride = stride(tbl("part").selectExpr("CAST(p_partkey AS BIGINT) AS p_partkey"), "p_partkey")
    val sStride = stride(tbl("supplier").selectExpr("CAST(s_suppkey AS BIGINT) AS s_suppkey"), "s_suppkey")

    /** union of `copies` blocks, offsetting each listed key by i×stride and
      * keeping the original column order and types */
    def blocks(df: DataFrame, offsets: Map[String, Long]): DataFrame =
      (0 until copies).map { i =>
        df.select(df.schema.fields.map { f =>
          offsets.get(f.name) match {
            case Some(st) => (col(f.name) + lit(st * i)).cast(f.dataType).as(f.name)
            case None     => col(f.name)
          }
        }.toIndexedSeq: _*)
      }.reduce(_ union _)

    def write(n: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$work/$n.parquet")

    write("region", tbl("region"))
    write("nation", tbl("nation"))
    write("customer", blocks(tbl("customer"), Map("c_custkey" -> cStride)))
    write("supplier", blocks(tbl("supplier"), Map("s_suppkey" -> sStride)))
    write("part", blocks(tbl("part"), Map("p_partkey" -> pStride)))
    write("orders", blocks(tbl("orders"),
      Map("o_orderkey" -> oStride, "o_custkey" -> cStride)))
    write("lineitem", blocks(tbl("lineitem"),
      Map("l_orderkey" -> oStride, "l_partkey" -> pStride, "l_suppkey" -> sStride)))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$work/_READY"))
    ()
  }
}
