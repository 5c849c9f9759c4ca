package graft.tools

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing of the persisted-index serving path
  * (extensions.AnnIndex.query) against an index already on disk — the
  * decomposition tool for attributing serve-time changes to a stage
  * instead of guessing from end-to-end numbers. Reuses the index dir
  * AnnIndexBench leaves behind (SPARK_GRAFT_AIB_DIR, default
  * /tmp/graft_ann_index). */
object AnnServeProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sf = sys.env.getOrElse("SPARK_GRAFT_AIB_SF", "10")
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_AIB_QUERIES", "100").toInt
    val nprobe = sys.env.getOrElse("SPARK_GRAFT_AIB_NPROBE", "16").toInt
    val shortlist = sys.env.getOrElse("SPARK_GRAFT_AIB_SHORTLIST", "400").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_AIB_DIR", "/tmp/graft_ann_index")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Scratch.resolve(Scratch.SweepFootprint))
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "256m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ctx = Ctx(spark, s"synth:sf=$sf")
    graft.functions.CosineSim.register(spark)

    val n = ctx.tbl("embeddings").count()
    val queries = ctx.tbl("embeddings")
      .filter(col("vec_id") > n - nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      // pin the tiny query batch so its synth generation is paid once,
      // not once per subtree evaluation
      .persist()
    queries.count()

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[serveprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($r)")
    }
    def hashAll(df: DataFrame): Long =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head().getLong(0)

    // stage 0: generation pin + codebook width (the new metadata actions)
    timed("meta+nSlots resolution") {
      val m = Versioned.read(spark, s"$dir/meta").head()
      val cb = Versioned.read(spark, s"$dir/codebooks",
        Some(m.getLong(1)))
      cb.agg(max(col("code"))).head().getLong(0)
    }
    val m = Versioned.read(spark, s"$dir/meta").head()
    val seeds = Versioned.read(spark, s"$dir/seeds", Some(m.getLong(0)))
    val cb = Versioned.read(spark, s"$dir/codebooks", Some(m.getLong(1)))
    val coded = Versioned.read(spark, s"$dir/coded", Some(m.getLong(2)))
    val nSlots = cb.agg(max(col("code"))).head().getLong(0).toInt + 1

    import org.apache.spark.sql.expressions.Window
    val probes = queries.crossJoin(broadcast(seeds))
      .select(col("query_id"), col("cell_id"),
        expr("cosine_sim(qe, se)").as("seed_cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("seed_cos").desc, col("cell_id"))))
      .filter(col("rn") <= nprobe)
      .select("query_id", "cell_id")
    timed("probes (coarse quantize)") { hashAll(probes) }

    val qarr = queries
      .select(col("query_id"), explode(expr("sequence(0, 7)")).as("s"), col("qe"))
      .select(col("query_id"), col("s"), expr("slice(qe, s * 8 + 1, 8)").as("qv"))
      .join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"),
        col("code").cast("int").as("code"),
        round(expr("cosine_sim(qv, cv)"), 9).cast("decimal(12,9)").as("qdec"))
      .groupBy(col("query_id"), col("s"))
      .agg(map_from_entries(collect_list(struct(col("code"), col("qdec")))).as("m"))
      .select(col("query_id"), col("s"),
        expr(s"""transform(sequence(0, ${nSlots - 1}),
           c -> coalesce(element_at(m, c), CAST(0 AS DECIMAL(12,9))))""").as("sarr"))
      .groupBy("query_id")
      .agg(expr("flatten(transform(array_sort(collect_list(struct(s, sarr))), x -> x.sarr))")
        .as("qarr"))
    timed("qarr (query ADC tables)") { qarr.count() }

    val cands = probes
      .join(coded.select(col("cell_id"), col("vec_id").as("cand_id"),
        col("codes")), Seq("cell_id"))
      .filter(col("query_id") =!= col("cand_id"))
    timed("candidates (no score)") { cands.count() }

    val adc = cands
      .join(broadcast(qarr), Seq("query_id"))
      .select(col("query_id"), col("cand_id"), col("cell_id"),
        expr(s"""aggregate(sequence(0, 7), CAST(0 AS DECIMAL(22,9)),
           (acc, s) -> CAST(acc + element_at(qarr,
             CAST(s * $nSlots + element_at(codes, s + 1) + 1 AS INT)) AS DECIMAL(22,9)))""")
          .as("approx"))
    timed("adc (HOF decimal fold)") { hashAll(adc) }

    // unrolled: 8 explicit element_at terms — no higher-order function, so
    // the whole projection stays inside whole-stage codegen (HOFs are
    // CodegenFallback); decimal addition is exact either way, same value
    val unrolledSum = (0 until 8)
      .map(s => s"element_at(qarr, CAST($s * $nSlots + element_at(codes, ${s + 1}) + 1 AS INT))")
      .mkString(" + ")
    val adcUnrolled = cands
      .join(broadcast(qarr), Seq("query_id"))
      .select(col("query_id"), col("cand_id"), col("cell_id"),
        expr(s"CAST($unrolledSum AS DECIMAL(22,9))").as("approx"))
    timed("adc (unrolled decimal)") { hashAll(adcUnrolled) }
    timed("adc (unrolled decimal) x2") { hashAll(adcUnrolled) }

    // reference: double fold (AnnScaleProbe's shape — loses bit-parity)
    val adcDouble = cands
      .join(broadcast(qarr), Seq("query_id"))
      .select(col("query_id"), col("cand_id"), col("cell_id"),
        expr(s"""aggregate(sequence(0, 7), 0D,
           (acc, s) -> acc + CAST(element_at(qarr,
             CAST(s * $nSlots + element_at(codes, s + 1) + 1 AS INT)) AS DOUBLE))""")
          .as("approx"))
    timed("adc (HOF double fold)") { hashAll(adcDouble) }

    val short = adc
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("approx").desc, col("cand_id"))))
      .filter(col("rn") <= shortlist)
      .select("query_id", "cand_id", "cell_id", "approx")
    timed("shortlist (window)") { hashAll(short) }

    timed("full query() end-to-end") {
      val out = extensions.AnnIndex.query(spark, dir, queries, 10, nprobe, shortlist)
      hashAll(out)
    }
    timed("full query() repeat") {
      val out = extensions.AnnIndex.query(spark, dir, queries, 10, nprobe, shortlist)
      hashAll(out)
    }
    spark.stop()
  }
}
