package graft.tools

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-session A/B of the flip-path collision stage in dedupSimhashNear:
  * self-join on (vhi, vlo) — two SMJ shuffles+sorts of the 65x variant
  * relation — vs ONE groupBy into radius-1-ball buckets (≤65 sigs each)
  * with a bounded double-explode pair expansion. Both count the verified
  * signature pairs; alternated rounds cancel epoch drift. */
object SimhashJoinAb {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_PIPE_SF", "100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.Scratch.resolve(graft.Scratch.SweepFootprint))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ctx = Ctx(spark, s"synth:sf=$sf")

    val sim = extensions.Text.dedupSimhash(ctx).select("doc_id", "simhash")
    sim.count() // warm the memo outside the timings
    val sigs = sim.select("simhash").distinct().select(
      expr("cast(conv(substring(simhash, 1, 32), 2, 10) as bigint)").as("hi"),
      expr("cast(conv(substring(simhash, 33, 32), 2, 10) as bigint)").as("lo"))
    val variants = sigs
      .select(col("hi"), col("lo"), explode(expr("sequence(0, 64)")).as("j"))
      .select(
        when(col("j").between(1, 32),
          expr("hi ^ shiftleft(1L, 32 - j)")).otherwise(col("hi")).as("vhi"),
        when(col("j") >= 33,
          expr("lo ^ shiftleft(1L, 64 - j)")).otherwise(col("lo")).as("vlo"),
        col("hi"), col("lo"))

    def joinForm: DataFrame = variants
      .select(col("vhi"), col("vlo"), col("hi").as("hi_a"), col("lo").as("lo_a"))
      .join(variants
        .select(col("vhi"), col("vlo"), col("hi").as("hi_b"), col("lo").as("lo_b")),
        Seq("vhi", "vlo"))
      .filter(struct(col("hi_a"), col("lo_a")) < struct(col("hi_b"), col("lo_b")))
      .select("hi_a", "lo_a", "hi_b", "lo_b").distinct()

    def bucketForm: DataFrame = variants
      .groupBy("vhi", "vlo")
      .agg(collect_list(struct(col("hi"), col("lo"))).as("sigs"))
      .filter(size(col("sigs")) >= 2)
      .select(explode(col("sigs")).as("a"), col("sigs"))
      .select(col("a"), explode(col("sigs")).as("b"))
      .filter(struct(col("a.hi"), col("a.lo")) < struct(col("b.hi"), col("b.lo")))
      .select(col("a.hi").as("hi_a"), col("a.lo").as("lo_a"),
        col("b.hi").as("hi_b"), col("b.lo").as("lo_b"))
      .distinct()

    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)), xor64()).head()
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e9}%8.1f s  " +
        s"pairs=${r.getLong(0)} hash=${java.lang.Long.toHexString(r.getLong(1))}")
    }
    def xor64() = expr("bit_xor(xxhash64(hi_a, lo_a, hi_b, lo_b))")

    (1 to 2).foreach { round =>
      t(s"join   r$round")(joinForm)
      t(s"bucket r$round")(bucketForm)
    }
    spark.stop()
  }
}
