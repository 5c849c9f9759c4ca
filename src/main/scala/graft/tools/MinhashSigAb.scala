package graft.tools

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-session A/B of min-hash signature plan shapes over the same persisted
  * shingle arrays: the signature pass is the dominant cost of the SF100
  * dedup_minhash_lsh leg, and the candidates differ in array-pass count
  * and allocation shape, not in md5 count (all compute 4 digests/shingle).
  *   A. 1 digest transform + 16 slice transforms (17 array passes);
  *   B. explode to pairs -> flat project -> 16-way min groupBy (no
  *      higher-order functions at all, but a doc-keyed shuffle);
  *   C. 1 digest transform + ONE aggregate pass folding all 16 mins.
  */
object MinhashSigAb {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_PIPE_SF", "10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", graft.Scratch.resolve(graft.Scratch.SweepFootprint))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ctx = Ctx(spark, s"synth:sf=$sf")
    val docArr = extensions.Text.shingleArr(ctx)
    docArr.count() // materialize the persist outside the timings

    def t(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = df.agg((0 until 16).map(i => min(col(s"h$i"))).head,
        (1 until 16).map(i => min(col(s"h$i"))): _*).head()
      val h = r.mkString("|").hashCode
      println(f"$label%-14s ${(System.nanoTime() - t0) / 1e9}%8.1f s  hash=$h%08x")
    }

    val mhCat = (0 until 4).map(j => s"md5(concat('$j|', x))")
      .mkString("transform(shingles, x -> concat(", ", ", "))")

    def varA: DataFrame = docArr
      .withColumn("mh_cat", expr(mhCat))
      .select(col("doc_id") +: (0 until 16).map(i =>
        expr(s"array_min(transform(mh_cat, h -> substring(h, ${8 * i + 1}, 8)))")
          .as(s"h$i")): _*)

    // D: the shipped native one-pass expression (functions.MinHashSig16)
    def varD: DataFrame = extensions.Text.minhash16(docArr)

    def varB: DataFrame = docArr
      .select(col("doc_id"), explode(col("shingles")).as("x"))
      .select(col("doc_id"), expr((0 until 4)
        .map(j => s"md5(concat('$j|', x))").mkString("concat(", ", ", ")")).as("mh"))
      .groupBy("doc_id")
      .agg((0 until 16).map(i =>
        min(expr(s"substring(mh, ${8 * i + 1}, 8)")).as(s"h$i")).head,
        (1 until 16).map(i =>
          min(expr(s"substring(mh, ${8 * i + 1}, 8)")).as(s"h$i")): _*)

    def varC: DataFrame = docArr
      .withColumn("mh_cat", expr(mhCat))
      .withColumn("hs", expr(
        """aggregate(mh_cat, array_repeat('g', 16),
          |  (acc, h) -> zip_with(acc,
          |    transform(sequence(0, 15), i -> substring(h, CAST(i*8+1 AS INT), 8)),
          |    (a, b) -> least(a, b)))""".stripMargin))
      .select(col("doc_id") +: (0 until 16).map(i =>
        expr(s"hs[$i]").as(s"h$i")): _*)

    // digest-only floor: one pass, 4 md5/shingle, no slicing
    def tFloor(): Unit = {
      val t0 = System.nanoTime()
      docArr.withColumn("mh_cat", expr(mhCat))
        .agg(min(expr("mh_cat[0]"))).head()
      println(f"digest floor   ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }

    (1 to 2).foreach { round =>
      tFloor()
      t(s"A slices r$round")(varA)
      t(s"B explode r$round")(varB)
      t(s"C fold   r$round")(varC)
      t(s"D native r$round")(varD)
    }
    spark.stop()
  }
}
