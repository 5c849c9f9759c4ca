package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the `dedup_simhash_stats` rollup (r11 verdict item 7: the
  * SF100 leg is the largest pipe leg at ~120 s — the pair PLAN is sound,
  * so the open question is whether the final rollup can fuse an exchange).
  *
  * Candidates, all downstream of the SAME dedupSimhashNear pair plan:
  *   A. shipped two-phase: explode endpoints -> groupBy(hamming, doc_id)
  *      (map-side combine, ONE wide exchange of distinct (d, doc) pairs)
  *      -> groupBy(hamming) (tiny second exchange);
  *   B. mixed aggregate: groupBy(hamming).agg(count, countDistinct(doc))
  *      over the exploded endpoints — one groupBy in the API but Catalyst
  *      plans an Expand (2 projections per input row) + a two-round
  *      aggregate, so the "fused" form actually widens the scan;
  *   C. pair-count split: n_pairs straight off the un-exploded pair set
  *      (no doubling) + a separate distinct-doc rollup — saves the 2x
  *      explode but pays the pair plan TWICE unless the pair set is
  *      persisted, which at SF100 is a ~96M-row cache for a 3-row answer.
  *
  * Each leg runs `draws` times alternating A/B/C within one session (warm
  * corpus relations, like the pipe sweep); emits one JSON line with
  * per-draw seconds + the host probe. Result is recorded in
  * PERF_NOTES_r12.md whether or not there is a win. */
object SimhashStatsAb {

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SIMAB_SF", "100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val draws = sys.env.getOrElse("SPARK_GRAFT_SIMAB_DRAWS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Scratch.resolve(Scratch.SweepFootprint))
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ctx = Ctx(spark, s"synth:sf=$sf")

    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def hash(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head().getLong(1)

    def pairs = extensions.Text.dedupSimhashNear(ctx)
    def endpoints = pairs.select(col("hamming"),
      explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))

    val legs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "A_two_phase" -> (() => extensions.Text.dedupSimhashStats(ctx)),
      "B_mixed_expand" -> (() => endpoints
        .groupBy("hamming")
        .agg(expr("count(1) div 2").as("n_pairs"),
          countDistinct(col("doc_id")).as("n_docs"))),
      "C_split" -> (() => {
        val np = pairs.groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
        val nd = endpoints.select("hamming", "doc_id").distinct()
          .groupBy("hamming").agg(count(lit(1)).as("n_docs"))
        np.join(nd, Seq("hamming"))
      }))

    val results = scala.collection.mutable.Map.empty[String, List[Double]]
    val hashes = scala.collection.mutable.Map.empty[String, Long]
    for (d <- 1 to draws; (name, mk) <- legs) {
      val (h, sec) = timed(hash(mk().orderBy("hamming")))
      hashes.get(name).foreach(prev => require(prev == h, s"$name drift"))
      hashes(name) = h
      results(name) = results.getOrElse(name, Nil) :+ sec
      System.err.println(f"[simab] draw=$d $name%-16s $sec%.1f s")
    }
    require(hashes.values.toSet.size == 1,
      s"variants disagree: $hashes — A/B invalid")
    val body = legs.map { case (n, _) =>
      val r = results(n)
      s""""$n":{"secs":[${r.map(s => f"$s%.2f").mkString(",")}],"min_sec":${f"${r.min}%.2f"}}"""
    }.mkString(",")
    println(s"""{"metric":"simhash_stats_ab","sf":$sf,"cpus":$cpus,"draws":$draws,$body,"host_page_mbps":${HostProbe.pageMBps()}}""")
    spark.stop()
  }
}
