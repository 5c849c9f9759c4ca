package graft.tools

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Decomposition A/B for the `text_heavy_hitters` leg — the worst SF10→
  * SF100 sweep ratio (7.12× vs the 8× gate). The leg is two corpus passes:
  * pass 1 streams every token through the bounded Misra-Gries aggregate
  * (candidate generation); pass 2 re-scans, joins the ≤cap broadcast
  * candidates, and recounts exactly. This probe times, in ONE JVM against
  * the same generator (drift hits all variants equally, interleaved
  * A/B/A/B):
  *
  *   - `scan`     — tokenize + explode + count: the single-scan floor any
  *                  variant must pay at least once;
  *   - `sketch`   — pass 1 alone (MG agg to one row);
  *   - `recount`  — pass 2 alone, candidates pre-collected (what an exact
  *                  recount costs given a candidate list);
  *   - `full`     — the shipped Registry leg, driver-bench action;
  *   - `full_memo`— the shipped plan with the tokenized docs persisted
  *                  across the two passes (pays one tokenize + cache I/O
  *                  instead of two tokenizes) — the candidate plan change
  *                  if the tokenize, not the aggregation, dominates.
  *
  * Emits one JSON line; the committed analysis lives in PERF_NOTES_r10.md.
  * Env: SPARK_GRAFT_AB_SF (default 100), SPARK_GRAFT_CPUS, rounds via
  * SPARK_GRAFT_AB_ROUNDS (default 2). */
object HeavyHittersAb {

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_AB_SF", "100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Scratch.resolve(Scratch.SweepFootprint))
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 4).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "256m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FreqItemsSketch.register(spark)
    val dir = s"synth:sf=$sf"
    val ctx = Ctx(spark, dir)
    val denom = 500
    val cap = 8192

    def toks: DataFrame =
      extensions.Text.docsTok(ctx).select(explode(col("toks")).as("tok"))

    def timed(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[hh-ab] $name%-12s $sec%8.1f s")
      (name, sec)
    }

    // candidates for the isolated recount leg: one untimed sketch pass
    val candRows = toks
      .agg(expr(s"freq_items(tok, $cap)").as("cand"), count(lit(1)).as("n"))
      .select(explode(col("cand")).as("c"), col("n"))
      .select(col("c.item").as("tok"), col("n"))
      .collect()
    val nTotal = candRows.head.getLong(1)
    import spark.implicits._
    val candDf = candRows.map(r => (r.getString(0), r.getLong(1)))
      .toSeq.toDF("tok", "n")
    System.err.println(s"[hh-ab] candidates=${candRows.length} total_tokens=$nTotal")

    def bench(df: DataFrame): Unit = {
      df.select(xxhash64(df.columns.map(col): _*).as("__h"))
        .agg(expr("bit_xor(__h)")).collect()
      ()
    }

    /** the shipped plan shape with the tokenized docs persisted across the
      * two passes (plan-change candidate) */
    def fullMemo(): Unit = {
      val tk = extensions.Text.docsTok(ctx).select(col("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val t = tk.select(explode(col("toks")).as("tok"))
        val cand = t
          .agg(expr(s"freq_items(tok, $cap)").as("cand"), count(lit(1)).as("n"))
          .select(explode(col("cand")).as("c"), col("n"))
          .select(col("c.item").as("tok"), col("n"))
        val out = t.join(broadcast(cand), Seq("tok"))
          .groupBy(col("tok"), col("n"))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") * denom > col("n"))
          .select(col("tok"), col("cnt"), col("n").as("total_tokens"))
          .orderBy(col("cnt").desc, col("tok"))
        bench(out)
      } finally { tk.unpersist(); () }
    }

    // matched-token mass: how many of the corpus's token rows hit a
    // candidate (the recount's agg input size)
    val matched = toks.join(broadcast(candDf.select("tok")), Seq("tok")).count()
    System.err.println(f"[hh-ab] matched=$matched (${matched * 100.0 / nTotal}%.1f%% of tokens)")
    val candList = candRows.map(_.getString(0)).toSeq

    val legs = (1 to rounds).flatMap { r =>
      Seq(
        timed(s"scan r$r") {
          toks.agg(count(lit(1)), max(length(col("tok")))).collect(); ()
        },
        timed(s"sketch r$r") {
          toks.agg(expr(s"freq_items(tok, $cap)").as("c"), count(lit(1)))
            .select(size(col("c"))).collect(); ()
        },
        timed(s"recount r$r") {
          toks.join(broadcast(candDf), Seq("tok"))
            .groupBy(col("tok"), col("n"))
            .agg(count(lit(1)).as("cnt"))
            .filter(col("cnt") * denom > col("n"))
            .collect(); ()
        },
        // decomposition: the join probe alone (no string-keyed agg)
        timed(s"join_count r$r") {
          toks.join(broadcast(candDf.select("tok")), Seq("tok"))
            .agg(count(lit(1))).collect(); ()
        },
        // InSet filter + string-keyed agg (no join operator at all)
        timed(s"filter_group r$r") {
          toks.filter(col("tok").isInCollection(candList))
            .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
            .collect(); ()
        },
        // semi-join probe (no build-side row concat) + agg
        timed(s"semi_count r$r") {
          toks.join(broadcast(candDf.select("tok")), Seq("tok"), "left_semi")
            .agg(count(lit(1))).collect(); ()
        },
        // the in-plan scale-safe candidate: SEMI join filters the stream,
        // groupBy over matched rows outputs <=cap groups, and a second
        // (trivially small) join re-attaches n for the exact threshold
        timed(s"recount_semi r$r") {
          toks.join(broadcast(candDf.select("tok")), Seq("tok"), "left_semi")
            .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
            .join(broadcast(candDf), Seq("tok"))
            .filter(col("cnt") * denom > col("n"))
            .collect(); ()
        },
        timed(s"full r$r") {
          Store.clear(spark)
          bench(Registry.queries("text_heavy_hitters")(spark, dir))
        },
        timed(s"full_memo r$r") { fullMemo() })
    }
    val qJson = legs.map { case (n0, s) => s""""$n0":$s""" }.mkString(",")
    println(s"""{"metric":"hh_ab_sf$sf","unit":"sec","sf":$sf,"cpus":$cpus,"cap":$cap,"denom":$denom,"total_tokens":$nTotal,"legs":{$qJson},"host_page_mbps":${HostProbe.pageMBps()}}""")
    spark.stop()
  }
}
