package graft.operators

import graft.functions.KllSketch
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT global percentiles at scale, sketch-narrowed:
  *
  * `percentile_cont` over one giant group is a full global sort — the worst
  * single-task funnel in SQL. This operator gets the exact same answer in
  * three distributed jobs, independent of how many quantiles are asked:
  *
  *  1. sketch pass: one [[KllSketch]] aggregate (bounded buffers, map-side
  *     partial, no raw-value shuffle) whose summary carries a CERTIFIED
  *     worst-case rank error `err`;
  *  2. one conditional-count aggregate: for every requested quantile, the
  *     certificate bounds a value window guaranteed to hold its two
  *     neighboring order statistics; this job counts rows below each
  *     window and rows inside each window (all windows in one scan);
  *  3. one ranked pass over the UNION of the window slices (each row
  *     tagged with the windows containing it, ≈ err/n of the data per
  *     window, e.g. 0.3% at k=4096), rank-numbered with the two-phase
  *     [[Scale.globalOrder]] ordered by (window, v) — never a
  *     single-partition sort — from which the two target order statistics
  *     per quantile are picked and interpolated with percentile_cont's
  *     formula.
  *
  * The result is bit-identical to a full-sort percentile_cont (proven
  * against the DuckDB oracle by the `price_percentiles_exact` query and on
  * random data in KllSpec). */
object ExactQuantile {

  /** Exact percentile_cont(q) for each q, over `df(valueCol)` cast to
    * double. Returns (quantile, value) rows, ordered by quantile. */
  def percentiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      k: Int = 512): DataFrame = {
    val spark = df.sparkSession
    KllSketch.register(spark)
    // All three jobs scan the same single-column projection; persist it
    // once (8 bytes/row serialized — at any SF this is the narrowest
    // possible copy of the data, and MEMORY_AND_DISK_SER degrades to
    // spill instead of failing) so the source relation is evaluated once
    // instead of three times. Unpersisted before returning: the result
    // is a handful of driver-built rows, nothing downstream re-reads vals.
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      percentilesOver(vals, qs, k)
    } finally { vals.unpersist(blocking = false); () }
  }

  private def percentilesOver(vals: DataFrame, qs: Seq[Double],
      k: Int): DataFrame = {
    val spark = vals.sparkSession
    val summary = vals.agg(expr(s"kll_sketch(v, $k)").as("s")).select("s.*").head()
    val n = summary.getLong(0)
    val err = summary.getLong(1)
    if (n == 0) {
      // empty relation: no order statistics exist — empty result, like
      // percentile_cont's NULL-on-empty, rather than an opaque NPE
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("quantile",
            org.apache.spark.sql.types.DoubleType, nullable = false),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.DoubleType, nullable = false))))
    }

    final case class W(q: Double, loRank: Long, hiRank: Long, frac: Double,
        a: Option[Double], b: Option[Double]) {
      def inWindow = a.map(col("v") >= _).getOrElse(lit(true)) &&
        b.map(col("v") <= _).getOrElse(lit(true))
    }
    val ws = qs.sorted.map { q =>
      val pos = q * (n - 1)
      val loRank = math.floor(pos).toLong
      val frac = pos - loRank
      val hiRank = if (frac == 0.0) loRank else loRank + 1
      // certified window: valueAtRank(r)'s true rank is within ±err of r
      val a = if (loRank - err - 1 >= 0)
        Some(KllSketch.valueAtRank(summary, loRank - err - 1)) else None
      val b = if (hiRank + err + 1 <= n - 1)
        Some(KllSketch.valueAtRank(summary, hiRank + err + 1)) else None
      W(q, loRank, hiRank, frac, a, b)
    }

    // job 2: per-window below-counts and in-window counts, ONE scan
    val aggs = ws.zipWithIndex.flatMap { case (w, i) =>
      Seq(
        w.a.map(a => sum(when(col("v") < a, 1L).otherwise(0L)))
          .getOrElse(sum(lit(0L))).as(s"below_$i"),
        sum(when(w.inWindow, 1L).otherwise(0L)).as(s"in_$i"))
    }
    val cRow = vals.agg(aggs.head, aggs.tail: _*).head()
    val below = ws.indices.map(i => cRow.getLong(2 * i))
    val inWin = ws.indices.map(i => cRow.getLong(2 * i + 1))
    val winOffset = inWin.scanLeft(0L)(_ + _) // slice-start offset per window

    // job 3: tag each row with every window containing it, one two-phase
    // global rank over (window, v)
    val tagArr = array(ws.zipWithIndex.map { case (w, i) =>
      when(w.inWindow, lit(i)).otherwise(lit(-1))
    }: _*)
    val tagged = vals
      .select(explode(filter(tagArr, x => x >= 0)).as("__w"), col("v"))
    val ranked = Scale.globalOrder(tagged,
      order = Seq(col("__w"), col("v")), rn = Some("__rn"))
    // global 1-based rn of window i's rank-r (0-based within slice) row is
    // winOffset(i) + r + 1; we need per window the slice-local ranks of the
    // loRank-th and hiRank-th overall order statistics
    val targets = ws.zipWithIndex.flatMap { case (w, i) =>
      Seq(w.loRank, w.hiRank).distinct.map { r =>
        val localR = r - below(i)
        require(localR >= 0 && localR < inWin(i),
          s"certificate violated for q=${w.q}: rank $r outside window " +
            s"[${below(i)}, ${below(i) + inWin(i)})")
        (winOffset(i) + localR + 1) -> (i, r)
      }
    }
    val byRn = targets.map(_._1)
    val picked = ranked.filter(col("__rn").isInCollection(byRn))
      .select(col("__rn").cast("long").as("rn"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = ws.zipWithIndex.map { case (w, i) =>
      val lo = picked(winOffset(i) + (w.loRank - below(i)) + 1)
      val hi = picked(winOffset(i) + (w.hiRank - below(i)) + 1)
      // percentile_cont's interpolation, in the same double arithmetic both
      // engines use
      Row(w.q, lo + (hi - lo) * w.frac)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("quantile",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }
}
