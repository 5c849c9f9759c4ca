package graft.operators

import graft.functions.KllSketch
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT global percentiles at scale, sketch-narrowed:
  *
  * `percentile_cont` over one giant group is a full global sort — the worst
  * single-task funnel in SQL. This operator gets the exact same answer in
  * two distributed passes:
  *
  *  1. sketch pass: one [[KllSketch]] aggregate (bounded buffers, map-side
  *     partial, no raw-value shuffle) whose summary carries a CERTIFIED
  *     worst-case rank error `err`;
  *  2. exact pass: for each quantile, the certificate bounds a value window
  *     guaranteed to contain the two neighboring order statistics; the
  *     window slice (≈ err/n of the data, e.g. 0.3% at k=4096) is exactly
  *     rank-numbered with the two-phase [[Scale.globalOrder]] (never a
  *     single-partition window) and the two rows are interpolated with
  *     percentile_cont's formula.
  *
  * The result is bit-identical to a full-sort percentile_cont (proven
  * against the DuckDB oracle by the `price_percentiles_exact` query and on
  * random data in ExactQuantileSpec). */
object ExactQuantile {

  /** Exact percentile_cont(q) for each q, over `df(valueCol)` cast to
    * double. Returns (quantile, value) rows, ordered by quantile. */
  def percentiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      k: Int = 512): DataFrame = {
    val spark = df.sparkSession
    KllSketch.register(spark)
    val vals = df.select(col(valueCol).cast("double").as("v")).filter(col("v").isNotNull)
    val summary = vals.agg(expr(s"kll_sketch(v, $k)").as("s")).select("s.*").head()
    val n = summary.getLong(0)
    val err = summary.getLong(1)

    val rows = qs.sorted.map { q =>
      val pos = q * (n - 1)
      val loRank = math.floor(pos).toLong
      val frac = pos - loRank
      val hiRank = if (frac == 0.0) loRank else loRank + 1
      // certified window: valueAtRank(r)'s true rank is within ±err of r
      val aOpt = if (loRank - err - 1 >= 0)
        Some(KllSketch.valueAtRank(summary, loRank - err - 1)) else None
      val bOpt = if (hiRank + err + 1 <= n - 1)
        Some(KllSketch.valueAtRank(summary, hiRank + err + 1)) else None
      val slice = (aOpt, bOpt) match {
        case (Some(a), Some(b)) => vals.filter(col("v") >= a && col("v") <= b)
        case (Some(a), None) => vals.filter(col("v") >= a)
        case (None, Some(b)) => vals.filter(col("v") <= b)
        case (None, None) => vals
      }
      val cntBelow = aOpt.map(a => vals.filter(col("v") < a).count()).getOrElse(0L)
      val picked = Scale.globalOrder(slice, order = Seq(col("v")), rn = Some("__rn"))
        .filter(col("__rn") + cntBelow - 1 === loRank ||
          col("__rn") + cntBelow - 1 === hiRank)
        .select(col("v"), (col("__rn") + cntBelow - 1).as("r"))
        .collect()
      require(picked.nonEmpty && picked.length <= 2,
        s"certificate violated for q=$q: window produced ${picked.length} rows")
      val byRank = picked.map(r => r.getLong(1) -> r.getDouble(0)).toMap
      val lo = byRank(loRank)
      val hi = byRank.getOrElse(hiRank, lo)
      // percentile_cont's interpolation, in the same double arithmetic both
      // engines use
      Row(q, lo + (hi - lo) * frac)
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
