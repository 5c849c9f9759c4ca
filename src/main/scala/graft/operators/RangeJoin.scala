package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned point-in-interval join — the scale-safe form of
  * `point BETWEEN lo AND hi`.
  *
  * Vanilla Spark plans a pure inequality join as BroadcastNestedLoopJoin
  * (every point × every interval — quadratic, the classic 100 TB cliff;
  * DuckDB special-cases it with IEJoin, Spark does not). The standard
  * distributed answer is bin overlap: explode each interval into the integer
  * bins it covers, tag each point with its single bin, equi-join on the bin
  * (hash shuffle, partial pruning, AQE-skew-splittable like any other
  * equi-join), and re-check the exact predicate. Each interval duplicates
  * into span/binWidth + 1 rows — pick `binWidth` near the TYPICAL interval
  * span so the blow-up factor stays ~2 and no bin becomes a hot key.
  *
  * Both inputs keep all their columns (the bin column is dropped); the
  * output is exactly the rows the naive theta-join would produce, in
  * equi-join time. */
object RangeJoin {

  /** Join `points` to `intervals` where
    * `intervals(lo) <= points(point) <= intervals(hi)`.
    *
    * `toBin` maps a point-typed Column to a LONG bin ordinal (e.g. for
    * dates: `d => floor(datediff(d, lit("1992-01-01")) / 16)`); it MUST be
    * monotonic so an interval covers exactly the bins
    * `toBin(lo)..toBin(hi)`.
    *
    * Guarded like [[graft.plans.RewriteRangeJoin]] (one bad row must not
    * blow up the job): an INVERTED interval (lo > hi — corrupt rows)
    * produces no bins instead of a DESCENDING `sequence()` over the whole
    * bin space, and an interval wider than `maxBinsPerInterval` bins
    * (validity sentinels like hi = 9999-12-31) routes to a broadcast
    * nested-loop branch over those few rows instead of exploding each one
    * into ~180k generated rows. Null-bounded intervals match nothing in
    * either branch — the exact predicate could never hold. */
  def pointInInterval(
      points: DataFrame, point: String,
      intervals: DataFrame, lo: String, hi: String,
      toBin: Column => Column,
      maxBinsPerInterval: Long = 256): DataFrame = {
    val span = toBin(col(hi)).cast("long") - toBin(col(lo)).cast("long")
    val exact = col(point) >= col(lo) && col(point) <= col(hi)
    val binnedPoints = points.withColumn("__bin", toBin(col(point)).cast("long"))
    val binnedIvals = intervals
      .filter(span.between(0L, maxBinsPerInterval))
      .withColumn("__bin",
        explode(sequence(toBin(col(lo)).cast("long"), toBin(col(hi)).cast("long"))))
    val narrow = binnedPoints.join(binnedIvals, Seq("__bin"))
      .filter(exact)
      .drop("__bin")
    val wide = points.join(
      broadcast(intervals.filter(span > maxBinsPerInterval)), exact)
    narrow.unionByName(wide.select(narrow.columns.map(col): _*))
  }

  /** Date-bin helper: days since epoch / `widthDays`. */
  def dateBin(widthDays: Int): Column => Column =
    d => floor(datediff(d, lit(java.sql.Date.valueOf("1992-01-01"))) / widthDays)
}
