package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe per-key top-k.
  *
  * `row_number().over(partitionBy(key).orderBy(ord)) <= k` funnels every
  * row of a key through ONE task — fine for uniform keys, a hot-partition
  * stall when one key dominates (a 100 TB corpus with one giant source).
  * Standard two-phase rewrite, fully declarative:
  *
  *   1. salt the key with a deterministic hash of `saltOn` into S
  *      subpartitions; per (key, salt) keep the local top-k — every
  *      subpartition holds ~1/S of the hot key;
  *   2. per key, rank the ≤ S·k survivors and keep the global top-k —
  *      the second window's partitions are bounded by S·k rows,
  *      data-size independent.
  *
  * The result (rows AND ranks) is identical to the single-window form
  * because phase 1 only discards rows that phase 2 could never rank ≤ k.
  * `order` must be a total order within a key (include a tie-break) so
  * ranks are deterministic; `saltOn` must be deterministic per row (use
  * the tie-break key), never a random — re-runs and retried tasks have to
  * land a row in the same subpartition.
  */
object TopK {

  def topKPerKey(
      df: DataFrame,
      keys: Seq[Column],
      order: Seq[Column],
      saltOn: Seq[Column],
      k: Int,
      rankCol: String = "rank",
      salts: Int = 16): DataFrame = {
    val salt = pmod(hash(saltOn: _*), lit(salts))
    val local = Window.partitionBy(keys :+ salt: _*).orderBy(order: _*)
    val global = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__topk_lrn", row_number().over(local))
      .filter(col("__topk_lrn") <= k)
      .withColumn(rankCol, row_number().over(global))
      .filter(col(rankCol) <= k)
      .drop("__topk_lrn")
  }
}
