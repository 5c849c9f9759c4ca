package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, evaluated in ONE aggregate pass
  * per table — the generalization of the dbt schema-test family (unique /
  * not_null / accepted_values / expression checks; `relationships` stays a
  * join and composes separately).
  *
  * dbt runs each test as its own SELECT — N tests = N scans of the table.
  * At 100 TB one extra scan is the whole budget, so every non-join
  * expectation here compiles to an aggregate expression and ALL of them
  * evaluate in a single partial-aggregatable job (map-side combine, one
  * tiny result row). Each expectation reports its violation count, so one
  * run yields the full quality report, not just the first failure.
  *
  * (reference: models/wh/fct_orders.yml etc. declare unique/not_null/
  * relationships per column — this runs the same assertions batched.)
  */
object Expectations {

  sealed trait Expectation { def name: String; def agg: Column }

  /** `col` must never be null. */
  final case class NotNull(col_ : String) extends Expectation {
    val name = s"not_null($col_)"
    val agg: Column = sum(when(col(col_).isNull, 1L).otherwise(0L))
  }

  /** `col` must be unique (nulls count as violations of uniqueness only if
    * duplicated, matching dbt's unique test which ignores nulls). `col_`
    * may be any SQL expression — e.g. `unhex(order_item_key)` to run the
    * distinct over 16-byte binary instead of 32-char hex (exactly the same
    * cardinality, half the shuffle). */
  final case class Unique(col_ : String) extends Expectation {
    val name = s"unique($col_)"
    // duplicates = non-null rows minus distinct non-null values; exact,
    // partial-aggregatable (count_distinct plans a partial per node)
    val agg: Column = count(expr(col_)) - count_distinct(expr(col_))
  }

  /** `col` must be one of `values` (nulls pass, as in dbt). */
  final case class AcceptedValues(col_ : String, values: Seq[String]) extends Expectation {
    val name = s"accepted_values($col_)"
    val agg: Column = sum(when(
      col(col_).isNotNull && !col(col_).isInCollection(values), 1L).otherwise(0L))
  }

  /** Arbitrary row-level predicate that must hold (violations counted). */
  final case class Expect(label: String, predicate: Column) extends Expectation {
    val name = s"expect($label)"
    val agg: Column = sum(when(!coalesce(predicate, lit(false)), 1L).otherwise(0L))
  }

  final case class Violation(expectation: String, count: Long)

  /** Evaluate every expectation in ONE aggregate job; returns the failing
    * ones (empty = table passes). */
  def check(df: DataFrame, expectations: Seq[Expectation]): Seq[Violation] = {
    require(expectations.nonEmpty)
    val row = df.agg(
      expectations.head.agg.as("e0"),
      expectations.tail.zipWithIndex.map { case (e, i) => e.agg.as(s"e${i + 1}") }: _*
    ).head()
    expectations.zipWithIndex.flatMap { case (e, i) =>
      val n = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (n > 0) Some(Violation(e.name, n)) else None
    }
  }

  /** check() that throws on the first failing table — the `dbt build`
    * gate shape. */
  def enforce(df: DataFrame, table: String, expectations: Seq[Expectation]): Unit = {
    val bad = check(df, expectations)
    require(bad.isEmpty,
      s"$table failed ${bad.length} expectation(s): " +
        bad.map(v => s"${v.expectation}=${v.count}").mkString(", "))
  }
}
