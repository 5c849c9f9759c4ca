package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Backward (inclusive) AS-OF JOIN as a whole-operator extension — the
  * SURVEY §2.10 tier-(c) path: a custom LogicalPlan + SparkStrategy +
  * SparkPlan, because no composition of built-in operators expresses
  * "latest right row per left row" without either an O(n·m) range join
  * that explodes before re-aggregating, or a union+window trick that
  * shuffles both relations into one window.
  *
  * Semantics (the twin of DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.t >= r.t`, which the oracle uses): for every left row, the single
  * right row with equal key and the greatest right-time <= left-time;
  * null-extended when no such row. Null keys/times never match.
  *
  * Physical shape — a sort-merge pass, NOT a candidate-explosion: both
  * children hash-partitioned on the key (declared via
  * requiredChildDistribution, so EnsureRequirements inserts co-partitioned
  * exchanges exactly like a SortMergeJoin) and sorted by (key, time);
  * each partition pair is merged with one forward-only pointer into the
  * right side. Per-partition cost is |L| + |R|, memory is one buffered
  * right row — at 100 TB the plan is two shuffles and a linear merge,
  * identical in shape to the engine's own SMJ.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    tolerance: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** A custom node is opaque to Catalyst's own pushdown rules, so a Filter
  * sitting above [[AsOfJoin]] would stall there and the left scan would
  * read everything. This rule restores the standard join behavior for the
  * safe direction: deterministic conjuncts that reference only LEFT
  * attributes commute with the as-of (every left row yields exactly one
  * output row with its left columns intact) and move below the node,
  * where PhysicalOperation / FileSourceStrategy carries them into the
  * parquet scan. Right-side conjuncts must stay put (null-extension).
  * Injected next to the strategy by [[graft.GraftExtensions]] /
  * [[AsOf.register]]. */
object PushFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]; injected via
  * [[graft.GraftExtensions]] or `spark.experimental.extraStrategies`
  * ([[AsOf.register]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = false, None) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = false, None) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // left rows pass through in their sorted order, in left's partitioning —
  // declaring both lets downstream sorts/exchanges on the same keys elide
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val tol = tolerance
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      // bind the projection against the NULL-EXTENDED right schema (the
      // join's output contract), not the child's: a right child that
      // declares non-null columns (the synth DSv2 source does; parquet
      // never does) would otherwise codegen null-check-free reads and NPE
      // on the first null-extended row
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // the last right row whose (key, time) was <= some seen left row,
      // with the key it matched under: rows behind the pointer are only
      // dropped once a strictly later candidate (or key) replaces them
      var lastMatch: InternalRow = null
      var lastKey: InternalRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        val ltRow = lTimeProj(l)
        if (!lk.anyNull && !ltRow.isNullAt(0)) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val c = keyOrd.compare(rKeyProj(r), lk)
            if (c < 0) { rBuf.next(); () } // key already behind every future left row
            else if (c > 0) advance = false
            else {
              val rt = rTimeProj(r)
              if (rt.isNullAt(0)) { rBuf.next(); () } // null time never matches
              else if (timeOrd.compare(rt, ltRow) <= 0) {
                // iterator rows are reused buffers: copy what we keep
                lastMatch = rBuf.next().copy()
                lastKey = lk.copy()
              } else advance = false
            }
          }
        }
        val pointerMatch = !lk.anyNull && !ltRow.isNullAt(0) &&
          lastKey != null && keyOrd.compare(lastKey, lk) == 0
        // tolerance (pandas merge_asof semantics): a latest-match older than
        // leftTime - tol null-extends instead of matching. Time columns are
        // integral (validated in AsOf.joinAsOf), so the bound is a long
        // subtraction on the projected values.
        val matched = pointerMatch && (tol match {
          case Some(t) =>
            ltRow.getLong(0) - rTimeProj(lastMatch).getLong(0) <= t
          case None => true
        })
        numOutputRows += 1
        if (matched) { numMatched += 1; outProj(joined(l, lastMatch)) }
        else outProj(joined(l, nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API. Key/time columns are named (resolved against each
  * side's analyzed output), so no Column internals are touched. */
object AsOf {

  /** Idempotently add the planner strategy + pushdown rule to an existing
    * session. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PushFilterThroughAsOf))
      spark.experimental.extraOptimizations = opts :+ PushFilterThroughAsOf
    val opts2 = spark.experimental.extraOptimizations
    if (!opts2.contains(RewriteRangeJoin))
      spark.experimental.extraOptimizations = opts2 :+ RewriteRangeJoin
  }

  /** left ASOF LEFT JOIN right ON leftKey = rightKey AND leftTime >= rightTime
    * (backward inclusive; the DuckDB ASOF twin). Output = left columns ++
    * right columns (null-extended). Right columns are re-aliased when the
    * two sides share attribute ids (self-join), so callers can as-of a
    * relation against itself.
    *
    * `tolerance` (pandas merge_asof semantics): when set, a latest match
    * older than `leftTime - tolerance` null-extends instead of matching —
    * "the last touch, but only if within the attribution window". Units are
    * those of the (integral, LongType) time columns.
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lp = left.queryExecution.analyzed
    val right2 =
      if (lp.outputSet.intersect(right.queryExecution.analyzed.outputSet).nonEmpty)
        right.select(right.columns.map(n => right.col(n).as(n)).toIndexedSeq: _*)
      else right
    val rp = right2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
    val (lt, rt) = (attr(lp, leftTime), attr(rp, rightTime))
    if (tolerance.isDefined)
      Seq(lt, rt).foreach(a => require(
        a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of tolerance needs LongType time columns, '${a.name}' is ${a.dataType}"))
    GraftPlanBridge.ofRows(spark, AsOfJoin(
      lp, rp,
      Seq(attr(lp, leftKey)), Seq(attr(rp, rightKey)),
      lt, rt, tolerance))
  }
}
