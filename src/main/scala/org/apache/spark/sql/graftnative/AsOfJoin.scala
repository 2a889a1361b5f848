// Lives in an org.apache.spark.sql subpackage to reach private[sql]
// surfaces (classic.Dataset.ofRows) — same pattern as CosineSimilarity.
package org.apache.spark.sql.graftnative

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Ascending, Attribute, BindReferences, Expression, JoinedRow,
  NamedExpression, NullsFirst, PredicateHelper, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{
  BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native backward as-of join (SURVEY.md §2.4, §2.12): for every left
  * row, the single right row with the same key and the greatest
  * `rightTime <= leftTime` (ties broken by `rightTieBreak`, greatest
  * wins); left rows with no match are dropped (inner semantics).
  *
  * This is the whole-operator escalation path the build plan reserves
  * for semantics Spark's built-ins can't express as ONE operator
  * (composed forms: union+window in `q13_join_asof`, or join+argmax —
  * both materialize/sort the union of the two streams). The custom
  * plan instead:
  *
  *   - declares `ClusteredDistribution` on the join keys for BOTH
  *     children, so EnsureRequirements co-partitions the two sides
  *     exactly like a shuffle join (and reuses existing partitioning
  *     when an upstream already hashed on the key — zero extra
  *     exchange in that case);
  *   - declares per-child `(key, time)` sort orders, so each side is
  *     sorted independently (two smaller sorts instead of one big
  *     union sort);
  *   - merges the two sorted streams per partition in ONE forward
  *     pass holding O(1) state (the latest matching right row) —
  *     no window buffer, no per-key grouping, spill-free.
  *
  * At 100 TB this is the plan you want: both sides shuffle once on the
  * key (or not at all if bucketed), and the probe is a pipelined merge.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    outer: Boolean = false,
    forward: Boolean = false,
    nearest: Boolean = false,
    toleranceMicros: Long = -1L)
  extends BinaryNode {
  // left-outer: unmatched left rows are kept, right side null-padded
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule exemplar: deterministic predicates over left-side
  * attributes commute with the as-of join (it never duplicates or
  * alters left rows, only drops non-matches), so push them below the
  * join — the filter then runs BEFORE the shuffle instead of after.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Physical strategy: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, outer, fwd, near, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, outer, fwd, near, tol,
                   planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    outer: Boolean,
    forward: Boolean,
    nearest: Boolean,
    toleranceMicros: Long,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true))
                    else right.output)

  // Co-partition both sides on the join keys; EnsureRequirements
  // inserts (or reuses) hash exchanges and makes the specs compatible,
  // exactly as it does for shuffle joins / CoGroupExec.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Each side sorted by (key, time) — right additionally by the tie
  // break so "last row consumed" is deterministic under equal times.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending, NullsFirst, Seq.empty)),
    (rightKeys ++ (rightTime +: rightTieBreak))
      .map(SortOrder(_, Ascending, NullsFirst, Seq.empty)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lOut = left.output
    val rOut = right.output
    val lTime = leftTime
    val rTime = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val numOutputRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val lTimeEval = BindReferences.bindReference(lTime, lOut)
      val rTimeEval = BindReferences.bindReference(rTime, rOut)
      val timeOrd =
        TypeUtils.getInterpretedOrdering(rTime.dataType)
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(rOut.size)
      // locals so the task closure doesn't capture the plan node
      val isOuter = outer
      val isForward = forward
      val isNearest = nearest
      val tol = toleranceMicros
      def asLong(v: Any): Long = v.asInstanceOf[Number].longValue

      new Iterator[InternalRow] {
        private var held: UnsafeRow = null       // latest matching right row
        private var heldKey: UnsafeRow = null    // its key (copied)
        private var heldTime: Long = 0L          // its time (for tolerance)
        private var pending: InternalRow = null

        private def computeNext(): InternalRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l)
            var matched: InternalRow = null
            if (!lk.anyNull) {
              val lt = lTimeEval.eval(l)
              if (lt != null && !isForward) {
                // BACKWARD: consume rows whose key sorts before lk,
                // and same-key rows with time <= lt (keeping the last
                // = greatest (time, tieBreak) thanks to the sort).
                var scan = true
                while (scan && rBuf.hasNext) {
                  val r = rBuf.head
                  val rk = rKeyProj(r)
                  val cmp = keyOrd.compare(rk, lk)
                  if (cmp < 0) rBuf.next()
                  else if (cmp == 0) {
                    val rt = rTimeEval.eval(r)
                    if (rt == null) rBuf.next() // null time never matches
                    else if (timeOrd.asInstanceOf[Ordering[Any]].lteq(rt, lt)) {
                      held = rBuf.next().asInstanceOf[UnsafeRow].copy()
                      heldKey = lk.copy()
                      if (tol >= 0 || isNearest) heldTime = asLong(rt)
                    } else scan = false
                  } else scan = false
                }
                val backOk = held != null &&
                  keyOrd.compare(heldKey, lk) == 0 &&
                  (tol < 0 || asLong(lt) - heldTime <= tol)
                if (!isNearest) {
                  if (backOk) matched = held
                } else {
                  // NEAREST: the backward advance leaves the head at
                  // the first same-key row with time > lt — the
                  // forward candidate. Smaller gap wins; ties go
                  // backward (the pandas merge_asof convention).
                  var fwdRow: InternalRow = null
                  var fwdGap = Long.MaxValue
                  if (rBuf.hasNext &&
                      keyOrd.compare(rKeyProj(rBuf.head), lk) == 0) {
                    val rt2 = rTimeEval.eval(rBuf.head)
                    if (rt2 != null) {
                      val g = asLong(rt2) - asLong(lt)
                      if (tol < 0 || g <= tol) {
                        fwdRow = rBuf.head; fwdGap = g
                      }
                    }
                  }
                  val backGap =
                    if (backOk) asLong(lt) - heldTime else Long.MaxValue
                  if (backOk && backGap <= fwdGap) matched = held
                  else if (fwdRow != null) matched = fwdRow
                }
              } else if (lt != null) {
                // FORWARD: discard rows whose key sorts before lk or
                // whose time < lt; the head is then the earliest
                // (time, tieBreak) at-or-after lt — match WITHOUT
                // consuming (later, larger-lt lefts may match it too).
                var scan = true
                while (scan && rBuf.hasNext) {
                  val r = rBuf.head
                  val rk = rKeyProj(r)
                  val cmp = keyOrd.compare(rk, lk)
                  if (cmp < 0) rBuf.next()
                  else if (cmp == 0) {
                    val rt = rTimeEval.eval(r)
                    if (rt == null ||
                        timeOrd.asInstanceOf[Ordering[Any]].lt(rt, lt)) rBuf.next()
                    else scan = false
                  } else scan = false
                }
                if (rBuf.hasNext &&
                    keyOrd.compare(rKeyProj(rBuf.head), lk) == 0 &&
                    (tol < 0 ||
                     asLong(rTimeEval.eval(rBuf.head)) - asLong(lt) <= tol)) {
                  matched = rBuf.head
                }
              }
            }
            if (matched != null) {
              numOutputRows += 1
              return joined(l, matched)
            } else if (isOuter) {
              numOutputRows += 1
              return joined(l, nullRight)
            }
          }
          null
        }

        override def hasNext: Boolean = {
          if (pending == null) pending = computeNext()
          pending != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-name-based construction API (graft.plans.AsOf re-exports).
  *
  * The right side is re-aliased through a fresh Project so a self-join
  * (both sides scanning the same table) gets distinct expression ids.
  */
object AsOfJoinApi {
  def join(
      left: DataFrame,
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieBreakCols: Seq[String] = Nil,
      joinType: String = "inner",
      direction: String = "backward",
      toleranceMicros: Long = -1L): DataFrame = {
    val nearest = direction == "nearest"
    val outer = joinType match {
      case "inner" => false
      case "left" | "left_outer" | "leftouter" => true
      case other => throw new IllegalArgumentException(
        s"as-of joinType must be inner or left_outer, got '$other'")
    }
    val forward = direction match {
      case "backward" | "nearest" => false
      case "forward" => true
      case other => throw new IllegalArgumentException(
        s"as-of direction must be backward, forward or nearest, got '$other'")
    }
    val session = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ensureRegistered(session)
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    // fresh exprIds for the right side (self-join safety)
    val rAliases: Seq[NamedExpression] =
      rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$name' in [${out.map(_.name).mkString(", ")}]"))
    val lKeys = leftOn.map(attr(lPlan.output, _))
    val rKeys = rightOn.map(attr(rPlan.output, _))
    val lT = attr(lPlan.output, leftTimeCol)
    val rT = attr(rPlan.output, rightTimeCol)
    require(lKeys.length == rKeys.length,
      s"as-of key count mismatch: $leftOn vs $rightOn")
    lKeys.zip(rKeys).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of key type mismatch: ${a.name}: ${a.dataType} vs ${b.name}: ${b.dataType}")
    }
    require(lT.dataType == rT.dataType,
      s"as-of time type mismatch: ${lT.name}: ${lT.dataType} vs ${rT.name}: ${rT.dataType}")
    val plan = AsOfJoinPlan(
      lPlan, rPlan,
      lKeys,
      rKeys,
      lT,
      rT,
      rightTieBreakCols.map(attr(rPlan.output, _)),
      outer, forward, nearest, toleranceMicros)
    org.apache.spark.sql.classic.Dataset.ofRows(session, plan)
  }

  /** Idempotently register strategy + rule on sessions not built with
    * GraftExtensions (the driver's Verify/Bench sessions).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    if (!exp.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      exp.extraOptimizations = exp.extraOptimizations :+ PushFilterThroughAsOfJoin
  }
}
