package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator rung of the extension ladder
  * (logical node + planner strategy + physical operator, injected via
  * [[GraftExtensions]]).
  *
  * Semantics: for each left row, append the payload of the LAST right
  * row with the same key and `rightTime <= leftTime` (backward ASOF,
  * inclusive — the same contract as DuckDB's `ASOF LEFT JOIN ... ON
  * l.k = r.k AND l.t >= r.t` and as the windowed composition in
  * [[graft.operators.Relational.asOfJoinEventsOrders]]). No match →
  * nulls.
  *
  * Scale shape: both sides hash-cluster on the key and sort by
  * (key, time) — EnsureRequirements inserts the exchanges/sorts — then
  * each co-partition pair merges in ONE forward pass with O(1) state
  * (the current candidate right row). That is the same shuffle bill as
  * one sort-merge join, with none of the pair-blowup of the equi-join +
  * filter + argmax formulation. Scope: single join key; key and time
  * must be 64-bit integers (the engine's event/order axes) — documented
  * here rather than generalized, since the point of this operator is
  * the planner integration, not a type lattice.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, leftTime: Expression,
                        rightKey: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(lk, lt, rk, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, leftTime: Expression,
                        rightKey: Expression, rightTime: Expression,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-cluster both sides on the join key (same distribution contract
    * as a shuffled hash/sort-merge join — EnsureRequirements aligns the
    * partition counts). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** (key, time) sort on both sides turns the per-partition join into a
    * single merge pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKey; val lt = leftTime; val rk = rightKey; val rt = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk, lt), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk, rt), rightOut)
      val outProj = UnsafeProjection.create(outAttrs, leftOut ++ rightOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)

      // one-row lookahead over the right side; NULL key/time rows are
      // never match candidates (same contract as DuckDB ASOF and the
      // windowed composition) — they sort first under nulls-first
      // Ascending, so skipping them inside the merge loop is safe
      var rRow: InternalRow = null
      var rKeyV = 0L; var rTimeV = 0L; var rNull = false
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next()
          val k = rKeyProj(rRow)
          rNull = k.isNullAt(0) || k.isNullAt(1)
          if (!rNull) { rKeyV = k.getLong(0); rTimeV = k.getLong(1) }
        } else rRow = null
      advanceRight()

      // last right row that matched the current key (rt <= current lt)
      var candidate: InternalRow = null
      var candidateKey = 0L

      lIter.map { lRow =>
        val k = lKeyProj(lRow)
        if (k.isNullAt(0) || k.isNullAt(1)) {
          // NULL-keyed/timed left rows match nothing: null-extend
          outProj(joined(lRow, nullRight))
        } else {
          val lKeyV = k.getLong(0); val lTimeV = k.getLong(1)
          // consume right rows that are now visible to this left row
          while (rRow != null && (rNull ||
            rKeyV < lKeyV || (rKeyV == lKeyV && rTimeV <= lTimeV))) {
            if (!rNull && rKeyV == lKeyV) {
              candidate = rRow.copy() // right rows are buffer-reused
              candidateKey = rKeyV
            }
            advanceRight()
          }
          val matched =
            if (candidate != null && candidateKey == lKeyV) candidate else nullRight
          outProj(joined(lRow, matched))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
