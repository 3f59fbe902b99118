package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical backward as-of join: the plan shape a dedicated ASOF JOIN
  * operator produces — both sides hash-partitioned on the key and sorted
  * by (key, time[, tiebreak]), then ONE streaming merge per partition.
  *
  * Cost: two exchanges (one per side, exactly like a sort-merge join),
  * O(|L|+|R|) merge work, O(1) state per partition (the last qualifying
  * right payload), zero row amplification. Versus the union+window
  * rewrite (`operators/AsOfJoin`): no struct-packing of the right
  * payload, no post-filter of right rows, and the two sides keep their
  * own column layouts end to end.
  *
  * Declared requirements do the heavy lifting: `requiredChildDistribution`
  * (ClusteredDistribution per side) makes EnsureRequirements co-partition
  * the children, `requiredChildOrdering` makes it sort each side within
  * partitions — the merge itself then never shuffles or sorts. The
  * execute path is a row-at-a-time interpreted merge (not whole-stage
  * codegen): as-of joins are bandwidth-bound on the sort, not
  * compute-bound on the merge, so codegen would buy little here.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    carry: Seq[Expression],
    rightTieBreak: Seq[Expression],
    carryOut: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carryOut

  // carried output attrs are minted here (fresh exprIds), not read from
  // the children — declare them produced or the node renders as invalid
  override def producedAttributes:
      org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carryOut)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +:
        rightTieBreak.map(SortOrder(_, Ascending))))

  // rows stream out in the left child's partitioning and order
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    // hoist everything the merge needs OUT of the task closure: capturing
    // `left`/`right` (SparkPlans) serializes the plan tree into the task,
    // where transient children make .output resolve empty and projection
    // binding fails with ATTRIBUTE_NOT_FOUND
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val (lKeys, rKeys) = (leftKeys, rightKeys)
    val (lTime, rTime) = (leftTime, rightTime)
    val carryExprs = carry
    val nCarry = carryOut.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val carryProj = UnsafeProjection.create(carryExprs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullCarry = new GenericInternalRow(nCarry)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        // last qualifying right payload + the key it belongs to (copies —
        // the projections reuse their buffers)
        private var lastCarry: UnsafeRow = _
        private var lastKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTimeRow = lTimeProj(l)
          // SQL NULL semantics on the LEFT side: a NULL left time matches
          // nothing (getLong on a null slot would read 0 — under the
          // forward direction's negated axis that is the MAXIMUM, and the
          // row would wrongly consume the whole right key group). NULL
          // left times sort first within the key group, so skipping the
          // advance keeps the merge position correct.
          if (lTimeRow.isNullAt(0)) {
            numOutputRows += 1
            return resultProj(joined(l, nullCarry))
          }
          val lT = lTimeRow.getLong(0)
          // advance the right side up to (key, time): every right row
          // consumed with the same key becomes the freshest candidate
          var advancing = rHead != null
          while (advancing) {
            val cmp = keyOrd.compare(rKeyProj(rHead), lKey)
            if (cmp < 0 ||
                (cmp == 0 && rTimeProj(rHead).getLong(0) <= lT)) {
              if (cmp == 0) {
                lastCarry = carryProj(rHead).copy()
                lastKey = lKey.copy()
              }
              rHead = if (rIter.hasNext) rIter.next() else null
              advancing = rHead != null
            } else advancing = false
          }
          val matched = lastKey != null && keyOrd.compare(lastKey, lKey) == 0
          numOutputRows += 1
          resultProj(joined(l, if (matched) lastCarry else nullCarry))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the physical merge;
  * injected via `GraftExtensions` (injectPlannerStrategy). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
        p.carry, p.rightTieBreak, p.carryOut,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}
