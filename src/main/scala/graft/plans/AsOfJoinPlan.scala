package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical node for the native backward as-of join (SURVEY.md §2.4
  * "joins"; the reference has no join operator at all — this is the
  * canonical time-series enrichment added on top, here as a first-class
  * plan node rather than the union+window rewrite in
  * `operators/AsOfJoin.scala`).
  *
  * Semantics: for every left row, attach `carry` from the LATEST right
  * row with the same key and rightTime <= leftTime (ties on (key, time)
  * resolved by the physical ordering's trailing tiebreak columns — last
  * ascending wins). Left rows with no qualifying right row carry nulls.
  *
  * All expressions arrive RESOLVED (the builder in
  * `operators/NativeAsOf` resolves them against the two children), so
  * the node passes straight through analysis; `carryOut` attributes are
  * created ONCE by the builder and threaded through copies, keeping
  * exprIds stable under `withNewChildrenInternal`.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    carry: Seq[Attribute],
    rightTieBreak: Seq[Attribute],
    carryOut: Seq[AttributeReference]) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join requires matching non-empty key lists")
  require(carry.length == carryOut.length,
    "each carried column needs exactly one output attribute")

  override def output: Seq[Attribute] = left.output ++ carryOut

  // carryOut attrs are minted by this node, not read from the children —
  // without declaring them produced, CheckAnalysis reports them missing
  override def producedAttributes:
      org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carryOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
