package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join node (build-brief case (c): a whole-operator
  * semantic Spark lacks, carried through planning as a first-class plan).
  *
  * Semantics: for each left row, the single right row with the same key
  * and the greatest `rightTs <= leftTs`; left rows without a match are
  * dropped (inner as-of). Key and timestamp are constrained to integral
  * (long) attributes — the common case (ids + epoch nanos) — which keeps
  * the physical merge loop primitive.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightPick: Seq[Attribute],
    // constructor-held (NOT derived): output attr ids must survive plan
    // copies/transforms, or downstream references dangle
    pickedOutput: Seq[AttributeReference]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ pickedOutput

  // the renamed pick columns originate HERE, not in a child — declare
  // them produced or CheckAnalysis reports them missing-from-input
  override def producedAttributes: AttributeSet = AttributeSet(pickedOutput)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  def create(left: LogicalPlan, right: LogicalPlan, leftKey: Attribute,
      rightKey: Attribute, leftTs: Attribute, rightTs: Attribute,
      rightPick: Seq[Attribute], prefix: String): AsOfJoinPlan =
    AsOfJoinPlan(left, right, leftKey, rightKey, leftTs, rightTs, rightPick,
      rightPick.map(a => AttributeReference(prefix + a.name, a.dataType, a.nullable)()))
}
