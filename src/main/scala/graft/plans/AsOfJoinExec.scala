package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: a single forward merge pass over two inputs that
  * EnsureRequirements has co-partitioned on the key (ClusteredDistribution
  * ×2) and sorted by (key, ts) (requiredChildOrdering). Per partition:
  * two pointers, O(|L| + |R|), no buffering beyond one projected match
  * row per key — the same execution shape kdb/QuestDB use for asof, here
  * as a Spark operator so it scales with partition count.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    rightPick: Seq[Attribute],
    output: Seq[Attribute]) extends BinaryExecNode {

  override def producedAttributes: AttributeSet =
    AttributeSet(output.drop(left.output.size))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // right side additionally sorted by the pick columns: among right rows
  // sharing (key, ts) the merge keeps the LAST seen, so the greatest pick
  // tuple wins — deterministic and identical to the composite form
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightPick.map(a => SortOrder(a, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    val rightOutput = right.output
    val pick = rightPick
    val lWidth = left.output.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val pickProj = UnsafeProjection.create(pick, rightOutput)
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHasHead = false
        private var matchKey = 0L
        private var matchRow: InternalRow = _
        private var nextOut: InternalRow = _

        private def advanceRightHead(): Unit =
          if (rIter.hasNext) { rHead = rIter.next(); rHasHead = true }
          else { rHead = null; rHasHead = false }

        advanceRightHead()

        private def computeNext(): Unit = {
          nextOut = null
          while (nextOut == null && lIter.hasNext) {
            val l = lIter.next()
            if (!l.isNullAt(lKeyIdx) && !l.isNullAt(lTsIdx)) {
              val k = l.getLong(lKeyIdx)
              val ts = l.getLong(lTsIdx)
              // consume all right rows at or before (k, ts)
              var advancing = true
              while (advancing && rHasHead) {
                if (rHead.isNullAt(rKeyIdx) || rHead.isNullAt(rTsIdx)) advanceRightHead()
                else {
                  val rk = rHead.getLong(rKeyIdx)
                  val rts = rHead.getLong(rTsIdx)
                  if (rk < k || (rk == k && rts <= ts)) {
                    if (rk == k) { matchKey = k; matchRow = pickProj(rHead).copy() }
                    advanceRightHead()
                  } else advancing = false
                }
              }
              if (matchRow != null && matchKey == k)
                nextOut = resultProj(joined(l, matchRow))
            }
          }
        }

        // advance lazily in hasNext: the emitted row shares the projection
        // buffer, so the next row may only be computed after the caller
        // has consumed the previous one
        private var computed = false
        override def hasNext: Boolean = {
          if (!computed) { computeNext(); computed = true }
          nextOut != null
        }
        override def next(): InternalRow = {
          if (!computed) computeNext()
          computed = false
          nextOut
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
