package graft.plans

import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan

/** Plans the logical as-of node to its merge-join physical operator.
  * Injected via GraftExtensions (builder path) or
  * experimental.extraStrategies (live-session path).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.rightKey, j.leftTs, j.rightTs, j.rightPick, j.output) :: Nil
    case _ => Nil
  }
}
