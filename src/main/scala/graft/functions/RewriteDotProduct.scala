package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: recognize the natural lambda formulation of a dot
  * product —
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * — and rewrite it to the native codegen'd [[DotProductF]] (~10× faster,
  * see DotProduct.scala). Users write the idiomatic declarative form;
  * Catalyst swaps in the fast operator — the same contract every built-in
  * rewrite has. Summation order (left-to-right) is preserved, so results
  * are bit-identical.
  *
  * Matching is deliberately conservative: exact shape, double-typed
  * accumulator, identity finish, multiply/add of (possibly cast) lambda
  * variables — anything else is left untouched.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isArrayFD(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  // x * y (modulo casts) over exactly the two lambda args
  private def isMulOfVars(e: Expression, vars: Seq[NamedLambdaVariable]): Boolean = e match {
    case Multiply(l, r, _) =>
      val strip = (x: Expression) => x match { case Cast(c, _, _, _) => c; case o => o }
      val ids = vars.map(_.exprId).toSet
      (strip(l), strip(r)) match {
        case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
          Set(a.exprId, b.exprId) == ids
        case _ => false
      }
    case _ => false
  }

  private def isAddOfVars(e: Expression, vars: Seq[NamedLambdaVariable]): Boolean = e match {
    case Add(l, r, _) =>
      val ids = vars.map(_.exprId).toSet
      (l, r) match {
        case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
          Set(a.exprId, b.exprId) == ids
        case _ => false
      }
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul, zvars, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(add, avars, _),
            finish)
          if isArrayFD(a.dataType) && isArrayFD(b.dataType) &&
            zvars.forall(_.isInstanceOf[NamedLambdaVariable]) &&
            avars.forall(_.isInstanceOf[NamedLambdaVariable]) &&
            isMulOfVars(mul, zvars.map(_.asInstanceOf[NamedLambdaVariable])) &&
            isAddOfVars(add, avars.map(_.asInstanceOf[NamedLambdaVariable])) &&
            isIdentity(finish) =>
        DotProductF(a, b)
    }
}
