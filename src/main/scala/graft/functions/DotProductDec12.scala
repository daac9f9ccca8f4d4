package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Runtime kernel for [[DotProductDec12F]] — kept as a plain static method
  * so the generated code is one call per row (no interpreted Expression
  * tree in the hot loop).
  */
object DotProductDec12 {
  private val Scale = 12
  private val CastPrecision = 28
  private val SumPrecision = 38

  /** Bit-exact replica of the exploded decimal-bridge pipeline
    *
    *   SUM(CAST(a.x * b.x AS DECIMAL(28,12)))  over  a JOIN b USING (i)
    *
    * term by term:
    *  - paired indices are 0..min(n,m)-1 (the inner join on i);
    *  - a null element on either side nulls the product, which SUM skips;
    *  - the product is one IEEE double multiply (identical to the exploded
    *    form, whose x columns were already cast to double);
    *  - NaN/Infinity and values whose rounded form exceeds precision 28
    *    cast to null under non-ANSI Cast, which SUM skips;
    *  - double→DECIMAL(28,12) is HALF_UP on the shortest decimal string
    *    (Spark's Decimal.set(Double) goes through Double.toString via
    *    JBigDecimal.valueOf — replicated verbatim here);
    *  - decimal addition is exact and order-independent, so this
    *    sequential loop equals any partial-aggregation tree;
    *  - zero surviving terms → null (SUM over an empty/all-null group).
    *
    * Accumulation runs on an unscaled long (|sum| < 2^63 / 10^12 ≈ 9.2e6
    * covers every embedding workload) and falls over to BigDecimal on
    * overflow, so the fast path allocates only the per-term rounding.
    */
  def compute(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): Decimal = {
    val n = math.min(x.numElements(), y.numElements())
    var accL = 0L
    var accB: JBigDecimal = null
    var terms = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val p = (if (xf) x.getFloat(i).toDouble else x.getDouble(i)) *
          (if (yf) y.getFloat(i).toDouble else y.getDouble(i))
        if (!java.lang.Double.isNaN(p) && !java.lang.Double.isInfinite(p)) {
          val bd = JBigDecimal.valueOf(p).setScale(Scale, RoundingMode.HALF_UP)
          if (bd.precision <= CastPrecision) {
            terms += 1
            if (accB != null) accB = accB.add(bd)
            else {
              val bi = bd.unscaledValue
              if (bi.bitLength < 63) {
                val u = bi.longValue
                val s = accL + u
                if (((accL ^ s) & (u ^ s)) < 0) // long overflow
                  accB = JBigDecimal.valueOf(accL, Scale).add(bd)
                else accL = s
              } else accB = JBigDecimal.valueOf(accL, Scale).add(bd)
            }
          }
        }
      }
      i += 1
    }
    if (terms == 0) null
    else {
      val sum = if (accB != null) accB else JBigDecimal.valueOf(accL, Scale)
      val d = Decimal(sum)
      // Sum(DECIMAL(28,12)) declares DECIMAL(38,12); overflow → null
      if (d.changePrecision(SumPrecision, Scale)) d else null
    }
  }
}

/** Per-row decimal-bridged dot product over two `array<float|double>`
  * columns, returning DECIMAL(38,12) — the exact value (and type) the
  * oracle-parity pipeline `posexplode → join on i → SUM(CAST(x*y AS
  * DECIMAL(28,12)))` produces, without the explode, the join, or the
  * aggregation exchange (guide §2.4: remove the shuffle outright). The
  * callers that need the double form add `.cast(DoubleType)`, exactly
  * where the old pipeline did.
  *
  * Unlike [[DotProductF]] (fast double math for the production ANN
  * operators), this expression exists for the DECLARED queries whose
  * DuckDB oracle replays the decimal bridge: results must stay
  * bit-identical across engines AND across this plan change.
  */
case class DotProductDec12F(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_dec12 requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DecimalType(38, 12)

  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductDec12.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val r = ctx.freshName("dec12")
      s"""
         |org.apache.spark.sql.types.Decimal $r =
         |  graft.functions.DotProductDec12.compute($x, $y,
         |    ${elemIsFloat(left)}, ${elemIsFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDec12F =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot_dec12"
}
