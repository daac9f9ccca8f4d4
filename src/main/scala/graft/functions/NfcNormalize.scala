package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization (`graft_nfc`) — the canonical-composition
  * pass every multilingual corpus pipeline runs before hashing/dedup:
  * decomposed sequences ("e" + U+0301) and their precomposed forms (U+00E9)
  * MUST hash identically or every dedup/fingerprint operator silently treats
  * them as distinct documents.
  *
  * Why a custom Catalyst expression (the build-brief preference order):
  * Spark ships no normalization builtin, and a Scala UDF would pay
  * serialization + boxing per row. `doGenCode` emits a direct call to
  * [[NfcNormalize.nfc]] inside the WholeStageCodegen stage — one static
  * JVM call per row, no lambda, no Row boxing. The JDK's
  * `java.text.Normalizer` implements the same Unicode canonical
  * composition DuckDB's `nfc_normalize` does, which is what makes the
  * operator oracle-checkable cross-engine (q125).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {
  /** Static helper the generated code calls: UTF8String in/out, ASCII fast
    * path (NFC is the identity on ASCII — `isNormalized` is O(n) with no
    * allocation, so the common all-ASCII row skips the String round-trip).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
