package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom-filter membership probe over a LONG key column.
  *
  * Why a custom Catalyst expression (same rationale as [[DotProductF]]):
  * the map-side prune in `Contamination.ngramOverlapBloom` runs once per
  * TRAIN n-gram — the innermost hot loop of the decontamination scale
  * path — and a Scala UDF there pays a boxed JVM call plus a
  * UTF8String→String copy per gram. This expression probes the filter
  * with `mightContainLong` on an already-hashed key (`xxhash64(gram)` is
  * itself codegen'd), so the generated code is one virtual call on a
  * primitive — no allocation, no boxing, inside WholeStageCodegen.
  *
  * The filter object rides the expression tree: `BloomFilterImpl` is
  * `java.io.Serializable` (it ships its bitset via `writeTo`/`readFrom`
  * in `writeObject`), so task serialization broadcasts it in the closure
  * exactly like the UDF capture did — same distribution cost, none of
  * the per-row tax.
  *
  * Probing hashes (not strings) preserves the no-false-negatives
  * contract: every eval gram's hash was inserted, so any train gram equal
  * to an eval gram probes true; hash collisions only add false positives,
  * which the downstream exact semi-join discards.
  */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain requires a BIGINT key, got " +
        child.dataType.catalogString)

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // addReferenceObj pins the deserialized filter in the generated
    // class's references array — resolved once per task, not per row
    val bloomRef = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bloomRef.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_might_contain"
}
