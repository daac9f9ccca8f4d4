package org.apache.spark.sql

import graft.functions.{DotProductF, NfcNormalize}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's native expressions on an already-created session.
  * `SparkSessionExtensions` (see graft.functions.GraftExtensions) is the
  * front door, but it only applies at session construction — the driver
  * hands us a plain session, so this package-private-access shim (the same
  * pattern Spark's own test utilities use) covers that path. Idempotent:
  * re-registration just overwrites.
  */
object GraftRegistrar {
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // functionExists guards keep repeat register() calls (every query run
    // routes through here) from spamming "replaced a previously registered
    // function" WARNs into bench/verify logs
    if (!classic.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_dot")))
      classic.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
        (children: Seq[Expression]) => DotProductF(children(0), children(1)))
    if (!classic.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_nfc")))
      classic.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("graft_nfc"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
        (children: Seq[Expression]) => NfcNormalize(children.head))
    // experimental.* are the public post-creation hooks for optimizer
    // rules and planner strategies (extensions only apply at builder time)
    if (!classic.experimental.extraOptimizations.contains(graft.functions.RewriteDotProduct))
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ graft.functions.RewriteDotProduct
    if (!classic.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!classic.experimental.extraOptimizations.contains(graft.plans.MvRewrite.Rule))
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ graft.plans.MvRewrite.Rule
    if (!classic.experimental.extraOptimizations.contains(graft.plans.SkipRewrite.Rule))
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ graft.plans.SkipRewrite.Rule
  }

  /** DataFrame from a hand-built logical plan (Dataset.ofRows is
    * private[sql]; this shim is the sanctioned-pattern bridge for
    * libraries constructing plans directly).
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column from a raw Catalyst expression — the bridge expressions that
    * carry non-Column state (e.g. a Bloom filter object) need, since they
    * cannot route through `call_function`.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Inverse bridge: the Catalyst expression behind a Column, for wrapping
    * built-in columns (e.g. `xxhash64(...)`) as children of hand-built
    * expressions.
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
