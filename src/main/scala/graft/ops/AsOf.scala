package graft.ops

import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** As-of (point-in-time) join — an operator Spark SQL lacks (DuckDB/kdb
  * have it natively; Pandas calls it merge_asof). Preference order from
  * the build brief applies: this is case (a), *composed from existing
  * ops* — a tagged union + running `last(_, ignoreNulls)` window — because
  * built-ins express it exactly, with ONE shuffle on the key and no
  * nested-loop/range scan:
  *
  *   left  (k, ts, …)  ─┐ union, sorted by (ts, side)   window: carry the
  *   right (k, ts, …)  ─┘ within each key partition  →  last right row seen
  *
  * At equal timestamps the right row sorts first, so `right.ts <= left.ts`
  * matches are inclusive — the standard as-of convention.
  */
object AsOf {

  /** For each left row, attach the latest right row (its `rightPick`
    * columns, prefixed) with `right.tsCol <= left.tsCol` on the same key.
    * Left rows with no prior right row are dropped (inner as-of).
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPick: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val r2 = right.select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      struct(rightPick.map(col): _*).as("_rv"))
    val l2 = left.select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      lit(null).cast(r2.schema("_rv").dataType).as("_rv"),
      struct(leftCols.map(col): _*).as("_lv"))
    val r3 = r2.withColumn("_lv", lit(null).cast(l2.schema("_lv").dataType))
    // _rv as final tiebreak: among right rows sharing (key, ts) the
    // greatest pick tuple wins deterministically (the native operator
    // sorts the same way) instead of a partition-layout-dependent pick
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"), col("_rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r3)
      .withColumn("_m", last("_rv", ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_m").isNotNull)
      .select(
        leftCols.map(c => col(s"_lv.$c").as(c)) ++
          rightPick.map(c => col(s"_m.$c").as(prefix + c)): _*)
  }

  /** Same semantics through the custom physical operator
    * (plans.AsOfJoinPlan/Exec — build-brief case (c)): one merge pass over
    * co-partitioned sorted runs instead of union+window, i.e. no window
    * state and ~half the sort volume. Long-typed key/ts only; requires
    * GraftRegistrar.register (or GraftExtensions) so the planner strategy
    * is installed.
    */
  def joinAsOfNative(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPick: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // alias-project the right side so its attribute ids are disjoint from
    // the left's — when both sides derive from one DataFrame (self as-of),
    // shared ids would make column pruning/sort placement resolve our
    // stored right-side attributes against the left child
    val rPlan = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val attrs = Seq(attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTs), attr(rPlan, rightTs))
    require(attrs.forall(_.dataType == LongType),
      s"native as-of join requires LongType key/ts, got ${attrs.map(_.dataType)}")
    // self-register (idempotent): the planner strategy must be installed on
    // THIS session or the custom node has no physical plan
    org.apache.spark.sql.GraftRegistrar.register(left.sparkSession)
    org.apache.spark.sql.GraftRegistrar.ofRows(left.sparkSession,
      AsOfJoinPlan.create(lPlan, rPlan, attrs(0), attrs(1), attrs(2), attrs(3),
        rightPick.map(attr(rPlan, _)), prefix))
  }
}
