package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic MERGE INTO — the lakehouse upsert algebra (ANSI SQL:2003
  * MERGE, the statement Delta/Iceberg expose): one pass that applies
  * conditional UPDATE/DELETE to matched target rows and conditional
  * INSERT for unmatched source rows. The specific upserts the store layer
  * already runs (`ChatStore.updateUser`, `Similarity.updateIvfPqIndex`)
  * are instances of this operator.
  *
  * Plan shape: ONE equi-join on the merge keys (left_outer when no insert
  * clause, full_outer otherwise) followed by a codegen'd projection —
  * Catalyst broadcasts the (typically CDC-batch-sized) source side when
  * small, and at scale the join co-partitions on the key like any other
  * shuffle join. Never a second pass over the target.
  *
  * Contract (same as SQL MERGE): the source must be KEY-UNIQUE — a target
  * row matched by two source rows is duplicated, where the SQL statement
  * would raise. Clause semantics: the FIRST `WhenMatched` whose condition
  * holds applies (condition `None` = always); a matched row hit by no
  * clause passes through unchanged; unmatched source rows insert iff the
  * `WhenNotMatched` condition holds. Conditions and set-expressions may
  * reference both sides as `t.<col>` and `s.<col>`.
  */
object Merge {

  /** UPDATE (via `set`: target column → expression) or DELETE clause.
    * `set` columns not listed pass through from the target.
    */
  final case class WhenMatched(
      condition: Option[Column] = None,
      set: Map[String, Column] = Map.empty,
      delete: Boolean = false)

  /** INSERT clause: `values` maps target columns to expressions; columns
    * not listed are taken from the source BY NAME (and must exist there).
    * Every inserted value is cast to the target column's type.
    */
  final case class WhenNotMatched(
      condition: Option[Column] = None,
      values: Map[String, Column] = Map.empty)

  def mergeFrames(
      target: DataFrame, source: DataFrame, keys: Seq[String],
      matched: Seq[WhenMatched] = Nil,
      notMatched: Option[WhenNotMatched] = None): DataFrame = {
    require(keys.nonEmpty, "MERGE needs at least one key column")
    // presence markers survive the outer join even if a key column is
    // null-able; `t`/`s` aliases give clause expressions their addresses
    val t = target.withColumn("_t_p", lit(true)).alias("t")
    val s = source.withColumn("_s_p", lit(true)).alias("s")
    val joinCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val joinType = if (notMatched.isDefined) "full_outer" else "left_outer"
    val j = t.join(s, joinCond, joinType)
    val isMatched = col("t._t_p").isNotNull && col("s._s_p").isNotNull
    val tOnly = col("t._t_p").isNotNull && col("s._s_p").isNull
    val sOnly = col("t._t_p").isNull && col("s._s_p").isNotNull

    // first-matching-clause fold (right fold builds the CASE chain in
    // declaration order)
    def firstClause(f: WhenMatched => Column, default: Column): Column =
      matched.foldRight(default)((c, acc) =>
        when(c.condition.getOrElse(lit(true)), f(c)).otherwise(acc))

    val deleteHit = isMatched && firstClause(c => lit(c.delete), lit(false))
    val insertOk = sOnly &&
      notMatched.map(_.condition.getOrElse(lit(true))).getOrElse(lit(false))

    val outCols = target.schema.map { f =>
      val c = f.name
      val keep = col(s"t.$c")
      val matchedVal = firstClause(
        cl => if (cl.delete) keep else cl.set.getOrElse(c, keep), keep)
      val insertVal = notMatched
        .map(nm => nm.values.getOrElse(c, col(s"s.$c")))
        .getOrElse(keep)
      when(isMatched, matchedVal)
        .when(tOnly, keep)
        .otherwise(insertVal.cast(f.dataType))
        .as(c)
    }
    j.filter((isMatched && !deleteHit) || tOnly || insertOk)
      .select(outCols: _*)
  }
}
