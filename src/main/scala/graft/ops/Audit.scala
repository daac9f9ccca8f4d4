package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-quality constraint auditing (the Deequ/Great-Expectations shape)
  * — the validation gate a training-data pipeline runs before a corpus
  * version is allowed downstream: completeness, uniqueness, row-level
  * consistency, value ranges, and cross-table referential integrity,
  * each reported as (check_name, n_checked, n_violations, passed).
  *
  * Scale shape: ALL single-table checks fuse into ONE aggregation pass
  * over the table (each check is an aggregate expression — a violation
  * counter — evaluated in the same map-side-combined agg), then explode
  * to one row per check; N checks never cost N scans. Referential
  * checks are one anti-join each (child-keyed shuffle, parent side
  * broadcast when small). Everything is exact integer counting.
  */
object Audit {

  /** One constraint: `violations` must be an AGGREGATE expression
    * counting violating rows (e.g. `sum(when(cond, 1))`).
    */
  final case class Check(name: String, violations: Column)

  /** Uniqueness violations = rows − distinct keys. */
  def unique(name: String, key: Column): Check =
    Check(name, count(lit(1)) - count_distinct(key))

  /** Completeness violations = null rows. */
  def complete(name: String, c: Column): Check =
    Check(name, sum(when(c.isNull, 1L).otherwise(0L)))

  /** Row-predicate violations (consistency / range rules). */
  def satisfies(name: String, pred: Column): Check =
    Check(name, sum(when(!pred, 1L).otherwise(0L)))

  /** Run all checks in ONE aggregation pass over `df`. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = count(lit(1)).as("_n") +:
      checks.zipWithIndex.map { case (c, i) => c.violations.as(s"_v$i") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check_name"),
          col("_n").cast(LongType).as("n_checked"),
          coalesce(col(s"_v$i"), lit(0L)).cast(LongType).as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.check_name"), col("r.n_checked"), col("r.n_violations"),
        when(col("r.n_violations") === 0L, 1L).otherwise(0L).as("passed"))
  }

  /** Cross-table referential integrity: child keys with no parent.
    * One row, same schema as [[audit]]'s output.
    */
  def refCheck(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("n_checked"))
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
        "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    total.crossJoin(orphans)
      .select(lit(name).as("check_name"),
        col("n_checked").cast(LongType).as("n_checked"),
        col("n_violations").cast(LongType).as("n_violations"),
        when(col("n_violations") === 0L, 1L).otherwise(0L).as("passed"))
  }
}
