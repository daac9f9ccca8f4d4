package graft.ops

import graft.relational.Sql
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-view maintenance — the materialized-view upkeep
  * primitive every standing 100 TB rollup needs: when a CDC batch of
  * inserts and retractions arrives, the new view state is
  * `base ⊕ agg(inserts) ⊖ agg(deletes)` — three map-side-combined hash
  * aggregations and two full-outer merges over AGGREGATE-sized frames —
  * never a re-scan of the standing corpus. COUNT and SUM are the
  * self-maintainable aggregates (they form an abelian group under ⊕);
  * MIN/MAX are deliberately absent — a retraction of the current minimum
  * cannot be repaired from the aggregate alone, which is exactly why
  * production incremental views restrict themselves to group aggregates.
  *
  * Sums run in exact DECIMAL ([[Sql.dec2]]) so `base + ins − del` is
  * bit-identical to a from-scratch recompute on any partitioning — the
  * property the q147 oracle checks by recomputing the final state
  * directly.
  */
object Incremental {

  /** Merge a (count, Σvalue) view: per `keys` group,
    * `n = n_base + n_ins − n_del` and the decimal sum alike; groups whose
    * count reaches zero leave the view. Inputs are ROW frames (the base
    * rows stand in for the stored view in tests; production passes the
    * stored aggregate through an identity-shaped `agg`). Returns
    * keys :+ (n, sum_value) with the sum cast to DOUBLE at the very end.
    */
  def mergeCountSum(base: DataFrame, inserts: DataFrame, deletes: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(Sql.dec2(col(valueCol))).as(s"s_$tag"))
    val z = lit(0).cast(Sql.dec2t)
    side(base, "b")
      .join(side(inserts, "i"), keys, "full_outer")
      .join(side(deletes, "d"), keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_i"), lit(0L)) -
          coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("s_b"), z) + coalesce(col("s_i"), z) -
          coalesce(col("s_d"), z)).as("s")): _*)
      .filter(col("n") > 0L)
      .withColumn("sum_value", col("s").cast("double"))
      .drop("s")
  }
}
