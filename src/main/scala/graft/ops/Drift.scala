package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus distribution-drift metrics between two snapshots of a document
  * collection — the monitoring half of a recrawl pipeline ([[Dedup.snapshotDiff]]
  * is the membership half; this is the *content* half). A 100 TB corpus is
  * re-crawled continuously, and the question "did the token distribution
  * move?" has to be answerable without eyeballing documents: per-token
  * frequency shift in ppm, exact integer arithmetic end-to-end so the
  * number is replayable across runs, partitionings, and engines.
  *
  * Scale shape: each snapshot contributes one explode + one hash agg
  * keyed on token (bounded by vocabulary, not corpus size), a 1-row total
  * broadcast back onto the counts, and a full-outer hash join of the two
  * vocabulary-sized frames. No window, no driver-side loop; the final
  * ORDER BY drift LIMIT k is a partial top-k (TakeOrderedAndProject).
  */
object Drift {

  /** Per-token corpus frequency in floor-ppm: ⌊10⁶·cnt/total⌋, computed
    * with integer `div` (operands are non-negative, so Spark's truncating
    * `div` and DuckDB's flooring `//` agree — see [[graft.QueryDef]]).
    * Tokens are the single-space split (the q31 convention), empty
    * fragments dropped.
    */
  def tokenPpm(df: DataFrame, textCol: String): DataFrame = {
    val counts = df
      .select(explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    // the 10⁶·cnt product runs in DECIMAL(38,0): a hot token past ~9.2·10¹²
    // occurrences (reachable at 100 TB) would overflow the BIGINT product
    // (epochMixture's guard, mirrored as HUGEINT in the oracle)
    counts.crossJoin(broadcast(total))
      .select(col("token"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * cnt) div total AS BIGINT)")
          .as("ppm"))
  }

  /** Token-distribution drift between an `old` and a `neu` snapshot:
    * full-outer join of the two [[tokenPpm]] frames (absent → 0 ppm),
    * `drift_ppm = |new_ppm − old_ppm|`. Returns every vocabulary token;
    * callers order by drift and cut top-k (the sum of `drift_ppm` over
    * the whole frame is 2·10⁶ × the total-variation distance between the
    * floored distributions, if a scalar gate is wanted instead).
    */
  def tokenDrift(old: DataFrame, neu: DataFrame, textCol: String): DataFrame = {
    val o = tokenPpm(old, textCol).withColumnRenamed("ppm", "old_ppm")
    val n = tokenPpm(neu, textCol).withColumnRenamed("ppm", "new_ppm")
    o.join(n, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("old_ppm"), lit(0L)).as("old_ppm"),
        coalesce(col("new_ppm"), lit(0L)).as("new_ppm"))
      .withColumn("drift_ppm", abs(col("new_ppm") - col("old_ppm")))
  }
}
