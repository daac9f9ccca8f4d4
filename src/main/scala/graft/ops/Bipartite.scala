package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bipartite (user, item) incidence → item–item co-occurrence
  * projection, the q262 shape as a reusable operator WITH the skew
  * guard the query form does not need: q262 projects events on the
  * event-type vocabulary, where |items per user| is bounded by a
  * ~dozen-entry enum, so its per-user self-join is safe uncapped. On a
  * generic catalog (products, URLs, tracks) one crawler/bot user
  * touching 2·10⁴ items contributes |items|² ≈ 4·10⁸ pairs — a single
  * straggler task that dwarfs the rest of the job.
  *
  * The guard is the q192 hub-cap pattern applied to the user side:
  * users over `maxItemsPerUser` keep only their k most INFORMATIVE
  * items — fewest-users-first by global item frequency (a bot's hits
  * on the items everyone touches carry no affinity signal; its hits on
  * rare items do), item-id tiebreak for determinism. Pair fan-out per
  * user is then ≤ k², and total wedge mass ≤ k·Σ|items per user| —
  * linear in the incidence, independent of the worst user. The cap is
  * OBSERVABLE: rows dropped surface via the `graft.bipartite.cap.*`
  * observation metric, so a pipeline can alert instead of silently
  * degrading.
  *
  * Co-occurrence counts for pairs of items whose users are all under
  * the cap are EXACT (the cap touches only over-cap users' rows);
  * q262's uncapped oracle semantics remain the query-layer contract.
  */
object Bipartite {

  private val obsId = new java.util.concurrent.atomic.AtomicLong()

  /** (item_a, item_b, co_users) with item_a < item_b, from a (user,
    * item) frame (deduplicated here — duplicate interactions don't
    * change co-occurrence). `maxItemsPerUser = Int.MaxValue` restores
    * the exact uncapped projection.
    */
  def projectCapped(incidence: DataFrame, userCol: String, itemCol: String,
      maxItemsPerUser: Int): DataFrame = {
    require(maxItemsPerUser > 0, "maxItemsPerUser must be positive")
    val inc = incidence
      .select(col(userCol).as("u"), col(itemCol).as("it"))
      .distinct()
    val freq = inc.groupBy("it").agg(count(lit(1)).as("_f"))
    // the observe node sits UPSTREAM of the cap filter so it counts the
    // rows the cap drops (downstream it would always read zero)
    val kept = inc.join(freq, Seq("it"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("u").orderBy(col("_f").asc, col("it").asc)))
      .observe(s"graft.bipartite.cap.${obsId.incrementAndGet()}",
        sum(when(col("_rk") > maxItemsPerUser, 1L).otherwise(0L))
          .as("rows_over_cap"))
      .filter(col("_rk") <= maxItemsPerUser)
      .select("u", "it")
    kept.as("a")
      .join(kept.as("b"),
        col("b.u") === col("a.u") && col("b.it") > col("a.it"))
      .groupBy(col("a.it").as("item_a"), col("b.it").as("item_b"))
      .agg(count(lit(1)).as("co_users"))
  }
}
