package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable lag over a GLOBAL order.
  *
  * `Window.orderBy(...)` with no partitionBy collapses the whole dataset
  * into ONE task — correct, but a non-starter at 100 TB. The scalable
  * shape of the same semantics, kept entirely on the DataFrame layer so
  * every stage is whole-stage-codegen'd Tungsten (no RDD round trip):
  *
  *   1. `repartitionByRange` on the order columns — partitions become
  *      globally ordered ranges (one sampling pass + one shuffle) — and
  *      stamp each row with its range-partition id;
  *   2. lag within each range partition via
  *      `Window.partitionBy(pid).orderBy(orderCols)`;
  *   3. patch partition boundaries: the first row of partition i needs the
  *      last value of the nearest earlier non-empty partition. Per-partition
  *      tails are a #partitions-sized aggregate (`max_by` over the order
  *      key), shifted by one with a tiny single-task window, and broadcast
  *      back as a join on pid.
  *
  * The pid window costs one extra hash shuffle versus the range exchange
  * alone (Catalyst cannot know pid is constant per partition), but both
  * exchanges move each row exactly once and everything in between stays in
  * codegen — far cheaper than the previous `mapPartitionsWithIndex` +
  * `createDataFrame` implementation, which deserialized every row out of
  * Tungsten and ran two extra jobs (see BASELINE.md round-2 numbers).
  *
  * Determinism requires the order columns to be a total order (add a
  * unique tiebreaker). Used by the interaction-graph queries; the chat
  * engine proper never needs it (its windows partition by file).
  */
object GlobalLag {

  /** shuffle.partitions can be non-numeric on AQE-managed platforms that
    * accept "auto" — fall back to the cluster's default parallelism
    * rather than throwing on a config this operator only uses as a hint.
    */
  private[ops] def parsePartitions(raw: String, fallback: Int): Int =
    math.max(scala.util.Try(raw.toInt).getOrElse(fallback), 1)

  private val PID = "__graft_pid"
  private val TAIL = "__graft_tail"
  private val SEED = "__graft_seed"
  private val RN = "__graft_rn"

  def withLag(df: DataFrame, orderCols: Seq[String], valueCol: String,
      out: String): DataFrame = {
    val spark = df.sparkSession
    val n = parsePartitions(
      spark.conf.get("spark.sql.shuffle.partitions"),
      spark.sparkContext.defaultParallelism)
    val orderKey = orderCols.map(col)

    // Persisted because BOTH the seeds aggregate and the main window read
    // it and pids MUST come from one materialization: RangePartitioner
    // samples with an rdd-id-derived seed, so two independent executions
    // could draw different boundaries and the seed join would patch the
    // wrong rows. (Exchange reuse usually dedupes the two subtrees anyway;
    // the cache makes that a guarantee, not an optimizer courtesy.)
    // MEMORY_AND_DISK ≈ one shuffle-sized materialization of the pruned
    // input; Spark's ContextCleaner auto-unpersists once unreachable.
    val ranged = df
      .repartitionByRange(n, orderKey: _*)
      .withColumn(PID, spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Last value of each non-empty range partition: `max_by` over the
    // ascending order key (struct comparison is field-wise, matching the
    // sort order). 32-ish rows — the single-task lag window over them is
    // free, and the result broadcasts. Rows of an EMPTY partition never
    // join (no row carries its pid), so lag over the non-empty pids in
    // order yields exactly "tail of the nearest earlier non-empty
    // partition".
    val seeds = ranged
      .groupBy(col(PID))
      .agg(max_by(col(valueCol), struct(orderKey: _*)).as(TAIL))
      .withColumn(SEED, lag(TAIL, 1).over(Window.orderBy(PID)))
      .select(col(PID), col(SEED))

    val w = Window.partitionBy(PID).orderBy(orderKey: _*)
    ranged
      .join(broadcast(seeds), Seq(PID), "left")
      .withColumn(RN, row_number().over(w))
      .withColumn(out,
        when(col(RN) === 1, col(SEED)).otherwise(lag(valueCol, 1).over(w)))
      .drop(PID, SEED, RN)
  }
}
