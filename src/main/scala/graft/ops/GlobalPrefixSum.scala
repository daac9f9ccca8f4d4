package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable RUNNING SUM over a GLOBAL order — [[GlobalLag]]'s sibling
  * primitive (that one patches a lag across range-partition boundaries;
  * this one patches a prefix sum):
  *
  *   1. `repartitionByRange` on the order columns (partitions become
  *      globally ordered ranges), stamp the range-partition id;
  *   2. cumulative sum WITHIN each range partition
  *      (`Window.partitionBy(pid)` — never a single-partition window);
  *   3. patch boundaries: per-partition totals are a #partitions-sized
  *      aggregate whose shifted cumulative sum (one tiny single-task
  *      window) is each partition's starting offset, broadcast back.
  *
  * Same determinism contract as GlobalLag: the order columns must form a
  * total order for per-row values to be unique — though consumers that
  * only take an order-insensitive reduction of the prefix series (e.g.
  * the MAX concurrency in q210: permuting equal (ts, delta) rows permutes
  * the prefix values but not their multiset) may relax that. The ranged
  * frame is persisted because the totals aggregate and the main window
  * must read the SAME partitioning (RangePartitioner samples with an
  * rdd-id-derived seed — two executions could split differently).
  */
object GlobalPrefixSum {

  private val PID = "__graft_pid"
  private val OFF = "__graft_off"

  def withRunningSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
      out: String): DataFrame = {
    val spark = df.sparkSession
    val n = GlobalLag.parsePartitions(
      spark.conf.get("spark.sql.shuffle.partitions"),
      spark.sparkContext.defaultParallelism)
    val orderKey = orderCols.map(col)
    // Ckpt.stage, NOT persist: the frame is read twice (offsets + final
    // join) within this one call and never again, and a persist here
    // leaked — the lazily-returned result gives no point to unpersist,
    // so cached blocks accumulated across repeated executions in one
    // session. Local-checkpoint blocks are ContextCleaner-reclaimed when
    // the frame is GC'd; the reliable path (checkpoint dir configured —
    // cluster fault tolerance) reclaims files only under
    // cleanCheckpoints=true, and [[Ckpt.stage]] warns otherwise.
    val ranged = Ckpt.stage(df
      .repartitionByRange(n, orderKey: _*)
      .withColumn(PID, spark_partition_id()))
    val offsets = ranged
      .groupBy(col(PID))
      .agg(sum(col(valueCol)).as("_tot"))
      .withColumn(OFF,
        coalesce(sum(col("_tot")).over(
          Window.orderBy(PID).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(PID), col(OFF))
    val w = Window.partitionBy(PID).orderBy(orderKey: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offsets), Seq(PID))
      .withColumn(out, sum(col(valueCol)).over(w) + col(OFF))
      .drop(PID, OFF)
  }
}
