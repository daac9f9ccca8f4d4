package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) queries — the multi-criteria "best
  * trade-off" operator (Börzsönyi/Kossmann/Stocker, ICDE 2001): keep the
  * rows no other row dominates. Spark has no skyline operator; the
  * all-pairs NOT EXISTS formulation is O(n²) and unshippable at scale,
  * so this is the classic two-phase distributed algorithm:
  *
  *   1. PARTITION-LOCAL pruning — each input partition computes its own
  *      skyline with a streaming sweep over partition-locally sorted
  *      rows (sortWithinPartitions: external sort, no exchange). Any
  *      row dominated within a partition is dominated globally, so the
  *      union of local skylines is a superset of the answer, bounded by
  *      partitions × local-skyline size (≤ distinct y values) — tiny.
  *   2. GLOBAL sweep — the same streaming kernel over the coalesced
  *      candidate union. No window node, no cartesian/BNLJ anywhere.
  *
  * The sweep is exact on ties: for rows sorted (x asc, y desc), a row
  * survives iff max(y | x' < x) < y  AND  max(y | x' ≤ x) ≤ y — i.e.
  * within each x-group the rows achieving the group max y (all
  * duplicates) survive when that max beats every strictly-cheaper
  * group. This is the same RANGE-frame formula the DuckDB oracle runs,
  * so equal-point duplicates are kept identically on both sides.
  */
object Skyline {

  /** 2-D skyline over non-null BIGINT criteria: minimize `xCol`,
    * maximize `yCol`. Returns the surviving rows with their full input
    * schema, un-ordered (callers add a deterministic sort).
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val schema = df.schema
    val xi = schema.fieldIndex(xCol)
    val yi = schema.fieldIndex(yCol)
    require(schema(xi).dataType == org.apache.spark.sql.types.LongType &&
      schema(yi).dataType == org.apache.spark.sql.types.LongType,
      s"skyline2d needs BIGINT criteria, got ${schema(xi).dataType}/${schema(yi).dataType}")
    val enc = Encoders.row(schema)
    def sweep(it: Iterator[Row]): Iterator[Row] = {
      // runA = max y among strictly-cheaper groups seen so far; pending =
      // current x-group's max-y rows. Output is skyline-sized (≤ distinct
      // y values), never partition-sized.
      var runA = Long.MinValue
      var curX = 0L
      var groupMax = Long.MinValue
      var started = false
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      val pending = scala.collection.mutable.ArrayBuffer[Row]()
      def flush(): Unit = if (started) {
        if (groupMax > runA) out ++= pending
        if (groupMax > runA) runA = groupMax
        pending.clear()
      }
      it.foreach { r =>
        val x = r.getLong(xi)
        val y = r.getLong(yi)
        if (!started || x != curX) { flush(); curX = x; groupMax = y; started = true }
        if (y == groupMax) pending += r // sorted y desc: group max leads
      }
      flush()
      out.iterator
    }
    val local = df
      .sortWithinPartitions(col(xCol).asc, col(yCol).desc)
      .mapPartitions(sweep _)(enc)
    // candidate union is tiny — one task finishes the exact answer with
    // the identical kernel (no single-partition Window in the plan).
    // repartition(1), NOT coalesce(1): coalesce is a narrow dependency
    // that would collapse phase 1 into the same single task, piping the
    // full input through one sweep; the shuffle is a stage barrier that
    // keeps phase 1 at input parallelism and moves only the skyline-sized
    // candidate union.
    local.repartition(1)
      .sortWithinPartitions(col(xCol).asc, col(yCol).desc)
      .mapPartitions(sweep _)(enc)
  }
}
