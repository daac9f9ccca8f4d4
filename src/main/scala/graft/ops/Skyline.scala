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

  /** 3-D skyline over non-null BIGINT criteria: minimize `xCol`,
    * maximize `yCol` and `zCol`. Same two-phase shape as [[skyline2d]]
    * (partition-local prune → tiny candidate union → exact global pass,
    * no window node, no pair join); the per-partition kernel is the
    * sorted BNL sweep with a Pareto FRONTIER of (y, z) maxima from
    * strictly-cheaper x-groups, kept as a TreeMap (y → z, z strictly
    * decreasing in y by invariant) so each row's dominance test is one
    * ceiling lookup, O(log f). Tie semantics match the 2-D operator:
    * a row survives iff no OTHER point (x'≤x, y'≥y, z'≥z) beats it with
    * at least one strict inequality — exact duplicates all survive
    * together. Frontier size is bounded by the distinct y values, so
    * phase 2 moves candidates ≤ partitions × |frontier|, never rows.
    */
  def skyline3d(df: DataFrame, xCol: String, yCol: String,
      zCol: String): DataFrame = {
    val schema = df.schema
    val xi = schema.fieldIndex(xCol)
    val yi = schema.fieldIndex(yCol)
    val zi = schema.fieldIndex(zCol)
    require(Seq(xi, yi, zi).forall(i =>
        schema(i).dataType == org.apache.spark.sql.types.LongType),
      "skyline3d needs BIGINT criteria")
    val enc = Encoders.row(schema)
    def sweep(it: Iterator[Row]): Iterator[Row] = {
      // frontier: y -> max z over kept rows of strictly-cheaper x-groups;
      // invariant: strictly ascending y => strictly descending z, so the
      // dominating candidate for (y, z) is ceilingEntry(y) alone.
      val frontier = new java.util.TreeMap[Long, Long]()
      def frontierDominates(y: Long, z: Long): Boolean = {
        val e = frontier.ceilingEntry(y)
        e != null && e.getValue >= z
      }
      def frontierAdd(y: Long, z: Long): Unit = {
        val e = frontier.ceilingEntry(y)
        if (e == null || e.getValue < z) {
          // remove now-dominated entries (y' <= y with z' <= z)
          var f = frontier.floorEntry(y)
          while (f != null && f.getValue <= z) {
            frontier.remove(f.getKey); f = frontier.floorEntry(y)
          }
          frontier.put(y, z)
        }
      }
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      // current x-group state, rows arriving (y desc, z desc):
      //   strictMaxZ = max z among KEPT group rows with y > current y;
      //   runMaxZ    = z of the current equal-y run's first row (its max).
      // A row is group-dominated iff strictMaxZ >= z (some higher-y kept
      // row has z' >= z) or z < runMaxZ (same y, strictly higher z kept).
      var curX = 0L; var started = false
      var curY = Long.MinValue; var strictMaxZ = Long.MinValue
      var runMaxZ = Long.MinValue
      val groupKept = scala.collection.mutable.ArrayBuffer[(Long, Long, Row)]()
      def closeGroup(): Unit = if (started) {
        groupKept.foreach { case (y, z, r) =>
          if (!frontierDominates(y, z)) out += r
        }
        // merge AFTER emitting: same-group pairs must not strict-test
        // against each other twice (the in-group rule already handled
        // strictness among equals)
        groupKept.foreach { case (y, z, _) => frontierAdd(y, z) }
        groupKept.clear()
        curY = Long.MinValue; strictMaxZ = Long.MinValue
        runMaxZ = Long.MinValue
      }
      it.foreach { r =>
        val x = r.getLong(xi); val y = r.getLong(yi); val z = r.getLong(zi)
        if (!started || x != curX) { closeGroup(); curX = x; started = true }
        if (y != curY) {
          strictMaxZ = math.max(strictMaxZ, runMaxZ)
          curY = y; runMaxZ = z
        }
        if (strictMaxZ < z && z >= runMaxZ) groupKept += ((y, z, r))
      }
      closeGroup()
      out.iterator
    }
    val local = df
      .sortWithinPartitions(col(xCol).asc, col(yCol).desc, col(zCol).desc)
      .mapPartitions(sweep _)(enc)
    // same stage-barrier reasoning as skyline2d's repartition(1)
    local.repartition(1)
      .sortWithinPartitions(col(xCol).asc, col(yCol).desc, col(zCol).desc)
      .mapPartitions(sweep _)(enc)
  }
}
