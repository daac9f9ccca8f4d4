package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph metrics over undirected edge lists (the interaction-graph shape
  * the engine's flagship pipeline produces — reference
  * backend/network_analysis.py builds exactly this node/link structure).
  *
  * Scale design: triangle counting uses the degree-orientation trick —
  * every edge points from its lower-(degree, id) endpoint to the higher
  * one, so each node's OUT-degree is O(√m) on any graph and the wedge
  * self-join (the quadratic step) is bounded by Σ outdeg² = O(m^1.5)
  * instead of Σ deg² (unbounded under skew: one celebrity node in a
  * social graph otherwise owns the whole stage). The count is
  * orientation-invariant, which is what lets a plain a<b-oriented SQL
  * replay (the DuckDB oracle) agree with the degree-oriented plan.
  */
object Graph {

  /** Canonical distinct undirected edges: (a, b) with a < b, no loops. */
  def canonicalEdges(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Per-node degree over the canonical edge list. */
  def degrees(canonical: DataFrame): DataFrame =
    canonical.select(col("a").as("v"))
      .unionAll(canonical.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))

  /** Exact triangle count, degree-oriented. One row:
    * (n_nodes, n_edges, n_triangles), all BIGINT.
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // The canonical edge list feeds four subtrees (degrees, rank join,
    // edge count, closing edges) and the oriented list three — without a
    // persist each reference recomputes the whole upstream pipeline.
    // Edges are tiny relative to the input that produced them (one row
    // per distinct pair), so materializing them is the scale-correct
    // trade at any corpus size; ContextCleaner unpersists when the frames
    // become unreachable.
    val e = canonicalEdges(edges, srcCol, dstCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = degrees(e)
    // rank struct (deg, v): total order; compare field-wise
    val withRanks = e
      .join(deg.select(col("v").as("a"), col("deg").as("_da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("_db")), Seq("b"))
    val oriented = withRanks.select(
      when(struct(col("_da").as("d"), col("a").as("i")) <
          struct(col("_db").as("d"), col("b").as("i")),
        struct(col("a").as("u"), col("b").as("w"),
          struct(col("_db").as("d"), col("b").as("i")).as("rw")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("w"),
            struct(col("_da").as("d"), col("a").as("i")).as("rw"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.rw").as("rw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.rw") < col("e2.rw"))
      .select(col("e1.w").as("x"), col("e2.w").as("y"))
    val closing = oriented.select(col("u").as("x"), col("w").as("y"))
    val nTri = wedges.join(closing, Seq("x", "y"), "left_semi")
      // count matched wedges, not distinct (x,y): two wedges can close on
      // the same edge — join-then-count would double-count via the build
      // side, a semi-join can't
      .agg(count(lit(1)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(nTri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  /** PageRank over the undirected edge list (each edge walks both ways),
    * `iters` synchronous power iterations with damping `d`:
    * r' = (1-d)/n + d·Σ_in r/outdeg. Returns (`v`, `rank`), Σrank ≈ 1.
    *
    * Every iteration is one shuffle join (contributions) + one hash agg
    * (sum per target) over the edge list — the degree table and directed
    * edges are built once and persisted, and each iteration's rank frame
    * is persisted and the previous one dropped, so the lineage (and the
    * plan Catalyst must optimize) stays O(1) deep instead of growing by
    * two joins per iteration. Isolated-node-free by construction (every
    * node in an edge list has degree ≥ 1), so no dangling-mass term.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 20, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // Checkpoint (not just persist) every generation: persisting caches
    // the DATA but the logical plan still nests two joins per iteration,
    // and the exponentially growing tree OOMs the driver long before the
    // executors feel anything. Same protocol as Dedup.connectedComponents:
    // reliable checkpoints when a dir is configured, executor-local
    // otherwise.
    val sc = edges.sparkSession.sparkContext
    def ckpt(df: DataFrame): DataFrame =
      if (sc.getCheckpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    val e = canonicalEdges(edges, srcCol, dstCol)
    // (s, t, outdeg) in one frame: joining degree once here means the
    // per-iteration step is a single join + agg, not two joins. The
    // degree frame IS the node table (one row per node), so node count
    // and rank init read it directly — no distinct re-shuffles of the
    // 2m-row directed list.
    val deg = ckpt(
      e.select(col("a").as("s")).unionAll(e.select(col("b").as("s")))
        .groupBy("s").agg(count(lit(1)).as("outdeg")))
    val directed = ckpt(
      e.select(col("a").as("s"), col("b").as("t"))
        .unionAll(e.select(col("b").as("s"), col("a").as("t")))
        .join(deg, Seq("s")))
    val n = deg.count()
    val base = (1.0 - damping) / n
    var ranks = ckpt(deg.select(col("s").as("v"), lit(1.0 / n).as("rank")))
    // Checkpoint every 3rd generation, not every one: the rank lineage is
    // a single-reference CHAIN (each next reads the previous exactly
    // once), so between checkpoints the plan deepens linearly — 3 levels
    // is nothing — while each eager checkpoint is a full job barrier.
    // This trades 2/3 of the barriers for a bounded-depth plan; the
    // every-generation variant measured ~2.5× slower at local[32] purely
    // on barrier overhead.
    var lastCkpt = ranks
    for (i <- 1 to iters) {
      val step = directed
        .join(ranks.withColumnRenamed("v", "s"), Seq("s"))
        .select(col("t").as("v"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("v")
        .agg((lit(base) + lit(damping) * sum(col("c"))).as("rank"))
      if (i % 3 == 0 || i == iters) {
        val next = ckpt(step)
        lastCkpt.unpersist(blocking = false)
        lastCkpt = next
        ranks = next
      } else ranks = step
    }
    ranks
  }
}
