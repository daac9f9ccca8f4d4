package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** Shared interaction-graph build: canonical undirected weighted edges
    * `(source, target, weight)` (source < target, weight = consecutive-
    * interaction count) from the events table's global sequence — the
    * graph the reference's flagship pipeline emits
    * (backend/network_analysis.py nodes/links). Built ONCE per
    * (SparkContext, dir), eagerly checkpointed, and cached, so however
    * many centrality queries consume it (q11/q73/q74/q98/q99) the
    * GlobalLag corpus scan runs a single time — at 100 TB that scan IS
    * the dominant cost, and the pre-round-7 shape paid it three times
    * for the PageRank trio alone. The ordering contract (`ts_ns` +
    * `event_id` tiebreak) lives HERE and nowhere else, so a change to it
    * cannot silently break oracle parity for only some graph queries.
    *
    * The checkpoint (reliable when a dir is configured, executor-local
    * otherwise) both materializes the frame and truncates its lineage to
    * an O(1) scan — consumers' plans never re-optimize the lag pipeline,
    * and the cached frame's opaque RDD scan cannot be substituted into
    * unrelated queries' plans by the CacheManager. The cache holds one
    * edge frame per dataset dir (bounded); [[clearEventsCache]] drops it.
    */
  private val edgeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def fromEvents(s: SparkSession, dir: String): DataFrame =
    edgeCache.computeIfAbsent(s.sparkContext.applicationId + "|" + dir, _ => {
      val ev = graft.relational.Tables.events(s, dir)
        .select("user_id", "ts_ns", "event_id")
      val pairs = GlobalLag.withLag(ev, Seq("ts_ns", "event_id"), "user_id", "prev")
        .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
        .select(col("prev").as("source"), col("user_id").as("target"))
      val w = pairs.select(
          least(col("source"), col("target")).as("source"),
          greatest(col("source"), col("target")).as("target"))
        .groupBy("source", "target").agg(count(lit(1)).as("weight"))
      if (s.sparkContext.getCheckpointDir.isDefined) w.checkpoint(true)
      else w.localCheckpoint(true)
    })

  /** Degree-annotated directed expansion of a canonical edge list — the
    * loop-invariant input every PageRank iteration joins against:
    * `directed` is (s, t, outdeg) checkpointed (both walk directions,
    * outdeg joined once so each iteration is a single join + agg), `deg`
    * is the persisted (s, outdeg) node table, `n` the node count.
    */
  final case class DirectedGraph(directed: DataFrame, deg: DataFrame, n: Long)

  /** Weighted twin: `directed` is (s, t, w, strength), `strength` the
    * persisted (s, strength) node table.
    */
  final case class WeightedDirectedGraph(
      directed: DataFrame, strength: DataFrame, n: Long)

  private def ckptFn(df: DataFrame): DataFrame => DataFrame =
    // Same protocol as Dedup.connectedComponents: reliable checkpoints
    // when a dir is configured, executor-local otherwise.
    d => Ckpt.stage(d)

  /** One-time PageRank setup over an arbitrary edge frame. The canonical
    * edge list is read twice (degrees, then the directed list) — persist
    * it so the upstream pipeline that produced the edges (often a full
    * lag-over-events pass) runs ONCE; the single setup checkpoint goes on
    * the loop-invariant directed list, truncating everything upstream in
    * one barrier. `deg` stays persisted for the caller (it IS the node
    * table: rank init and node count read it with fixed-depth lineage).
    */
  def buildDirected(edges: DataFrame, srcCol: String, dstCol: String): DirectedGraph = {
    val ckpt = ckptFn(edges)
    val e = canonicalEdges(edges, srcCol, dstCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("a").as("s")).unionAll(e.select(col("b").as("s")))
      .groupBy("s").agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val directed = ckpt(
      e.select(col("a").as("s"), col("b").as("t"))
        .unionAll(e.select(col("b").as("s"), col("a").as("t")))
        .join(deg, Seq("s")))
    e.unpersist(blocking = false) // directed is materialized; e is done
    DirectedGraph(directed, deg, deg.count())
  }

  /** [[buildDirected]] keeping weights: parallel canonical pairs merge by
    * sum; strength = Σ incident weights is the weighted degree.
    */
  def buildWeightedDirected(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String): WeightedDirectedGraph = {
    val ckpt = ckptFn(edges)
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"),
        col(weightCol).cast("double").as("w"))
      .filter(col("a") =!= col("b") && col("w") > 0)
      .groupBy("a", "b").agg(sum("w").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val strength = e.select(col("a").as("s"), col("w"))
      .unionAll(e.select(col("b").as("s"), col("w")))
      .groupBy("s").agg(sum("w").as("strength"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val directed = ckpt(
      e.select(col("a").as("s"), col("b").as("t"), col("w"))
        .unionAll(e.select(col("b").as("s"), col("a").as("t"), col("w")))
        .join(strength, Seq("s")))
    e.unpersist(blocking = false)
    WeightedDirectedGraph(directed, strength, strength.count())
  }

  // The directed expansions of the events interaction graph, cached like
  // the edge list itself: the centrality trio (q74/q98/q99) shares not
  // just the corpus scan but the degree/strength shuffles and the setup
  // checkpoint barrier — per-query work is ONLY the iteration loop.
  private val dirCache =
    new java.util.concurrent.ConcurrentHashMap[String, DirectedGraph]()
  private val wdirCache =
    new java.util.concurrent.ConcurrentHashMap[String, WeightedDirectedGraph]()

  def fromEventsDirected(s: SparkSession, dir: String): DirectedGraph =
    dirCache.computeIfAbsent(s.sparkContext.applicationId + "|" + dir,
      _ => buildDirected(fromEvents(s, dir), "source", "target"))

  def fromEventsWeightedDirected(s: SparkSession, dir: String): WeightedDirectedGraph =
    wdirCache.computeIfAbsent(s.sparkContext.applicationId + "|" + dir,
      _ => buildWeightedDirected(fromEvents(s, dir), "source", "target", "weight"))

  // Cache keys use applicationId (unique per SparkContext), never an
  // identity hashCode: after a context restart a colliding hash could
  // serve a frame bound to a stopped context. Clearing must unpersist
  // the MEMORY_AND_DISK node tables (deg/strength) or a long-lived
  // session leaks their cached blocks; the checkpointed frames reclaim
  // via the checkpoint dir / RDD GC, not the block manager.
  private[graft] def clearEventsCache(): Unit = {
    // Try: a frame may belong to an already-stopped context, whose
    // blocks are gone anyway.
    dirCache.values.forEach(g =>
      scala.util.Try(g.deg.unpersist(blocking = false)))
    wdirCache.values.forEach(g =>
      scala.util.Try(g.strength.unpersist(blocking = false)))
    edgeCache.clear(); dirCache.clear(); wdirCache.clear()
  }

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
  /** Per-day interaction-graph evolution over (day, a, b) interaction
    * pairs: per-day edge and interaction counts, first-seen (new) edges,
    * and distinct node counts. Shared by the q108 query entry and
    * ScaleProbe's celebrity-day probe. The day-edge aggregate is the
    * ONLY consumer of the (usually corpus-sized) pairs pass and every
    * downstream aggregate derives from it — persisted so the pass runs
    * once (plan audit: the unpersisted form re-ran it per subtree, 26
    * exchanges vs 14). Tiny relative to the pairs (one row per day-edge);
    * ContextCleaner reclaims. Output is one row per day; every count is
    * a map-side-combinable hash agg, so a celebrity day (one day holding
    * a degree-10⁴ node) costs its row count once, never a window or a
    * pair blowup.
    */
  def temporalEvolution(pairs: DataFrame): DataFrame = {
    val ed = pairs.groupBy("day", "a", "b").agg(count(lit(1)).as("n_inter"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fd = ed.groupBy("a", "b").agg(min("day").as("first_day"))
    val agg = ed.join(fd, Seq("a", "b"))
      .groupBy("day").agg(
        count(lit(1)).as("n_edges"),
        sum("n_inter").as("n_interactions"),
        sum(when(col("first_day") === col("day"), 1L).otherwise(0L))
          .as("n_new_edges"))
    // node counts from ed, not pairs: ed already holds every (day, edge),
    // and distinct endpoints per day are the same set
    val nodes = ed
      .select(col("day"), explode(array(col("a"), col("b"))).as("v"))
      .groupBy("day").agg(countDistinct("v").as("n_nodes"))
    agg.join(nodes, Seq("day"))
      .select(col("day"), col("n_edges"), col("n_interactions"),
        col("n_new_edges"), col("n_nodes"))
      .orderBy("day")
  }

  /** k-core onion peeling: round t removes every node whose degree
    * RESTRICTED to round t-1's survivors is < k, until a fixpoint or
    * `maxRounds`. Returns every node of the input graph with its
    * `peel_round` (the round that removed it; 0 = still in the core
    * after the run) — the onion-layer decomposition at threshold k,
    * strictly richer than a membership flag.
    *
    * Each round is two semi-joins of the (persisted) canonical edge list
    * against the current alive node frame plus one map-side-combinable
    * degree agg — never a window, never a pair blowup; the alive frame is
    * node-sized and eagerly checkpointed per round, so lineage stays O(1)
    * like the PageRank loop. The fixpoint early-exit is ORACLE-SAFE
    * (unlike PageRank's tol): once alive_t = alive_{t-1}, every further
    * round is the identity, so an oracle that unrolls the full
    * `maxRounds` generations computes the same layers the engine stopped
    * at. The per-round `count()` doubles as the checkpoint barrier; the
    * per-round frames stay persisted until the ContextCleaner reclaims
    * them — the layer union references every generation, so an eager
    * unpersist would drop data a localCheckpoint cannot recompute.
    */
  def kCore(canonical: DataFrame, k: Long, maxRounds: Int): DataFrame = {
    val e = canonical.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = degrees(e).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var alive = all.select("v")
    var prev = alive.count()
    var layers: DataFrame = null
    var r = 0
    var converged = false
    while (r < maxRounds && !converged) {
      r += 1
      val restricted = e
        .join(alive.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("v").as("b")), Seq("b"), "left_semi")
      val next = degrees(restricted).filter(col("deg") >= k)
        .select("v").localCheckpoint(true)
      val c = next.count()
      val removed = alive.join(next, Seq("v"), "left_anti")
        .withColumn("peel_round", lit(r.toLong))
      layers = if (layers == null) removed else layers.unionByName(removed)
      if (c == prev || c == 0L) converged = true
      prev = c
      alive = next
    }
    val tagged = if (layers == null) all.select("v")
      .withColumn("peel_round", lit(0L)).limit(0) else layers
    all.select("v")
      .join(tagged, Seq("v"), "left")
      .select(col("v"), coalesce(col("peel_round"), lit(0L)).as("peel_round"))
  }

  /** Synchronous weighted label propagation (community detection): every
    * node starts as its own community, and each round adopts the label
    * carrying the largest total edge weight among its neighbors, ties
    * broken toward the SMALLEST label — the deterministic LPA variant
    * (classic LPA breaks ties randomly, which no replayable pipeline can
    * afford). Runs EXACTLY `rounds` rounds with no convergence exit:
    * unlike k-core, post-fixpoint LPA rounds are not guaranteed
    * identities (label ties can oscillate), so round-count parity is
    * what makes the result a pure function of the graph — the oracle
    * unrolls the same generations and matches bit-for-bit.
    *
    * Input: canonical undirected weighted edges (a, b, w), a < b, no
    * loops. Per round: one shuffle join of the (persisted) directed edge
    * list against the node-sized label frame, one (t, lbl) hash agg, and
    * one argmax-with-min-tie via `max(struct(wsum, −lbl))` — a map-side-
    * combinable aggregate, never a window. The label frame is eagerly
    * checkpointed per round, so lineage stays O(1) like the PageRank
    * loop. Returns (v, lbl) — the community id per node.
    */
  def labelPropagation(weighted: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val g = weighted
      .select(col("a").as("s"), col("b").as("t"), col("w"))
      .unionAll(weighted.select(col("b").as("s"), col("a").as("t"), col("w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var lbl = g.select(col("s").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
    var r = 0
    while (r < rounds) {
      r += 1
      val votes = g.join(lbl.withColumnRenamed("v", "s"), Seq("s"))
        .groupBy(col("t"), col("lbl"))
        .agg(sum("w").as("wsum"))
      lbl = votes.groupBy("t")
        .agg(max(struct(col("wsum"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("t").as("v"), (-col("m.nl")).as("lbl"))
        .localCheckpoint(true)
    }
    g.unpersist(blocking = false)
    lbl
  }

  /** One GREEDY MODULARITY-REFINEMENT round over a community partition
    * (the Louvain coarse "merge communities" move in its deterministic
    * parallel-matching form): build the community-level graph, keep the
    * pairs whose merge STRICTLY raises Newman modularity — ΔQ =
    * e12/m − deg1·deg2/(2m²) > 0, tested exactly as the integer
    * inequality 2·m·e12 > deg1·deg2 — let every community pick its best
    * positive neighbor (max ΔQ, smaller id on ties) and merge only
    * MUTUAL picks. Mutual-best is a matching, so merges are disjoint
    * and their ΔQ terms ADD exactly (no interaction terms) — the
    * refined modularity is computable from the merge frame alone,
    * without re-tagging a single edge.
    *
    * Scale shape: two label-tagging hash joins produce the community
    * pair frame (bounded by adjacent community PAIRS, never nodes), the
    * best-pick window partitions by community, and the mutuality check
    * is a self-join of the community-sized best frame. Nothing after
    * the tagging joins touches the corpus.
    *
    * Input: `e` (a, b, w) undirected weighted edges, `labels` (v, lbl).
    * Output: one row per merge, c1 < c2 (the merged label is c1 = the
    * min, preserving LPA's min-id label convention):
    * (c1, c2, e12, deg1, deg2) — exactly the ΔQ terms.
    */
  def modularityMerges(e: DataFrame, labels: DataFrame): DataFrame = {
    val pairs = e
      .join(labels.select(col("v").as("a"), col("lbl").as("la")), Seq("a"))
      .join(labels.select(col("v").as("b"), col("lbl").as("lb")), Seq("b"))
      .filter(col("la") =!= col("lb"))
      .groupBy(least(col("la"), col("lb")).as("c1"),
        greatest(col("la"), col("lb")).as("c2"))
      .agg(sum("w").as("e12"))
    val degc = e.select(col("a").as("v"), col("w"))
      .unionAll(e.select(col("b").as("v"), col("w")))
      .groupBy("v").agg(sum("w").as("dg"))
      .join(labels, Seq("v"))
      .groupBy(col("lbl").as("c")).agg(sum("dg").as("degc"))
    val m = e.agg(sum("w").cast(org.apache.spark.sql.types.LongType).as("m"))
    mutualBestMerges(pairs, degc, m)
  }

  /** [[modularityMerges]] specialized to a CANONICAL community graph —
    * one row per a ≤ b community pair, weights pre-summed, intra mass as
    * a = b self-loops (exactly [[contractByLabels]]'s output) — under
    * IDENTITY labels, the shape [[louvain]] feeds it every level. The
    * general form's two label-tagging joins, node-set distinct and pair
    * re-aggregation are all identities here, so they are removed
    * outright (guide §2.4): the pair frame IS the a ≠ b rows, and
    * community degrees come straight off the endpoint union (a self-loop
    * contributes 2w — once per endpoint — as Newman's formula requires).
    * Bit-identical to `modularityMerges(gc, identity)` by construction:
    * sum-over-singleton-group = the value itself.
    */
  def modularityMergesCanonical(gc: DataFrame): DataFrame = {
    val pairs = gc.filter(col("a") =!= col("b"))
      .select(col("a").as("c1"), col("b").as("c2"), col("w").as("e12"))
    val degc = gc.select(col("a").as("c"), col("w"))
      .unionAll(gc.select(col("b").as("c"), col("w")))
      .groupBy("c").agg(sum("w").as("degc"))
    val m = gc.agg(sum("w").cast(org.apache.spark.sql.types.LongType).as("m"))
    mutualBestMerges(pairs, degc, m)
  }

  /** Shared ΔQ/mutual-best tail of the two merge frontends above:
    * symmetrize the pair frame, keep strictly positive ΔQ (exact integer
    * inequality), each community picks its best neighbor, merge mutual
    * picks only.
    */
  private def mutualBestMerges(pairs: DataFrame, degc: DataFrame,
      m: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = pairs.select(col("c1").as("c"), col("c2").as("nb"), col("e12"))
      .unionByName(
        pairs.select(col("c2").as("c"), col("c1").as("nb"), col("e12")))
    val dq = sym
      .join(degc.select(col("c"), col("degc").as("deg_c")), Seq("c"))
      .join(degc.select(col("c").as("nb"), col("degc").as("deg_nb")),
        Seq("nb"))
      .crossJoin(broadcast(m)) // 1-row modularity denominator
      .withColumn("dqn", expr("2 * CAST(m AS DECIMAL(38,0)) * e12 - " +
        "CAST(deg_c AS DECIMAL(38,0)) * deg_nb"))
      .filter(col("dqn") > 0)
    val wBest = Window.partitionBy("c").orderBy(col("dqn").desc, col("nb"))
    val best = dq.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select("c", "nb", "e12", "deg_c", "deg_nb")
    best.alias("x").join(best.alias("y"),
        col("x.nb") === col("y.c") && col("y.nb") === col("x.c"))
      .filter(col("x.c") < col("x.nb"))
      .select(col("x.c").as("c1"), col("x.nb").as("c2"),
        col("x.e12").as("e12"), col("x.deg_c").as("deg1"),
        col("x.deg_nb").as("deg2"))
  }

  /** Community graph of `e` under `labels`: one canonical row per
    * community pair (a ≤ b, intra-community mass as self-loops a = b),
    * weights summed — the CONTRACTION step between Louvain levels.
    * Total edge mass is preserved exactly, and self-loops contribute 2w
    * to their community's degree (each endpoint once), so modularity
    * computed on the contracted graph equals modularity of the
    * partition on the original graph.
    */
  def contractByLabels(e: DataFrame, labels: DataFrame): DataFrame =
    e.join(labels.select(col("v").as("a"), col("lbl").as("la")), Seq("a"))
      .join(labels.select(col("v").as("b"), col("lbl").as("lb")), Seq("b"))
      .groupBy(least(col("la"), col("lb")).as("a"),
        greatest(col("la"), col("lb")).as("b"))
      .agg(sum("w").as("w"))

  /** MULTI-LEVEL LOUVAIN coarsening: run [[modularityMerges]] on the
    * COMMUNITY graph, apply the (disjoint, mutual-best) merges, contract,
    * and repeat — exactly `levels` rounds (a round past the fixpoint is a
    * no-op: zero merges, identical contraction), so the output shape is
    * deterministic whatever the data. Because each round's merges have
    * strictly positive disjoint ΔQ, modularity is monotone non-decreasing
    * in the level — the gate q307 pins per level.
    *
    * Scale shape: the node-level work is ONE contraction at entry
    * (`contractByLabels`) plus one label-map join per level against a
    * BROADCAST merge frame (merge count ≤ communities/2, never nodes);
    * every merge/contract round after entry runs on the community graph
    * — community-sized, not node-sized, shrinking per level.
    *
    * Returns (final node labels, per-level community graphs) — the
    * per-level list holds `levels + 1` checkpointed community graphs
    * (level 0 = the input partition), from which per-level Q and
    * community counts are aggregate-frame arithmetic.
    */
  def louvain(e: DataFrame, labels0: DataFrame, levels: Int)
      : (DataFrame, Seq[DataFrame]) = {
    var labels = labels0
    var gc = contractByLabels(e, labels0).localCheckpoint(true)
    val perLevel = scala.collection.mutable.ListBuffer(gc)
    for (_ <- 0 until levels) {
      // the community graph is canonical (contractByLabels output) and
      // its labels are the identity, so the specialized merge frontend
      // skips the label joins / node-set distinct / pair re-aggregation
      // the general form would run per level (guide §2.4)
      val merges = modularityMergesCanonical(gc)
        .select(col("c2").as("from"), col("c1").as("to"))
        .localCheckpoint(true)
      // labels stay LAZY: each level only chains one broadcast left join
      // against the (checkpointed, community-sized) merge frame. The old
      // per-level localCheckpoint materialized a NODE-sized frame per
      // level for a value nothing reads until — unless the caller even
      // consumes the labels at all (q307 does not) — the very end.
      labels = labels.join(broadcast(merges),
          labels("lbl") === merges("from"), "left")
        .select(labels("v"), coalesce(col("to"), col("lbl")).as("lbl"))
      gc = gc
        .join(broadcast(merges.select(col("from").as("a"),
          col("to").as("ta"))), Seq("a"), "left")
        .join(broadcast(merges.select(col("from").as("b"),
          col("to").as("tb"))), Seq("b"), "left")
        .select(coalesce(col("ta"), col("a")).as("na"),
          coalesce(col("tb"), col("b")).as("nb"), col("w"))
        .groupBy(least(col("na"), col("nb")).as("a"),
          greatest(col("na"), col("nb")).as("b"))
        .agg(sum("w").as("w"))
        .localCheckpoint(true)
      perLevel += gc
    }
    (labels, perLevel.toList)
  }

  /** Hub-capped Jaccard link prediction (q192's kernel): candidate
    * non-edges ranked by common-neighbor Jaccard. The wedge self-join is
    * the quadratic step — Σ deg(w)² over common-neighbor CENTERS — so
    * centers are capped at √(Σdeg) = √(2|E|): wedge mass is then
    * ≤ cap·Σdeg = (2|E|)^1.5, the same O(m^1.5) guarantee degree
    * orientation gives triangles, INDEPENDENT of the degree
    * distribution. (The previous 2×-mean cap had a measured failure
    * mode: grafting 2·10⁴ degree-1 leaves onto the sf0.1 graph dragged
    * the mean from 127 to 10.7, excluded every ordinary node from the
    * center role, and zeroed recall — the round-12 ScaleProbe line that
    * motivated this cap.) A capped-out hub still counts toward every
    * candidate's degree union, keeping the Jaccard denominators exact.
    * `we` must be canonical `(a, b)` pairs (a < b, one row per
    * undirected edge). floor(sqrt(·)) on a BIGINT is engine-portable:
    * IEEE sqrt is correctly rounded, exact on perfect squares and never
    * within an ulp of the next integer elsewhere at these magnitudes.
    */
  def linkPrediction(we: DataFrame, k: Int): DataFrame = {
    val adj = we.select(col("a").as("v"), col("b").as("n"))
      .unionAll(we.select(col("b").as("v"), col("a").as("n")))
    val deg = adj.groupBy("v").agg(count(lit(1)).as("deg"))
    val cap = deg.agg(
      expr("CAST(floor(sqrt(sum(deg))) AS BIGINT)").as("cap"))
    val low = deg.crossJoin(broadcast(cap))
      .filter(col("deg") <= col("cap")).select(col("v").as("n"))
    val capped = adj.join(low, Seq("n"), "left_semi")
    val cn = capped.select(col("v").as("p"), col("n"))
      .join(capped.select(col("v").as("q"), col("n")), Seq("n"))
      .filter(col("q") > col("p"))
      .groupBy("p", "q").agg(count(lit(1)).as("inter"))
    val cand = cn.join(we,
      cn("p") === we("a") && cn("q") === we("b"), "left_anti")
    cand
      .join(deg.select(col("v").as("p"), col("deg").as("dp")), Seq("p"))
      .join(deg.select(col("v").as("q"), col("deg").as("dq")), Seq("q"))
      .select(col("p").as("a"), col("q").as("b"), col("inter"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * inter)
               |  div (dp + dq - inter) AS BIGINT)""".stripMargin)
          .as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("a"), col("b"))
      .limit(k)
  }

  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // The canonical edge list feeds four subtrees (degrees, rank join,
    // edge count, closing edges) and the oriented list three — without a
    // materialization each reference recomputes the whole upstream
    // pipeline. Edges are tiny relative to the input that produced them
    // (one row per distinct pair). Eager checkpoints, not persist: the
    // result is returned lazily so there is no sound in-function
    // unpersist point, and CacheManager-pinned blocks accumulated across
    // repeated executions; checkpoint blocks are reclaimed on GC.
    val ckpt = ckptFn(edges)
    val e = ckpt(canonicalEdges(edges, srcCol, dstCol))
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
      .transform(ckpt)
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

  /** Per-node LOCAL clustering coefficient — [[triangleStats]]'s
    * node-resolved sibling: cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) in
    * exact floor-ppm. Same degree-oriented wedge join (O(m^1.5) under
    * skew); the per-node attribution joins the closing edge INNER (the
    * canonical edge list has one row per edge, so no double count) and
    * explodes each triangle to its three corners — 3 rows per triangle,
    * one map-side-combined count per node. Returns
    * (v, deg, n_tri, cc_ppm); degree-1 nodes report 0.
    */
  def localClustering(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // eager checkpoints, not persist: e is read 3× (deg + two rank joins)
    // and oriented 3× (wedge self-join + closing), but the result is
    // returned lazily so an in-function unpersist has no sound place —
    // persisted blocks leaked across repeated executions. Checkpoint
    // blocks are reclaimed when the frames are GC'd.
    val ckpt = ckptFn(edges)
    val e = ckpt(canonicalEdges(edges, srcCol, dstCol))
    val deg = degrees(e)
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
      .transform(ckpt)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.rw") < col("e2.rw"))
      .select(col("e1.u").as("u"), col("e1.w").as("x"), col("e2.w").as("y"))
    val closing = oriented.select(col("u").as("x"), col("w").as("y"))
    val triNodes = wedges.join(closing, Seq("x", "y"))
      .select(explode(array(col("u"), col("x"), col("y"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    deg.join(triNodes, Seq("v"), "left")
      .select(col("v"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        expr("""CAST(CASE WHEN deg >= 2
               |  THEN (CAST(2000000 AS DECIMAL(38,0)) * coalesce(n_tri, 0))
               |    div (CAST(deg AS DECIMAL(38,0)) * (deg - 1))
               |  ELSE 0 END AS BIGINT)""".stripMargin).as("cc_ppm"))
  }

  /** Shared power-iteration loop for the three PageRank variants:
    * O(1)-lineage via depth-triggered eager checkpoints (cost model in
    * [[pageRank]]'s body comments), optional L1 convergence early-exit.
    * `tol = 0` disables the check and runs exactly `iters` iterations —
    * the ORACLE-PARITY mode: the DuckDB oracles unroll exactly `iters`
    * CTE generations, so the query entries must not stop early. With
    * `tol > 0` the L1 delta vs the previous CHECKPOINT generation is
    * measured at each barrier — one tiny join of two already-materialized
    * node frames, with the delta computed as a named `Observation`
    * (`graft_pagerank_l1_i<iter>`): `Observation.get` blocks until the
    * metric lands, so the convergence decision still gets the value NOW,
    * while the SAME single action also publishes the delta on the
    * listener bus — production runs monitor convergence per barrier with
    * no second job. Checking per-generation rather than per-iteration
    * keeps the barrier count unchanged when converged=false; with
    * `ckptEvery = 1` it degenerates to the textbook per-iteration check.
    * Returns (ranks, iterationsRun).
    */
  private def iterate(init: DataFrame, iters: Int, ckptEvery: Int,
      tol: Double, ckpt: DataFrame => DataFrame)(
      step: DataFrame => DataFrame): (DataFrame, Int) = {
    var ranks = init
    var genRef = init // ranks at the last barrier: the delta reference
    var lastCkpt: DataFrame = null
    var depth = 0
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      i += 1
      val next = step(ranks)
      depth += 1
      if (depth >= ckptEvery || i == iters) {
        val mat = ckpt(next)
        if (tol > 0) {
          val obs = org.apache.spark.sql.Observation(s"graft_pagerank_l1_i$i")
          mat.join(genRef.select(col("v"), col("rank").as("_prev")), Seq("v"))
            .observe(obs, sum(abs(col("rank") - col("_prev"))).as("l1"))
            .count()
          // null only on an empty node frame (degenerate graph): converged
          val l1 = obs.get("l1") match {
            case d: java.lang.Double => d.doubleValue()
            case _ => 0.0
          }
          if (l1 < tol) converged = true
        }
        if (lastCkpt != null) lastCkpt.unpersist(blocking = false)
        lastCkpt = mat
        genRef = mat
        ranks = mat
        depth = 0
      } else ranks = next
    }
    (ranks, i)
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
      iters: Int = 20, damping: Double = 0.85, ckptEvery: Int = 4,
      tol: Double = 0.0): DataFrame =
    pageRankRun(edges, srcCol, dstCol, iters, damping, ckptEvery, tol)._1

  /** [[pageRank]] plus the iteration count actually run — the observable
    * the convergence spec pins (early exit on a symmetric graph).
    */
  private[graft] def pageRankRun(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 20, damping: Double = 0.85, ckptEvery: Int = 4,
      tol: Double = 0.0): (DataFrame, Int) = {
    val g = buildDirected(edges, srcCol, dstCol)
    val out = pageRankOnGraphRun(g, iters, damping, ckptEvery, tol)
    g.deg.unpersist(blocking = false) // owned build: release the node table
    out
  }

  /** The iteration loop over a prebuilt (possibly SHARED — see
    * [[fromEventsDirected]]) directed graph; does not unpersist `g`.
    *
    * Checkpoint (not just persist) inside the loop: persisting caches
    * the DATA but the logical plan still nests a join + agg per
    * iteration, and an ever-growing tree costs the driver long before
    * the executors feel anything. Every eager checkpoint is a full job
    * barrier, so the total barrier count is the cost model:
    * ceil(iters/ckptEvery) loop barriers on top of the build's single
    * setup barrier. The rank lineage is a single-reference CHAIN (each
    * next reads the previous exactly once), so between checkpoints the
    * plan deepens LINEARLY — for the oracle entries (iters = 10) the
    * measured optimum is ckptEvery = iters: one final barrier, Catalyst
    * comfortably optimizing the 10-deep chain (the every-4th cadence
    * paid 3 barriers for no win at that depth; every-generation ran
    * ~2.5× slower purely on barrier overhead). Long runs (iters ≫ 10)
    * keep a smaller cadence so depth stays bounded.
    */
  def pageRankOnGraph(g: DirectedGraph,
      iters: Int = 20, damping: Double = 0.85, ckptEvery: Int = 4,
      tol: Double = 0.0): DataFrame =
    pageRankOnGraphRun(g, iters, damping, ckptEvery, tol)._1

  private[graft] def pageRankOnGraphRun(g: DirectedGraph,
      iters: Int, damping: Double, ckptEvery: Int, tol: Double): (DataFrame, Int) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(ckptEvery >= 1, s"ckptEvery must be >= 1, got $ckptEvery")
    val base = (1.0 - damping) / g.n
    // Rank init reads the persisted deg directly — fixed-depth lineage,
    // no checkpoint barrier needed.
    val init = g.deg.select(col("s").as("v"), lit(1.0 / g.n).as("rank"))
    iterate(init, iters, ckptEvery, tol, ckptFn(g.directed)) { prev =>
      g.directed
        .join(prev.withColumnRenamed("v", "s"), Seq("s"))
        .select(col("t").as("v"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("v")
        .agg((lit(base) + lit(damping) * sum(col("c"))).as("rank"))
    }
  }

  /** Personalized PageRank: random walks restart at `seeds` (uniformly)
    * instead of everywhere — the relevance-to-a-query-set primitive.
    * r' = (1-d)·p + d·Σ_in r/outdeg with p uniform over the seed nodes
    * (seeds absent from the graph are ignored); r0 = p. Undirected input
    * (each edge walks both ways) means no dangling nodes, so total mass
    * is exactly 1 at every iteration. Same O(1)-lineage loop and barrier
    * cadence as [[pageRank]]: one shuffle join + one hash agg per
    * iteration, checkpoint every `ckptEvery` generations.
    */
  def personalizedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String, seeds: DataFrame,
      iters: Int = 20, damping: Double = 0.85, ckptEvery: Int = 4,
      tol: Double = 0.0): DataFrame = {
    val g = buildDirected(edges, srcCol, dstCol)
    val out = personalizedPageRankOnGraph(g, seeds, iters, damping, ckptEvery, tol)
    g.deg.unpersist(blocking = false)
    out
  }

  /** [[personalizedPageRank]]'s loop over a prebuilt (possibly shared)
    * directed graph; does not unpersist `g`.
    */
  def personalizedPageRankOnGraph(g: DirectedGraph, seeds: DataFrame,
      iters: Int = 20, damping: Double = 0.85, ckptEvery: Int = 4,
      tol: Double = 0.0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(ckptEvery >= 1, s"ckptEvery must be >= 1, got $ckptEvery")
    // restart vector: uniform over the seeds that exist in the graph.
    // The restart term is nonzero ONLY on the seed rows, and in an
    // undirected graph every node receives a contribution row each
    // iteration — so the per-iteration restart application is a BROADCAST
    // join of the (tiny) seed frame onto the contribution aggregate,
    // never a shuffle of the node table.
    val seedCol = seeds.columns.head
    val seedP = g.deg.select(col("s"))
      .join(seeds.select(col(seedCol).as("s")).distinct(), Seq("s"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSeeds = seedP.count()
    require(nSeeds > 0, "no seed node exists in the graph")
    val seedFrame = broadcast(
      seedP.select(col("s").as("v"), lit(1.0 / nSeeds).as("p")))
    val init = g.deg.select(col("s").as("v"))
      .join(seedFrame, Seq("v"), "left")
      .select(col("v"), coalesce(col("p"), lit(0.0)).as("rank"))
    val (ranks, _) = iterate(init, iters, ckptEvery, tol, ckptFn(g.directed)) { prev =>
      val contrib = g.directed
        .join(prev.withColumnRenamed("v", "s"), Seq("s"))
        .select(col("t").as("v"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("v")
        .agg(sum(col("c")).as("inMass"))
      contrib.join(seedFrame, Seq("v"), "left")
        .select(col("v"),
          (lit(1.0 - damping) * coalesce(col("p"), lit(0.0)) +
            lit(damping) * col("inMass")).as("rank"))
    }
    seedP.unpersist(blocking = false)
    ranks
  }

  /** Weighted PageRank: contributions split proportionally to edge
    * weight — r' = (1-d)/n + d·Σ_in r·w/strength(src), with strength =
    * Σ incident weights. The faithful centrality for the engine's
    * flagship interaction graph, whose edges carry interaction counts.
    * Same O(1)-lineage loop and barrier cadence as [[pageRank]] (which
    * is this with all weights 1).
    */
  def pageRankWeighted(
      edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
      iters: Int = 20, damping: Double = 0.85, ckptEvery: Int = 4,
      tol: Double = 0.0): DataFrame = {
    val g = buildWeightedDirected(edges, srcCol, dstCol, weightCol)
    val out = pageRankWeightedOnGraph(g, iters, damping, ckptEvery, tol)
    g.strength.unpersist(blocking = false)
    out
  }

  /** [[pageRankWeighted]]'s loop over a prebuilt (possibly shared)
    * weighted directed graph; does not unpersist `g`.
    */
  def pageRankWeightedOnGraph(g: WeightedDirectedGraph,
      iters: Int = 20, damping: Double = 0.85, ckptEvery: Int = 4,
      tol: Double = 0.0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(ckptEvery >= 1, s"ckptEvery must be >= 1, got $ckptEvery")
    val base = (1.0 - damping) / g.n
    val init = g.strength.select(col("s").as("v"), lit(1.0 / g.n).as("rank"))
    val (ranks, _) = iterate(init, iters, ckptEvery, tol, ckptFn(g.directed)) { prev =>
      g.directed
        .join(prev.withColumnRenamed("v", "s"), Seq("s"))
        .select(col("t").as("v"), (col("rank") * col("w") / col("strength")).as("c"))
        .groupBy("v")
        .agg((lit(base) + lit(damping) * sum(col("c"))).as("rank"))
    }
    ranks
  }

  /** Single-source shortest paths by synchronous Bellman-Ford rounds
    * over a DIRECTED edge list `(s, t, cost)` with non-negative BIGINT
    * costs: after round k, `cost(v)` is the exact cheapest path from any
    * seed to `v` using ≤ k edges — a well-defined result even when the
    * graph's diameter exceeds `rounds` (unreached nodes are absent, and
    * rounds past the fixpoint are identities, which is what makes the
    * engine's early exit oracle-safe against a fixed unrolled CTE
    * chain).
    *
    * Per round: one edge⋈dist hash join + one map-side-combined min agg
    * over the node-sized dist frame, checkpointed (O(1) lineage);
    * convergence check = an aggregate-sized anti-join on (v, cost).
    * Pure integer arithmetic — zero-tolerance oracles.
    */
  def shortestPaths(directed: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val ckpt = ckptFn(directed)
    val e = directed.select(col("s"), col("t"), col("cost"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = ckpt(seeds.select(col("v"), lit(0L).as("cost")))
    var k = 0
    var converged = false
    while (k < rounds && !converged) {
      k += 1
      val relaxed = ckpt(
        dist.unionAll(
            e.join(dist.select(col("v").as("s"), col("cost").as("dc")), Seq("s"))
              .select(col("t").as("v"), (col("dc") + col("cost")).as("cost")))
          .groupBy("v").agg(min("cost").as("cost")))
      // fixpoint = no (v, cost) pair changed or appeared
      converged = relaxed.join(dist, Seq("v", "cost"), "left_anti").isEmpty
      dist = relaxed
    }
    e.unpersist(blocking = false)
    dist
  }

  /** HITS hub/authority scores (Kleinberg, reference backend graph
    * analytics family) over a DIRECTED edge list `(s, t)` — `iters`
    * synchronous mutual-reinforcement rounds with the float L2
    * normalization replaced by EXACT integer ppm rescaling (divide by
    * the round max, scale to 10⁶): rankings are unchanged by the choice
    * of normalizer, and every intermediate is a bounded integer, so a
    * DuckDB CTE chain replays the whole computation bit-exactly (the
    * PageRank trio needs a sub-ppm divergence budget; this needs none).
    *
    * Per round: two edge-list hash joins + two map-side-combined sums
    * over node-sized frames + two 1-row max broadcasts (the canonical
    * scalar-attachment crossJoin); each half-round's score frame is
    * checkpointed so lineage stays O(1) in `iters`. Scores are ≤ 10⁶ by
    * construction and the rescale products DECIMAL(38,0)-guarded, so the
    * arithmetic holds at 100 TB edge counts (raw sums are bounded by
    * 10⁶ · max-degree). The round max is always > 0: round 1's raws sum
    * ≥ 1 seed score, and later maxima include a neighbor of the previous
    * argmax, whose score is exactly 10⁶.
    *
    * Returns one row per node: (`v`, `hub_ppm`, `auth_ppm`) — sinks
    * (no out-edges) have hub 0, sources (no in-edges) auth 0.
    */
  def hits(directed: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val ckpt = ckptFn(directed)
    val e = directed.select(col("s"), col("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ckpt, not persist: nodes outlives the loop into the lazily-returned
    // final join, so there is no in-function unpersist point for it — a
    // persist here leaked across executions (e below IS unpersisted once
    // the loop's checkpointed frames no longer need it).
    val nodes = ckpt(
      e.select(col("s").as("v")).unionAll(e.select(col("t").as("v"))).distinct())
    // Exact integer normalization: score' = (10⁶ · raw) div max(raw).
    // `div` (IntegralDivide) truncates, DuckDB's `//` floors — equal on
    // the non-negative operands here. Result ≤ 10⁶ → LongType.
    def rescale(raw: DataFrame): DataFrame = ckpt(
      raw.crossJoin(broadcast(raw.agg(max("raw").as("mx"))))
        .select(col("v"),
          expr("(CAST(1000000 AS DECIMAL(38,0)) * raw) div mx").as("score")))
    var hub = nodes.select(col("v"), lit(1000000L).as("score"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      auth = rescale(
        e.join(hub.withColumnRenamed("v", "s"), Seq("s"))
          .groupBy(col("t").as("v"))
          .agg(sum(col("score").cast(DecimalType(38, 0))).as("raw")))
      hub = rescale(
        e.join(auth.select(col("v").as("t"), col("score")), Seq("t"))
          .groupBy(col("s").as("v"))
          .agg(sum(col("score").cast(DecimalType(38, 0))).as("raw")))
    }
    e.unpersist(blocking = false) // hub/auth/nodes are checkpointed; e is done
    nodes
      .join(hub.select(col("v"), col("score").as("hub_ppm")), Seq("v"), "left")
      .join(auth.select(col("v"), col("score").as("auth_ppm")), Seq("v"), "left")
      .select(col("v"), coalesce(col("hub_ppm"), lit(0L)).as("hub_ppm"),
        coalesce(col("auth_ppm"), lit(0L)).as("auth_ppm"))
  }
}
