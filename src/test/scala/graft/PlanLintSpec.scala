package graft

/** Registry-wide plan lint: structural rules every query's physical plan
  * must satisfy, checked for ALL registry entries (the flagship-only pins
  * live in PlanAssertionSpec). Plans are built, never executed, so the
  * whole sweep is cheap. Rules:
  *
  *   1. no `CartesianProduct` — an unconditional cross join of data-sized
  *      inputs cannot survive any scale-up;
  *   2. `BroadcastNestedLoopJoin` only where a query INTENDS a broadcast
  *      cross join of a provably tiny side (each allowance is listed with
  *      its reason — an unlisted occurrence fails the sweep).
  */
class PlanLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** queryName -> why a broadcast nested-loop join is the DESIGNED plan.
    * Every entry is a broadcast of a SINGLE-ROW (or k-row constant-size)
    * aggregate attached to a data frame — the canonical scalar-attachment
    * shape; none broadcasts anything that grows with the input.
    */
  private val allowedBnlj: Map[String, String] = Map(
    "q55_ann_recall" -> "centroid table (k rows) broadcast for IVF assignment (crossJoin)",
    "q32_knn_cosine" -> "5-row query-vector set broadcast for the exact kNN scan (bruteForceTopK's shape; dots are per-row decimal-bridged)",
    "q206_knn_classify" -> "5-row query-vector set broadcast for the exact kNN scan (q32's shape)",
    "q238_hard_negatives" -> "10-row query-vector set broadcast for the exact kNN scan (q32's shape, label-inequality pushed into the join)",
    "q246_retrieval_eval" -> "20-row query-vector set broadcast for the exact kNN scan (q32's shape)",
    // q104 lost its allowance when the trainer moved behind the shared
    // CorpusBuilds checkpoint: its plan is now an opaque scan of the
    // trained artifact (the Lloyd crossJoins run once inside the build)
    "q110_topic_sample" -> "centroid table (k rows) broadcast for the assignment crossJoin (trainer itself is the shared checkpointed artifact)",
    "q116_pq_codes" -> "m·k-row (8) tagged codebook broadcast for the PQ assignment crossJoin",
    "q120_ivfpq_codes" -> "m·k-row (8) residual codebook broadcast for the PQ coding crossJoin (coarse routing + trainer run inside the eager checkpoints)",
    "q119_pq_adc_recall" -> "m·k-row (256) tagged codebook broadcast for PQ assignment + per-query ADC distance tables",
    "q17_scalar_subquery" -> "decorrelated scalar aggregate (one row) joined to every lineitem row",
    "q301_louvain_refine" -> "one-row edge-mass m broadcast into the ΔQ filter and both modularity aggregates, plus the 1-row×1-row LPA/merge stat join",
    "q307_louvain_multilevel" -> "q301's one-row edge-mass m broadcast, once per level (3 levels) into each level's modularity aggregate",
    "q40_intersect_unionall" -> "one-row union-all count attached to the set-op result",
    "q59_sequence_packing" -> "one-row bin-capacity stats attached before packing audit",
    "q60_hashing_tfidf" -> "one-row corpus doc count (idf denominator) broadcast",
    "q73_triangles" -> "three one-row aggregates (nodes/edges/triangles) cross-joined into the stat row",
    "q75_approx_quantile" -> "one-row quantile estimate joined back for its true-rank check",
    "q77_resample" -> "one-row date-range limits attached to build the spine",
    "q82_histogram" -> "one-row min/max bounds attached for bucket arithmetic",
    "q87_hll_union" -> "one-row exact distinct joined to the one-row sketch union",
    "q129_ivfpq_search" -> "k-row centroid + m·k-row codebook broadcasts for the probe/ADC-table crossJoins (brute-force exact baseline broadcasts the 5-row query set)",
    "q131_crossmodal_retrieval" -> "5-row query-embedding table broadcast for the exact cross-modal kNN scan",
    "q135_rag_retrieval" -> "5-row query-embedding table broadcast for the chunk-index kNN scan (q131's kernel)",
    "q136_token_drift" -> "two one-row snapshot token totals (ppm denominators) broadcast onto the vocab counts",
    "q151_embedding_curation_capstone" -> "centroid table (8 rows) broadcast for the two assignment crossJoins (q110's shape; trainer is the shared checkpointed artifact)",
    "q157_constraint_audit" -> "one-row total-count aggregate crossed with the one-row orphan-count aggregate (refCheck's scalar attachment)",
    "q138_epoch_mixture" -> "one-row (budget, isq_sum) totals broadcast onto the stratum counts",
    "q126_snapshot_diff" -> "one-row max(doc_id)+1 synthetic-id offset broadcast onto the recrawl's 'added' leg",
    "q164_ivf_search" -> "k-row centroid broadcast for the coarse-routing crossJoin (brute-force exact baseline broadcasts the 5-row query set — q129's shape over the plain-IVF index)",
    "q166_word_pmi" -> "one-row bigram total (PMI numerator) broadcast onto the pair counts",
    "q173_association_rules" -> "one-row basket total (lift numerator) broadcast onto the pair counts",
    "q248_kn_bigram" -> "one-row bigram-type total |B| (KN continuation denominator) broadcast onto the type table (q166's shape)",
    "q249_vocab_coverage" -> "one-row corpus token total (coverage denominator) broadcast onto the 3-point coverage frame",
    "q183_bm25_scoring" -> "one-row (n_docs, a_tokens) corpus totals broadcast onto the per-(doc,term) tf rows (q60's idf-denominator shape)",
    "q192_link_prediction" -> "one-row adaptive degree-cap threshold (floor(sqrt(2|E|)), wedge mass <= (2|E|)^1.5) broadcast onto the node-degree frame",
    "q193_incremental_join_view" -> "one-row max(o_orderkey)+1 synthetic-id offset broadcast onto the CDC insert clones (q126's shape)",
    "q271_incremental_join_agg" -> "same one-row max(o_orderkey)+1 offset broadcast as q193, applied to both sides' CDC insert clones",
    "q279_multivar_ols" -> "one-row min(day) anchor broadcast onto the corpus (day-index feature), q193's one-row-offset shape",
    "q288_tv_drift" -> "one-row (min+max)/2 midpoint broadcast onto the corpus (half assignment), q193's one-row shape",
    "q280_multiprobe_recall" -> "brute-force exact baseline broadcasts the 8-row query set (q129/q164's shape) for the recall gate",
    // q194's 1-row query-id crossJoin runs inside the eager shortlist
    // checkpoint, so no BNLJ reaches its final plan
    "q197_chisq_independence" -> "one-row grand-total N broadcast onto the 35-cell contingency table (expected-count denominator)",
    "q200_quantile_normalize" -> "one-row global token total broadcast onto the value-domain histogram (ppm denominator)",
    "q204_equi_depth_histogram" -> "10-row decile-threshold frame broadcast for the inequality threshold join + 1-row total (value-domain frames)",
    "q209_pseudonymize" -> "three one-row audit aggregates cross-joined into the single report row (q157's scalar-attachment shape)",
    "q213_dataset_card" -> "three one-row corpus aggregates cross-joined into the bounded (metric, value) report frame",
    "q215_ks_test" -> "1-row source picks + totals + max broadcast onto the value-domain histogram (KS numerator/denominator scalars)",
    "q220_ivf_probe_curve" -> "k-row centroid broadcast for the three coarse-routing crossJoins (q164's shape, once per nprobe setting)",
    "q222_gap_deciles" -> "10-row decile-threshold frame broadcast for the inequality threshold join + 1-row total (q204's shape on the gap domain)",
    "q228_conversion_latency" -> "10-row decile-threshold frame broadcast for the inequality threshold join + 1-row total (q222's shape on the latency domain)",
    // q180's 1-row round-max rescale crossJoins run inside Graph.hits's
    // eager per-round checkpoints, so no BNLJ reaches its final plan
    "q179_linear_interpolate" -> "one-row date-range limits attached to build the daily spine (q77's shape)",
    "q259_purged_folds" -> "one-row day-range bounds + 5-row fold-bounds broadcasts onto the tiny per-day count frame (aggregate-first split arithmetic)",
    "q265_rfm_segments" -> "one-row user-count total broadcast onto the value-domain histogram for quintile threshold picks (q204's denominator shape)",
    "q250_benford" -> "one-row positive-cents row total broadcast onto the 9-digit Benford frame (share denominator)",
    "q252_modularity" -> "one-row total edge weight m (modularity denominator) broadcast onto the per-community frame"
  )

  // one plan-build pass shared by every rule AND with the registry sweep
  // (TestQueryCache): some fns do real work at build time — q94 runs an
  // actual stream — so each query is built exactly once per JVM
  private lazy val plans: Seq[(String, String)] = Registry.all.map { q =>
    q.name -> TestQueryCache.df(spark, sf, q.name)
      .queryExecution.executedPlan.toString
  }

  /** queryName -> why a SINGLE-PARTITION WindowExec is acceptable there.
    * The only sanctioned shape: a global row_number/rank directly above a
    * bounded `limit(k)` (k constant, single digits) — the k-row frame
    * moves to one partition by construction, so "all data to a single
    * partition" is k rows, not the corpus. Anything else fails the sweep:
    * an unpartitioned window over a data-sized frame is the classic
    * silent scale-killer (the WindowExec WARN in a log is this lint's
    * runtime cousin).
    */
  private val allowedGlobalWindow: Map[String, String] = Map(
    // the PQ trainer init sites (pqCodebooks) carry the same shape but
    // run inside eager localCheckpoints during fn() evaluation, so their
    // windows never reach a query's final plan — only the in-memory IVF
    // trainer's init is visible here
    "q55_ann_recall" -> "IVF centroid init: row_number over the orderBy(id).limit(16) seed rows",
    "q108_graph_evolution" -> "GlobalLag boundary patch: lag over the #partitions-sized per-partition-tails frame (bounded by task count, not data)",
    "q237_rank_fusion" -> "retriever-depth rank assignment: row_number over each orderBy(...).limit(100) rank list — the window moves 100 rows, never the corpus",
    "q241_curriculum_order" -> "GlobalPrefixSum boundary-offset window over the #partitions-sized per-partition totals (q210's shape on the curriculum rank)",
    "q249_vocab_coverage" -> "vocab rank: row_number over the orderBy(cnt).limit(10000) TopK frame — the window moves 10^4 rows, never the corpus (q237's shape)",
    // q180's GlobalLag boundary-patch window now runs inside the
    // checkpointed node frame (hits ckpts nodes instead of persisting
    // it), so no global window reaches its final plan
    "q200_quantile_normalize" -> "global cumulative sum over the VALUE-DOMAIN histogram (distinct n_chars values — bounded by the value domain, not the corpus)",
    "q204_equi_depth_histogram" -> "global cumulative sum over the VALUE-DOMAIN histogram (q200's frame, decile-boundary variant)",
    "q210_peak_concurrency" -> "GlobalPrefixSum boundary-offset window over the #partitions-sized per-partition totals (GlobalLag's patch shape)",
    "q215_ks_test" -> "cumulative CDF sums over the merged VALUE-DOMAIN histogram (distinct n_chars values — q200's frame, two-sample variant)",
    "q222_gap_deciles" -> "global cumulative sum over the VALUE-DOMAIN gap histogram (distinct gap values — q204's frame on a derived metric)",
    "q225_user_growth" -> "cumulative sum over the per-day new-user aggregate (calendar-bounded day frame, never corpus rows)",
    "q228_conversion_latency" -> "global cumulative sum over the VALUE-DOMAIN latency histogram (distinct latency values - q222's frame)",
    "q251_gini" -> "GlobalPrefixSum boundary-offset window over the #partitions-sized per-partition totals (q210's shape on the spend-total value domain)",
    "q307_louvain_multilevel" -> "monotone-Q gate: lag over the LEVEL summary frame (nLevels+1 = 4 rows — bounded by the level count, never graph-sized)"
  )

  /** A WindowExec line with ONE "], [" separator has (functions, order)
    * but no partition spec — the single-partition form. Partitioned
    * windows render three bracket groups: functions, partition, order.
    */
  private def hasGlobalWindow(plan: String): Boolean =
    plan.linesIterator.exists { l =>
      val t = l.dropWhile(c => !c.isLetter)
      // two bracket groups = (functions, X). X is an ORDER spec (ASC/
      // DESC markers, or empty) → no partition spec → single partition.
      // X without sort markers is a partition spec (partition-only
      // window, e.g. max().over(partitionBy(id))) — distributed, fine.
      t.startsWith("Window [") && {
        val groups = "\\[[^\\]]*\\]".r.findAllIn(t).toSeq
        groups.length == 2 &&
          (groups(1) == "[]" || groups(1).contains(" ASC") ||
            groups(1).contains(" DESC"))
      }
    }

  test("single-partition Window appears only above a bounded limit " +
    "(allowlisted with reason)") {
    val offenders = plans.collect {
      case (name, plan)
          if hasGlobalWindow(plan) && !allowedGlobalWindow.contains(name) =>
        name
    }
    assert(offenders.isEmpty,
      s"unpartitioned WindowExec in: ${offenders.mkString(", ")} — " +
        "partition the window, or allowlist it WITH the bounded-limit reason")
    val actual = plans.collect {
      case (name, plan) if hasGlobalWindow(plan) => name
    }.toSet
    val stale = allowedGlobalWindow.keySet -- actual
    assert(stale.isEmpty,
      s"stale global-window allowances: ${stale.mkString(", ")}")
  }

  test("no query plan contains an unconditional CartesianProduct") {
    val offenders = plans.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("BroadcastNestedLoopJoin appears only where the design calls for it") {
    val offenders = plans.collect {
      case (name, plan)
          if plan.contains("BroadcastNestedLoopJoin") && !allowedBnlj.contains(name) =>
        name
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop joins in: ${offenders.mkString(", ")} — " +
        "either fix the plan or add an allowance WITH its reason")
    // self-maintenance: an allowance whose query no longer produces a
    // BNLJ is stale documentation — prune it
    val actual = plans.collect {
      case (name, plan) if plan.contains("BroadcastNestedLoopJoin") => name
    }.toSet
    val stale = allowedBnlj.keySet -- actual
    assert(stale.isEmpty, s"stale BNLJ allowances (plan no longer has one): ${stale.mkString(", ")}")
  }
}
