package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Production similarity search over an embedding column
  * (`array<float>`/`array<double>`), designed for scale:
  *
  *  - '''bruteForceTopK''' — broadcast the (small) query set, one pass over
  *    the corpus computing dots in fast double math, per-partition top-k
  *    via window after an AQE-coalesced shuffle on q_id. Exact; the
  *    baseline every ANN variant is measured against.
  *  - '''annBuckets / annTopK''' — sign-random-projection LSH: p
  *    deterministic ±1 hyperplanes (seeded hash bits, no RNG state to
  *    ship), bucket = p-bit signature, candidates only within the query's
  *    bucket (2^p-fold pair reduction; probe neighboring buckets for
  *    recall if needed).
  *
  * Double (not decimal) arithmetic here: these are the fast operators;
  * bit-exact cross-engine parity lives in [[SimilarityQueries]].
  */
object Similarity {

  /** dot(a, b) in double math (sequential, deterministic per row) —
    * interpreted-lambda fallback; prefer [[fastDot]] where the graft_dot
    * native expression is registered.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Codegen'd native dot product (graft.functions.DotProductF). Requires
    * registration: GraftExtensions at build time or GraftRegistrar.register
    * on a live session (SparkEntry does this automatically).
    */
  def fastDot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm2(a: Column): Column = dot(a, a)

  /** Codegen'd squared norm; same registration requirement as [[fastDot]]. */
  private def fastNorm2(a: Column): Column = fastDot(a, a)

  /** Exact cosine top-k: for each row of `queries`, the k nearest corpus
    * rows (excluding identical ids). Self-registers the graft extensions so
    * the dot products run through the codegen'd native expression even on a
    * session built without GraftExtensions (the interpreted lambda path is
    * ~10× slower — measured, see BASELINE.md).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("nrm", sqrt(fastNorm2(col("emb"))))
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .withColumn("q_nrm", sqrt(fastNorm2(col("q_emb"))))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("id"))
    c.join(broadcast(q), col("id") =!= col("q_id"))
      .withColumn("cosine", fastDot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "id", "rnk", "cosine")
  }

  /** Deterministic ±1 hyperplane p (dim components), seeded by md5 bits. */
  private[ops] def hyperplane(p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft:$p:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }

  /** Adds an LSH `bucket` column: p-bit sign signature. `dim` is the
    * embedding dimensionality, taken as a parameter — probing it with a
    * `first()` would cost one extra Spark job per call just to learn a
    * constant the caller already knows.
    */
  def annBuckets(df: DataFrame, embCol: String, dim: Int,
      planes: Int = 8): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(df.sparkSession)
    val bits = (0 until planes).map { p =>
      val hp = array(hyperplane(p, dim).map(lit): _*)
      when(fastDot(col(embCol), hp) > 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)
    df.withColumn("bucket", bits)
  }

  private val nearDupObsId = new java.util.concurrent.atomic.AtomicLong()

  /** Embedding-cosine near-dup pairs at scale: candidates only within an
    * LSH bucket (2^planes-fold pair reduction vs all-pairs), then exact
    * cosine threshold. The dedup-family member for embedding columns;
    * recall can be raised by unioning runs with different plane seeds.
    *
    * `maxBucketSize` is the same skew guard [[Dedup.minhashCandidates]]
    * carries: a near-dup embedding corpus is FULL of identical vectors
    * (exact-duplicate documents embed identically), and one bucket of f
    * rows would emit f² candidate pairs. Buckets over the cap degrade to
    * DUAL-ROOT STAR pairs (each member vs the bucket's two smallest ids) —
    * every member still surfaces against a cluster representative at
    * O(2f) cost even when one unrelated min-id vector hash-collides into
    * the bucket, but intra-cluster pairs not involving a root are not
    * emitted. The cap
    * is OPT-IN (default uncapped = exact pair enumeration, matching
    * [[Featurize.sparseCosineTopK]]'s uncapped default) so enabling the
    * scale guard is a visible recall decision at the call site, never a
    * silent one; over-cap row volume is observable via the
    * `graft.ann.bucket_cap.*` metric.
    */
  def annNearDupPairs(
      df: DataFrame, idCol: String, embCol: String, threshold: Double,
      dim: Int, planes: Int = 8, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(df.sparkSession) // fastDot
    val b = annBuckets(df, embCol, dim, planes)
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("bucket"))
      .withColumn("nrm", sqrt(fastNorm2(col("emb"))))
    // Hot-bucket detection is a map-side-combinable groupBy — one row per
    // bucket over the shuffle — never count().over(Window), which would
    // pull every row of a giant identical-vector cluster into one task.
    // The hot set is the pathological tail, so the join-backs stay small
    // (AQE broadcasts them) and the fat side keeps its partitioning.
    val hot = b.groupBy("bucket")
      .agg(count(lit(1)).as("_bs"), min(col("id")).as("_r1"))
      .filter(col("_bs") > maxBucketSize)
      .observe(s"graft.ann.bucket_cap.${nearDupObsId.incrementAndGet()}",
        coalesce(sum(col("_bs")), lit(0L)).as("rows_over_cap"))
    val small = b.join(hot.select("bucket"), Seq("bucket"), "left_anti")
    val x = small.select(col("id").as("id_a"), col("emb").as("emb_a"),
      col("nrm").as("nrm_a"), col("bucket"))
    val y = small.select(col("id").as("id_b"), col("emb").as("emb_b"),
      col("nrm").as("nrm_b"), col("bucket").as("bucket_b"))
    val clique = x.join(y,
        col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("emb_a"), col("nrm_a"),
        col("id_b"), col("emb_b"), col("nrm_b"))
    // over-cap buckets: DUAL-ROOT star — pair every member with the
    // bucket's TWO smallest ids (2f rows). A single min-id root is not
    // enough: an unrelated vector that hash-collides into the hot bucket
    // with the smallest id would make every (root, member) pair fail the
    // exact-cosine verify below and silently lose the whole cluster; with
    // two roots one outlier cannot sink it (two simultaneous outlier
    // roots in one bucket is the accepted residual risk of the cap).
    val overCap = b.join(hot.select("bucket", "_r1"), Seq("bucket"))
    val r2 = overCap.filter(col("id") =!= col("_r1"))
      .groupBy("bucket").agg(min(col("id")).as("_r2"))
    val rootIds = hot.select(col("bucket"), col("_r1").as("_root"))
      .unionAll(r2.select(col("bucket"), col("_r2").as("_root")))
    val roots = b.join(rootIds, Seq("bucket"))
      .filter(col("id") === col("_root"))
      .select(col("bucket").as("bucket_r"), col("id").as("id_a"),
        col("emb").as("emb_a"), col("nrm").as("nrm_a"))
    val star = overCap
      .select(col("bucket"), col("id").as("id_b"), col("emb").as("emb_b"),
        col("nrm").as("nrm_b"))
      .join(roots, col("bucket") === col("bucket_r") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("emb_a"), col("nrm_a"),
        col("id_b"), col("emb_b"), col("nrm_b"))
      .distinct()
    clique.union(star)
      .withColumn("cosine", fastDot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** IVF (inverted-file) coarse quantizer: k-means centroids trained with
    * DataFrame-native Lloyd iterations. Deterministic: init = first k
    * vectors by id, ties in assignment broken by centroid id. Each
    * iteration is one broadcast-join assignment pass + one element-wise
    * mean (posexplode + two hash aggs) — no driver-side math over the
    * corpus, so training scales with executor count.
    */
  def ivfCentroids(
      corpus: DataFrame, idCol: String, embCol: String, k: Int,
      iters: Int = 5): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val c0 = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("_init_id"), col(embCol).as("centroid"))
      .withColumn("centroid_id",
        row_number().over(Window.orderBy("_init_id")).cast(LongType) - 1)
    var centroids = c0.select(col("centroid_id"),
      transform(col("centroid"), x => x.cast(DoubleType)).as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assignToNearest(corpus, centroids, idCol, embCol)
      centroids = assigned
        .select(col("centroid_id"), posexplode(col(embCol)).as(Seq("i", "x")))
        .groupBy("centroid_id", "i")
        // decimal-bridged mean (NOT avg): the coordinate sum is exact and
        // order-independent, so the trained quantizer is bit-identical
        // across runs, partitionings, and engines — plain avg() of
        // doubles drifts with partial-aggregation order, which made the
        // index nondeterministic run-to-run and blocked a value-level
        // oracle (q104). The one double division (exact inputs) is
        // exactly rounded, hence deterministic.
        .agg((sum(col("x").cast(DoubleType).cast(DecimalType(28, 12)))
          .cast(DoubleType) / count(lit(1))).as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("parts"))
        .select(col("centroid_id"),
          transform(col("parts"), p => p.getField("m")).as("centroid"))
    }
    centroids
  }

  /** Product quantization codes: the embedding is split into `m`
    * contiguous subspaces, each quantized by its own `k`-centroid
    * deterministic Lloyd trainer ([[ivfCentroids]] on the sliced
    * corpus — decimal-bridged means, so the codebooks are bit-identical
    * across runs and engines), and each row is coded by its nearest
    * centroid per subspace. PQ is the standard memory-compression layer
    * under large-scale ANN (m·log2(k) bits per vector instead of 4·dim
    * bytes).
    *
    * Assignment is ONE broadcast crossJoin against the m·k tagged
    * centroids followed by a partial-aggregable `min(struct(dist2, cid))`
    * argmin per (row, subspace): map-side combine collapses the ×(m·k)
    * expansion before the exchange, so the shuffle carries one combined
    * row per id — cheaper at corpus scale than [[assignToNearest]]'s
    * row_number window, which exchanges the expanded rows.
    */
  def pqCodes(corpus: DataFrame, idCol: String, embCol: String,
      m: Int = 2, k: Int = 4, iters: Int = 2, dim: Int = -1): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val sub = subDim(corpus, embCol, m, dim)
    val withNorm = pqCodebooks(corpus, idCol, embCol, m, k, iters, dim)
      .withColumn("c_nrm", fastNorm2(col("centroid")))
    pqAssign(corpus, idCol, embCol, withNorm, sub, m)
  }

  /** Per-subspace width. Pass the embedding dimension via `dim` when the
    * caller knows it (every production caller does — it is part of the
    * embedding model's contract): the `dim = -1` fallback costs a 1-row
    * scalar probe ACTION per call, which a training loop or repeated
    * index build should not pay.
    */
  private def subDim(corpus: DataFrame, embCol: String, m: Int,
      dim: Int = -1): Int = {
    val d =
      if (dim > 0) dim else corpus.select(size(col(embCol))).head().getInt(0)
    require(d % m == 0, s"embedding dim $d not divisible by m=$m")
    d / m
  }

  /** Tagged union of the per-subspace PQ codebooks:
    * (sub, centroid_id, centroid), m·k rows.
    *
    * All m subspaces train JOINTLY: the corpus is exploded ONCE into
    * (id, sub, subvec) rows (persisted across iterations), and each Lloyd
    * iteration is one broadcast join against the m·k tagged centroids +
    * a partial-aggregable `min(struct(dist2, cid, subvec))` argmin per
    * (id, sub) + one decimal-exact elementwise mean — two shuffled passes
    * per iteration for ALL subspaces, instead of m independent
    * [[ivfCentroids]] trainers each paying a corpus-wide row_number
    * window per iteration (m=16, iters=2 was 32 corpus passes; this is
    * 2 — measured 10.7 s → see BASELINE.md for the re-pin). Math is
    * bit-identical to the per-subspace trainers: same first-k-ids init,
    * same |c|²−2·v·c double distance, same (dist2, cid) tie-break, same
    * DECIMAL(28,12)-bridged means — so q116's unrolled per-subspace CTE
    * oracle still matches bit-exactly.
    *
    * The per-iteration `localCheckpoint` materializes only the m·k-row
    * centroid table (tiny), truncating lineage so iteration i+1 does not
    * re-run iteration i's assignment pass inside its own plan; the
    * persisted exploded corpus is dropped before returning (the final
    * checkpoint no longer references it).
    */
  def pqCodebooks(corpus: DataFrame, idCol: String, embCol: String,
      m: Int, k: Int, iters: Int, dim: Int = -1): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val sub = subDim(corpus, embCol, m, dim)
    val subSlices = posexplode(transform(sequence(lit(0), lit(m - 1)),
      j => transform(slice(col(embCol), j * sub + lit(1), lit(sub)),
        x => x.cast(DoubleType))))
    val subs = corpus
      .select(col(idCol).as("id"), subSlices.as(Seq("sub", "subvec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("id"), col(embCol))
      .withColumn("centroid_id",
        row_number().over(Window.orderBy("id")).cast(LongType) - 1)
      .select(col("centroid_id"), subSlices.as(Seq("sub", "centroid")))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val withNorm = cents.withColumn("c_nrm", fastNorm2(col("centroid")))
      val assigned = subs.join(broadcast(withNorm), Seq("sub"))
        .withColumn("dist2",
          col("c_nrm") - lit(2.0) * fastDot(col("subvec"), col("centroid")))
        .groupBy(col("id"), col("sub"))
        // lexicographic min on (dist2, cid, ...) == the per-subspace
        // trainer's row_number over (dist2, cid); cid is unique per
        // (sub) so the subvec field never reaches comparison — it rides
        // along to spare a re-join for the mean pass
        .agg(min(struct(col("dist2"), col("centroid_id"), col("subvec"))).as("a"))
      cents = assigned
        .select(col("sub"), col("a.centroid_id").as("centroid_id"),
          posexplode(col("a.subvec")).as(Seq("i", "x")))
        .groupBy("sub", "centroid_id", "i")
        .agg((sum(col("x").cast(DecimalType(28, 12)))
          .cast(DoubleType) / count(lit(1))).as("m"))
        .groupBy("sub", "centroid_id")
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("parts"))
        .select(col("sub"), col("centroid_id"),
          transform(col("parts"), p => p.getField("m")).as("centroid"))
        .localCheckpoint(true)
    }
    subs.unpersist()
    cents
  }

  /** IVF-PQ residual quantization — the composed index layout of
    * large-scale ANN systems: a coarse quantizer routes each vector to an
    * inverted list, and PQ codes the RESIDUAL (vector − list centroid),
    * which carries far less energy than the raw vector and so quantizes
    * with lower distortion at the same bit budget. Output: one row per
    * corpus row with (`idCol`, `list_id`, code_0..code_{m-1}).
    *
    * `coarse` is the trained (centroid_id, centroid) table — typically a
    * shared [[graft.ops.CorpusBuilds]] artifact so the Lloyd cost is paid
    * once per corpus, not per index build. The coarse assignment is the
    * partial-aggregable min-struct argmin (map-side combine collapses the
    * ×nLists expansion before the exchange; same (dist2, cid) tie order
    * as [[assignToNearest]]), and the residual subtraction is plain IEEE
    * double — both engines subtract identical doubles, so the PQ trainer
    * downstream sees bit-identical input (q120's oracle replays the whole
    * composition). The residual corpus is eagerly checkpointed: codebook
    * training and the coding pass both scan it, and at 100 TB it is
    * exactly the intermediate a production pipeline would materialize
    * between the route and code stages.
    */
  def ivfPqCodes(corpus: DataFrame, idCol: String, embCol: String,
      coarse: DataFrame, m: Int, k: Int, iters: Int,
      dim: Int = -1): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val withNorm = coarse.withColumn("c_nrm", fastNorm2(col("centroid")))
    val resid = corpus.crossJoin(broadcast(withNorm))
      .withColumn("dist2",
        col("c_nrm") - lit(2.0) * fastDot(col(embCol), col("centroid")))
      .groupBy(col(idCol))
      // centroid/emb ride along unreached (cid unique), sparing a re-join
      .agg(min(struct(col("dist2"), col("centroid_id"), col("centroid"),
        col(embCol).as("emb"))).as("a"))
      .select(col(idCol), col("a.centroid_id").as("list_id"),
        zip_with(col("a.emb"), col("a.centroid"),
          (x, c) => x.cast(DoubleType) - c).as("resid"))
      .localCheckpoint(true)
    val codes = pqCodes(resid, idCol, "resid", m, k, iters, dim)
    resid.select(col(idCol), col("list_id")).join(codes, Seq(idCol))
  }

  /** The PQ assignment pass (see [[pqCodes]] doc for the plan shape). */
  private def pqAssign(corpus: DataFrame, idCol: String, embCol: String,
      withNorm: DataFrame, sub: Int, m: Int): DataFrame = {
    val expanded = corpus
      .crossJoin(broadcast(withNorm))
      .withColumn("dist2",
        col("c_nrm") - lit(2.0) * fastDot(
          slice(col(embCol), col("sub") * sub + lit(1), lit(sub)),
          col("centroid")))
    val aggs = (0 until m).map { j =>
      min(when(col("sub") === j, struct(col("dist2"), col("centroid_id"))))
        .getField("centroid_id").as(s"code_$j")
    }
    expanded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** PQ asymmetric-distance (ADC) top-k search: queries keep their full
    * vectors, the corpus is represented ONLY by its PQ codes. Per query
    * the m·k subspace distance table `pd(sub, cid) = |c|² − 2·q_sub·c`
    * is precomputed (the per-query |q_sub|² terms are rank-constant and
    * dropped), broadcast, and each coded corpus row is scored by m table
    * lookups + an add — never touching the original embeddings. This is
    * the memory shape that lets a 100 TB corpus serve ANN from RAM:
    * m·log2(k) bits per vector instead of 4·dim bytes, with exact
    * re-ranking left to a final fetch of the top candidates.
    */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, m: Int = 2, kCent: Int = 16,
      iters: Int = 2, dim: Int = -1): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val sub = subDim(corpus, embCol, m, dim)
    val withNorm = pqCodebooks(corpus, idCol, embCol, m, kCent, iters, dim)
      .withColumn("c_nrm", fastNorm2(col("centroid")))
    val codes = pqAssign(corpus, idCol, embCol, withNorm, sub, m)
    // Per-query distance table flattened to ONE array indexed sub·k + cid:
    // the scored pass is then a single broadcast of |Q| rows and m
    // element_at lookups per coded row — one join, expression-only scoring
    // (the previous m-way join chain paid a planner/broadcast round per
    // subspace; same doubles, same j-ascending summation order).
    val qtab = queries
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .crossJoin(broadcast(withNorm))
      .select(col("q_id"),
        (col("sub") * kCent + col("centroid_id")).as("idx"),
        (col("c_nrm") - lit(2.0) * fastDot(
          slice(col("q_emb"), col("sub") * sub + lit(1), lit(sub)),
          col("centroid"))).as("pd"))
      .groupBy("q_id")
      .agg(map_from_entries(collect_list(struct(col("idx"), col("pd")))).as("pm"))
      // DENSIFY by key, not position: Lloyd can converge with < kCent
      // populated clusters (tiny/degenerate corpora), and a positional
      // array would then shift every later subspace's entries. Missing
      // slots get +inf — unreferencable, since no code can point at a
      // dropped centroid. Per-query work only (the broadcast side).
      .select(col("q_id"),
        transform(sequence(lit(0), lit(m * kCent - 1)), i =>
          coalesce(try_element_at(col("pm"), i.cast(LongType)),
            lit(Double.MaxValue))).as("pd_arr"))
    val w = Window.partitionBy("q_id").orderBy(col("adc"), col(idCol))
    codes.crossJoin(broadcast(qtab))
      .withColumn("adc", (0 until m).map(j =>
        element_at(col("pd_arr"),
          (lit(j * kCent) + col(s"code_$j") + 1).cast(IntegerType)))
        .reduce(_ + _))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col(idCol).as("id"), col("rnk"))
  }

  /** Full PQ search pipeline: ADC shortlist ([[pqAdcTopK]]) then EXACT
    * cosine re-rank of only the shortlisted candidates — the standard
    * two-stage shape (compressed-domain scan over everything, full
    * vectors fetched for `shortlist` rows per query). Output matches
    * [[bruteForceTopK]]: (q_id, id, rnk, cosine).
    */
  def pqSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, shortlist: Int = 100, m: Int = 16,
      kCent: Int = 16, iters: Int = 2, dim: Int = -1): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val cand = pqAdcTopK(corpus, queries, idCol, embCol, shortlist, m, kCent,
      iters, dim)
    exactRerank(cand, corpus, queries, idCol, embCol, k)
  }

  /** Exact-cosine re-rank of a (q_id, id) shortlist: fetch full vectors
    * for ONLY the shortlisted corpus rows (the compressed-domain stages
    * never touch them), broadcast the query vectors, keep top `k`. Shared
    * tail of [[pqSearch]] and [[searchIvfPq]].
    */
  private def exactRerank(cand: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("nrm", sqrt(fastNorm2(col("emb"))))
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .withColumn("q_nrm", sqrt(fastNorm2(col("q_emb"))))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("id"))
    cand.select("q_id", "id")
      .join(c, Seq("id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cosine",
        fastDot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "id", "rnk", "cosine")
  }

  /** Nearest centroid per row (squared L2 via dot products; ties by
    * centroid id). Centroids are broadcast — one pass, no shuffle of the
    * corpus.
    */
  def assignToNearest(
      corpus: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val withNorm = centroids.withColumn("c_nrm", fastNorm2(col("centroid")))
    val w = Window.partitionBy(idCol).orderBy(col("dist2"), col("centroid_id"))
    corpus.crossJoin(broadcast(withNorm))
      // |v|² is constant per row — rank by |c|² − 2·v·c
      .withColumn("dist2", col("c_nrm") - lit(2.0) * fastDot(col(embCol), col("centroid")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "dist2", "centroid", "c_nrm")
  }

  /** Probe-and-rank core shared by the in-memory and persisted-index IVF
    * paths: pick each query's `nprobe` nearest centroids (broadcast — the
    * centroid table is tiny), then exact cosine rank only within those
    * inverted lists.
    */
  private def searchLists(
      listed: DataFrame, cents: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int, nprobe: Int): DataFrame = {
    val withNorm = cents.withColumn("c_nrm", fastNorm2(col("centroid")))
    val wq = Window.partitionBy("q_id").orderBy(col("dist2"), col("centroid_id"))
    val probes = queries
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .crossJoin(broadcast(withNorm))
      .withColumn("dist2", col("c_nrm") - lit(2.0) * fastDot(col("q_emb"), col("centroid")))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("centroid_id"))
      .withColumn("q_nrm", sqrt(fastNorm2(col("q_emb"))))
    val wr = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("id"))
    listed.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("id") =!= col("q_id"))
      .withColumn("cosine", fastDot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")))
      .withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= k)
      .select("q_id", "id", "rnk", "cosine")
  }

  /** IVF ANN top-k, in-memory: trains the quantizer and searches in one
    * plan. For repeated querying build the index once with
    * [[buildIvfIndex]] and hit it with [[searchIvf]] — a real index must
    * not pay Lloyd iterations per query.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, nLists: Int = 16, nprobe: Int = 2, iters: Int = 5): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val cents = ivfCentroids(corpus, idCol, embCol, nLists, iters)
    val listed = assignToNearest(corpus, cents, idCol, embCol)
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("centroid_id"))
      .withColumn("nrm", sqrt(fastNorm2(col("emb"))))
    searchLists(listed, cents, queries, idCol, embCol, k, nprobe)
  }

  /** Builds and persists an IVF index under `dir`: `centroids` (the
    * trained quantizer) and `lists` (corpus rows + precomputed norms,
    * partitioned by `centroid_id` so a search's broadcast probe join
    * dynamically prunes unprobed list partitions at the file level).
    * Training cost is paid here, once.
    */
  def buildIvfIndex(
      corpus: DataFrame, idCol: String, embCol: String, dir: String,
      nLists: Int = 16, iters: Int = 5): Unit = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val cents = ivfCentroids(corpus, idCol, embCol, nLists, iters)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    val reread = corpus.sparkSession.read.parquet(s"$dir/centroids")
    assignToNearest(corpus, reread, idCol, embCol)
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("centroid_id"))
      .withColumn("nrm", sqrt(fastNorm2(col("emb"))))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$dir/lists")
  }

  /** Searches a persisted IVF index: reads `centroids` + `lists` written by
    * [[buildIvfIndex]] and runs the probe-and-rank pass only — zero Lloyd
    * iterations, zero corpus scans beyond the probed lists.
    */
  def searchIvf(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, idCol: String, embCol: String, k: Int,
      nprobe: Int = 2): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(spark)
    val cents = spark.read.parquet(s"$dir/centroids")
    val listed = spark.read.parquet(s"$dir/lists")
      .withColumn("centroid_id", col("centroid_id").cast(LongType))
    searchLists(listed, cents, queries, idCol, embCol, k, nprobe)
  }

  /** Builds and persists an IVF-PQ index under `dir` — the production
    * ANN index layout at 100 TB:
    *
    *  - `centroids`: the coarse quantizer (typically a shared
    *    [[CorpusBuilds]] artifact — Lloyd cost paid once per corpus);
    *  - `codebooks`: the PQ codebooks trained on the coarse RESIDUALS
    *    (vector − list centroid), m·kCent rows;
    *  - `lists`: ONE ROW PER CORPUS VECTOR holding only (`id`,
    *    code_0..code_{m−1}), written `partitionBy(list_id)` so a search's
    *    broadcast probe join prunes unprobed inverted lists at the FILE
    *    level. No full vectors in the index: m·log2(kCent) bits per
    *    vector is the whole point — exact re-ranking fetches vectors
    *    from the corpus table for the shortlist only.
    *
    * `dim` is the static embedding dimensionality, passed explicitly so
    * repeated builds skip the 1-row scalar probe.
    */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, embCol: String,
      coarse: DataFrame, dir: String, dim: Int, m: Int = 16,
      kCent: Int = 16, iters: Int = 2): Unit = {
    val spark = corpus.sparkSession
    org.apache.spark.sql.GraftRegistrar.register(spark)
    // one crash-atomic commit covers all three artifacts: a killed build
    // (or rebuild over a live index) can never strand a centroids/
    // codebooks/lists blend, and a concurrent searcher keeps resolving
    // the previous committed version
    val c = VersionedIndex.begin(spark, dir)
    try {
      coarse.write.mode("overwrite").parquet(s"${c.gen}/centroids")
      val cw = spark.read.parquet(s"${c.gen}/centroids")
        .withColumn("c_nrm", fastNorm2(col("centroid")))
      // route + residual: same argmin/ride-along shape as [[ivfPqCodes]]
      val resid = corpus.crossJoin(broadcast(cw))
        .withColumn("dist2",
          col("c_nrm") - lit(2.0) * fastDot(col(embCol), col("centroid")))
        .groupBy(col(idCol))
        .agg(min(struct(col("dist2"), col("centroid_id"), col("centroid"),
          col(embCol).as("emb"))).as("a"))
        .select(col(idCol).as("id"), col("a.centroid_id").as("list_id"),
          zip_with(col("a.emb"), col("a.centroid"),
            (x, c) => x.cast(DoubleType) - c).as("resid"))
        .localCheckpoint(true)
      val cbs = pqCodebooks(resid, "id", "resid", m, kCent, iters, dim)
      cbs.write.mode("overwrite").parquet(s"${c.gen}/codebooks")
      val cbw = spark.read.parquet(s"${c.gen}/codebooks")
        .withColumn("c_nrm", fastNorm2(col("centroid")))
      pqAssign(resid, "id", "resid", cbw, dim / m, m)
        .join(resid.select("id", "list_id"), Seq("id"))
        .write.mode("overwrite").partitionBy("list_id")
        .parquet(s"${c.gen}/lists")
      resid.unpersist(blocking = false)
      c.finish(VersionedIndex.Manifest(
        Map("centroids" -> Map("-" -> c.genLabel),
          "codebooks" -> Map("-" -> c.genLabel),
          "lists" -> VersionedIndex.writtenPartDirs(spark, s"${c.gen}/lists")
            .map(_ -> c.genLabel).toMap),
        Map("dim" -> dim.toLong, "m" -> m.toLong, "k_cent" -> kCent.toLong)))
    } catch { case e: Throwable => c.abort(); throw e }
  }

  private val listsEmptySchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("list_id",
      org.apache.spark.sql.types.IntegerType)))

  /** The committed inverted-list artifact, read through the manifest —
    * the full view (tests, probes). Searches read the same paths and
    * prune to the probed list partitions.
    */
  def readLists(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    VersionedIndex.readArtifact(spark, dir, m, "lists", None,
      listsEmptySchema)
  }

  /** Physical location of every live `lists` partition (mtime pins,
    * compaction assertions). */
  def listPartitionPaths(spark: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, String] = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    VersionedIndex.partitionPaths(dir, m, "lists")
  }

  /** COMPACTION (see [[VersionedIndex.compactPartitioned]]): collapse
    * inverted-list partitions holding more than `targetFiles` parquet
    * files to one file each as one crash-safe commit; conforming
    * partitions keep their generation dirs and mtimes. Returns
    * partitions compacted.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, targetFiles: Int = 1, keepLast: Int = 2): Int =
    VersionedIndex.compactPartitioned(spark, dir,
      Seq("lists" -> "list_id"), targetFiles, keepLast)

  /** IVF-PQ compressed-domain search over a [[buildIvfPqIndex]] index —
    * the production ANN READ path: coarse-route each query to its
    * `nprobe` nearest inverted lists, ADC-score ONLY those lists' PQ
    * codes against per-(query, list) residual distance tables, then
    * exact-cosine re-rank the `shortlist` survivors from the corpus
    * table. Plan shape, per stage:
    *
    *  1. Route: broadcast the tiny centroid table, row_number top-nprobe
    *     per query. The ride-along list centroid yields the residual
    *     query q − c_list, and the coarse score `|c|² − 2·q·c` is KEPT:
    *     ADC estimates |q−c_list−r̂|² = |q−c_list|² − 2·q_res·r̂ + |r̂|²,
    *     and the |q−c_list|² term differs per list, so dropping it (as
    *     the flat-PQ path may — its table is per-query constant) would
    *     mis-rank across lists. The per-query |q|² term IS constant
    *     across all of a query's candidates and is dropped everywhere.
    *  2. ADC tables: nprobe·m·kCent rows per query, flattened to one
    *     lookup array per (q_id, list_id) — the q119 broadcast shape.
    *  3. Scan: the `lists` parquet joins the broadcast probe table on
    *     its PARTITION column, so unprobed list partitions are pruned at
    *     the file level (pinned in PlanAssertionSpec) — at 100 TB the
    *     compressed scan touches nprobe/nLists of the index, nothing
    *     else, and never the raw vectors.
    *  4. Re-rank: [[exactRerank]] fetches full vectors for the
    *     shortlist only.
    */
  def searchIvfPq(spark: org.apache.spark.sql.SparkSession, dir: String,
      corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, dim: Int, nprobe: Int = 2, shortlist: Int = 100,
      m: Int = 16, kCent: Int = 16): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(spark)
    val sub = dim / m
    val (_, man) = VersionedIndex.readManifest(spark, dir)
    def art(a: String) =
      VersionedIndex.readArtifact(spark, dir, man, a, None, listsEmptySchema)
    val cw = art("centroids")
      .withColumn("c_nrm", fastNorm2(col("centroid")))
    val wq = Window.partitionBy("q_id").orderBy(col("dist2"), col("centroid_id"))
    val probes = queries
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .crossJoin(broadcast(cw))
      .withColumn("dist2",
        col("c_nrm") - lit(2.0) * fastDot(col("q_emb"), col("centroid")))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nprobe)
      .select(col("q_id"), col("centroid_id").as("list_id"),
        col("dist2").as("coarse_d2"),
        zip_with(col("q_emb"), col("centroid"),
          (x, c) => x.cast(DoubleType) - c).as("q_res"))
    val cbw = art("codebooks")
      .withColumn("cb_nrm", fastNorm2(col("centroid")))
    val qtab = probes.crossJoin(broadcast(cbw))
      .select(col("q_id"), col("list_id"), col("coarse_d2"),
        (col("sub") * kCent + col("centroid_id")).as("idx"),
        (col("cb_nrm") - lit(2.0) * fastDot(
          slice(col("q_res"), col("sub") * sub + lit(1), lit(sub)),
          col("centroid"))).as("pd"))
      .groupBy("q_id", "list_id", "coarse_d2")
      .agg(map_from_entries(collect_list(struct(col("idx"), col("pd")))).as("pm"))
      // densify by key — same guard as [[pqAdcTopK]]'s table
      .select(col("q_id"), col("list_id"), col("coarse_d2"),
        transform(sequence(lit(0), lit(m * kCent - 1)), i =>
          coalesce(try_element_at(col("pm"), i.cast(LongType)),
            lit(Double.MaxValue))).as("pd_arr"))
    val lists = art("lists")
      .withColumn("list_id", col("list_id").cast(LongType))
    val wa = Window.partitionBy("q_id").orderBy(col("adc"), col("id"))
    val cand = lists.join(broadcast(qtab), Seq("list_id"))
      .withColumn("adc", col("coarse_d2") + (0 until m).map(j =>
        element_at(col("pd_arr"),
          (lit(j * kCent) + col(s"code_$j") + 1).cast(IntegerType)))
        .reduce(_ + _))
      .filter(col("id") =!= col("q_id"))
      .withColumn("rnk", row_number().over(wa))
      .filter(col("rnk") <= shortlist)
    exactRerank(cand, corpus, queries, idCol, embCol, k)
  }

  /** Incremental IVF-PQ index maintenance — the CDC path a standing
    * 100 TB ANN index needs between full rebuilds: UPSERT `added`
    * vectors (route + code them with the index's FROZEN coarse
    * centroids and PQ codebooks — no retraining) and delete
    * `removedIds`, rewriting ONLY the touched inverted-list partitions
    * via dynamic partition overwrite. Untouched lists are never read,
    * never written — per-ingest cost tracks the delta and the lists it
    * lands in, not the corpus.
    *
    * Shape notes:
    *  - upsert semantics: rows whose id appears in `added` are replaced
    *    (anti-join on both the removed AND added id sets before the
    *    union), which also makes the operation idempotent — re-applying
    *    the same delta rewrites identical partitions;
    *  - the rewritten frame is localCheckpoint'ed BEFORE the write so
    *    the overwrite never reads the path it is replacing;
    *  - codebook drift is the operator's documented limit: after enough
    *    distribution shift, rebuild ([[buildIvfPqIndex]]) — the
    *    centroids/codebooks files are the frozen contract until then.
    */
  def updateIvfPqIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      added: DataFrame, removedIds: DataFrame, idCol: String, embCol: String,
      dim: Int, m: Int, keepLast: Int = 2,
      autoCompact: Option[Int] = None): Unit = {
    org.apache.spark.sql.GraftRegistrar.register(spark)
    val c = VersionedIndex.begin(spark, dir, keepLast)
    try {
      val man = c.baseManifest
      require(man.parts.nonEmpty, s"$dir holds no built index to update")
      def art(a: String, only: Option[Set[String]]) =
        VersionedIndex.readArtifact(spark, dir, man, a, only, listsEmptySchema)
      val cw = art("centroids", None)
        .withColumn("c_nrm", fastNorm2(col("centroid")))
      val cbw = art("codebooks", None)
        .withColumn("c_nrm", fastNorm2(col("centroid")))
      val resid = added.crossJoin(broadcast(cw))
        .withColumn("dist2",
          col("c_nrm") - lit(2.0) * fastDot(col(embCol), col("centroid")))
        .groupBy(col(idCol))
        .agg(min(struct(col("dist2"), col("centroid_id"), col("centroid"),
          col(embCol).as("emb"))).as("a"))
        .select(col(idCol).as("id"), col("a.centroid_id").as("list_id"),
          zip_with(col("a.emb"), col("a.centroid"),
            (x, c) => x.cast(DoubleType) - c).as("resid"))
        .localCheckpoint(true)
      val newCodes = pqAssign(resid, "id", "resid", cbw, dim / m, m)
        .join(resid.select("id", "list_id"), Seq("id"))
        .localCheckpoint(true)
      val rm = removedIds.select(col(idCol).as("id"))
      // touched-list discovery: column-pruned (id, list_id) scan of the
      // standing lists + the delta's own routes; a delta-sized collect
      // (bounded by the list count) keyed into the manifest
      val touched = newCodes.select(col("list_id").cast(LongType))
        .union(art("lists", None)
          .join(broadcast(rm), Seq("id"), "left_semi")
          .select(col("list_id").cast(LongType)))
        .distinct().collect().map(_.getLong(0)).toSeq
      val touchedDirs = touched.map(l => s"list_id=$l").toSet
      // rewrite reads ONLY the touched partitions' current paths and
      // writes ONLY this commit's generation dir — standing files are
      // immutable, untouched lists keep their mtimes, and the pointer
      // flip publishes the whole delta atomically
      val rewritten = art("lists", Some(touchedDirs))
        .withColumn("list_id", col("list_id").cast(LongType))
        .join(broadcast(rm), Seq("id"), "left_anti")
        .join(broadcast(newCodes.select("id")), Seq("id"), "left_anti")
        .unionByName(newCodes)
      rewritten.write.mode("overwrite").partitionBy("list_id")
        .parquet(s"${c.gen}/lists")
      val listParts = (man.parts("lists") -- touchedDirs) ++
        VersionedIndex.writtenPartDirs(spark, s"${c.gen}/lists")
          .map(_ -> c.genLabel)
      resid.unpersist(blocking = false)
      newCodes.unpersist(blocking = false)
      c.finish(VersionedIndex.Manifest(
        man.parts.updated("lists", listParts), man.stats))
    } catch { case e: Throwable => c.abort(); throw e }
    // auto-compaction policy: follow-on commit collapsing any inverted
    // list whose file count exceeded the threshold (no-op when none did)
    autoCompact.foreach(n => compactIndex(spark, dir, n, keepLast))
  }

  /** Symmetric int8 scalar quantization of an embedding column — 4× (vs
    * float32) / 8× (vs float64) memory reduction for ANN candidate stages,
    * with exact re-ranking left to the full-precision vectors. Output:
    * (`idCol`, `scale`, `q`: array<tinyint>) with
    * q[i] = floor(x[i]/scale·127 + 0.5) (explicit floor-of-shifted, NOT
    * round(): half-even vs half-up rounding differs between engines, floor
    * is identical everywhere — so the quantization is reproducible
    * cross-engine, see q54's oracle).
    *
    * Shape: posexplode → per-vector scale via window → quantize → ordered
    * re-assembly; the groupBy reuses the window's exchange, and every
    * stage is codegen'd (the array-lambda form would be interpreted).
    */
  def quantizeInt8(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val w = Window.partitionBy(idCol)
    df.select(col(idCol), posexplode(col(embCol)).as(Seq("i", "x")))
      .withColumn("scale", max(abs(col("x").cast(DoubleType))).over(w))
      .withColumn("qv",
        when(col("scale") === 0.0, lit(0L))
          .otherwise(floor(col("x").cast(DoubleType) / col("scale") * 127.0 + 0.5)
            .cast(LongType)))
      .groupBy(idCol, "scale")
      .agg(array_sort(collect_list(struct(col("i"), col("qv")))).as("parts"))
      .select(col(idCol), col("scale"),
        transform(col("parts"), p => p.getField("qv").cast(ByteType)).as("q"))
  }

  /** ANN quality harness: per-query recall@k of `approx` against `exact`
    * (both in the (q_id, id, rnk) shape the top-k operators emit). Every
    * query keeps a row — a query whose approximate candidates all miss
    * scores 0.0, not silence. The denominator is the number of exact
    * results actually available (≤ k): dividing by a constant k would
    * understate recall whenever the corpus has fewer than k neighbors for
    * a query, making 1.0 unreachable on small corpora.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val e = exact.filter(col("rnk") <= k).select("q_id", "id")
    val a = approx.filter(col("rnk") <= k).select("q_id", "id")
      .withColumn("_hit", lit(1))
    e.join(a, Seq("q_id", "id"), "left")
      .groupBy("q_id")
      .agg((sum(coalesce(col("_hit"), lit(0))).cast(DoubleType) /
        least(lit(k.toLong), count(lit(1))).cast(DoubleType)).as("recall"))
  }

  /** ANN top-k: exact cosine ranking restricted to the query's bucket.
    * Self-registers the graft extensions (see [[bruteForceTopK]]).
    */
  def annTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, dim: Int, planes: Int = 8): DataFrame = {
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val c = annBuckets(corpus, embCol, dim, planes)
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("bucket"))
      .withColumn("nrm", sqrt(fastNorm2(col("emb"))))
    val q = annBuckets(queries, embCol, dim, planes)
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"), col("bucket"))
      .withColumn("q_nrm", sqrt(fastNorm2(col("q_emb"))))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("q_id"))
      .withColumn("cosine", fastDot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "id", "rnk", "cosine")
  }

  /** MULTI-PROBE ANN top-k — the recall lever single-bucket sign-LSH
    * ([[annTopK]]) lacks without rebuilding the index: each query also
    * probes the buckets reached by flipping its LOWEST-MARGIN sign bits
    * (the planes whose dot product sits closest to the boundary — where
    * a true neighbor most likely landed on the other side; Lv et al.,
    * VLDB 2007). Candidates are the UNION of `1 + extraProbes` buckets,
    * deduped, then exact-cosine ranked — a strict superset of the
    * single-probe candidates, so recall can only improve, at
    * `(1 + extraProbes)×` the probe cost and ZERO extra index state
    * (the same bucket layout serves any probe budget). At 100 TB this
    * is the standard recall/latency dial: the corpus-side index is
    * untouched; only the broadcast query side fans out.
    */
  def annTopKMultiProbe(
      corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, dim: Int, planes: Int = 8, extraProbes: Int = 4): DataFrame = {
    require(extraProbes >= 0 && extraProbes <= planes,
      s"extraProbes must be in [0, planes], got $extraProbes")
    org.apache.spark.sql.GraftRegistrar.register(corpus.sparkSession)
    val c = annBuckets(corpus, embCol, dim, planes)
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("bucket"))
      .withColumn("nrm", sqrt(fastNorm2(col("emb"))))
    var q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .withColumn("q_nrm", sqrt(fastNorm2(col("q_emb"))))
    (0 until planes).foreach { p =>
      val hp = array(hyperplane(p, dim).map(lit): _*)
      q = q.withColumn(s"_d$p", fastDot(col("q_emb"), hp))
    }
    val base = (0 until planes).map(p =>
      when(col(s"_d$p") > 0, 1L << p).otherwise(0L)).reduce(_ + _)
    val margins = (0 until planes)
      .map(p => s"struct(abs(_d$p) AS m, $p AS p)").mkString(", ")
    val qq = q.withColumn("_base", base)
      .withColumn("bucket", explode(expr(
        s"""concat(array(_base),
           |  transform(slice(array_sort(array($margins)), 1, $extraProbes),
           |    e -> _base ^ CAST(shiftleft(1, e.p) AS BIGINT)))"""
          .stripMargin)))
      .select("q_id", "q_emb", "q_nrm", "bucket")
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("id"))
    c.join(broadcast(qq), Seq("bucket"))
      .filter(col("id") =!= col("q_id"))
      // a corpus point can surface through several probes of one query
      .dropDuplicates("q_id", "id")
      .withColumn("cosine",
        fastDot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "id", "rnk", "cosine")
  }

  /** Johnson–Lindenstrauss random projection to `k` dims with a Rademacher
    * (±1) matrix — the standard cheap dimensionality reduction in front of
    * clustering / ANN indexing (Achlioptas 2003: ±1 entries preserve
    * pairwise distances in expectation exactly like Gaussian entries, and
    * need no float matrix at all). The sign for (input dim i, output dim j)
    * derives from the parity of the first md5 hex digit of "i_j", so the
    * projection matrix is a pure expression both engines can materialize
    * bit-identically — no driver-side randomness, no broadcast state.
    *
    * Scale shape: one posexplode pass, then a single hash aggregate with
    * `k` map-side-combinable integer sums — shuffle volume is k partials
    * per vector regardless of input dim. No window, no join.
    *
    * Outputs micro-unit BIGINT coordinates (`p{j}_micro` = Σ ±round(x·10⁶)):
    * inputs are quantized by the q54 floor-shift (floor is bit-identical
    * across engines; a DECIMAL(28,12) bridge is NOT — Spark's
    * double→decimal cast rounds the shortest string form while DuckDB
    * rounds the exact binary value, and at scale 12 the two disagree by
    * one ulp often enough to fail a 500-vector corpus), and integer sums
    * are exact under any partial-aggregation order. For JL the 1e-6 input
    * quantization is semantically free — distances move by O(dim·1e-6).
    */
  def randomProjection(
      df: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val ex = df
      .select(col(idCol), posexplode(col(embCol)).as(Seq("i0", "x")))
      // 1-based position: matches DuckDB's generate_subscripts
      .select(col(idCol), (col("i0") + 1).cast(StringType).as("i"),
        floor(col("x").cast(DoubleType) * lit(1000000.0) + lit(0.5))
          .cast(LongType).as("xm"))
    val projs = (0 until k).map { j =>
      val sign = when(
        conv(substring(md5(concat(col("i"), lit(s"_$j"))), 1, 1), 16, 10)
          .cast(LongType) % 2 === 1, lit(1L)).otherwise(lit(-1L))
      sum(col("xm") * sign).cast(LongType).as(s"p${j}_micro")
    }
    ex.groupBy(col(idCol)).agg(projs.head, projs.tail: _*)
  }

  /** SemDeDup-shaped semantic dedup, scale path: connected components over
    * [[annNearDupPairs]] (sign-LSH blocked, optional bucket cap), each
    * component keeping its minimum id. Returns (`idCol`, `canonical_id`,
    * `is_keep`) for every input row — q52's text-components shape, in
    * embedding space. Recall inherits the ANN pair stage: pairs whose
    * vectors land in different sign buckets are not seen (raise `planes`
    * fidelity or pre-normalize embeddings to tighten); the exact-pair
    * semantics gate is the q86 oracle query.
    */
  def semanticDedup(
      df: DataFrame, idCol: String, embCol: String, threshold: Double,
      dim: Int, planes: Int = 8, maxBucketSize: Int = Int.MaxValue): DataFrame =
    Dedup.canonicalize(
      df.select(idCol), idCol,
      annNearDupPairs(df, idCol, embCol, threshold, dim, planes, maxBucketSize))
}
