package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines. RNG-based sampling (`df.sample`) draws differently per run,
  * partitioning, and engine; at 100 TB a training corpus needs splits that
  * are '''stable''': re-running the pipeline, adding executors, or
  * switching engines must never move a document across the train/val/test
  * boundary. Hash-based assignment gives exactly that — the split is a
  * pure function of the key.
  *
  * md5 (not xxhash64) so the assignment is engine-portable: the DuckDB
  * oracle reproduces it bit-for-bit (see [[SamplingQueries]]).
  */
object Sampling {

  /** Uniform-ish value in [0, 1): first 8 md5 hex digits of the key's
    * string form, as an integer over 2^32. Pure per-row codegen'd
    * expression — no shuffle, no state.
    */
  def unitHash(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType).cast(DoubleType) / lit(4294967296.0)

  /** Adds a `split` column: "train" / "val" / "test" with the given
    * fractions (test gets the remainder). Deterministic per key.
    */
  def stableSplit(df: DataFrame, keyCol: String,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    val u = unitHash(col(keyCol))
    df.withColumn("split",
      when(u < trainFrac, "train")
        .when(u < trainFrac + valFrac, "val")
        .otherwise("test"))
  }

  /** Keeps a deterministic `fraction` of rows by key — the stable form of
    * `df.sample(fraction)`.
    */
  def stableSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(unitHash(col(keyCol)) < fraction)

  /** Deterministic stratified sampling: a per-stratum keep fraction — the
    * mixture-reweighting step of corpus construction (downsample
    * boilerplate-heavy sources, keep all of the rare high-quality ones).
    * Same stability contract as [[stableSample]]: assignment is a pure
    * function of (key, stratum weight), so re-runs, repartitioning, and
    * engine swaps keep the identical rows. Strata absent from `weights`
    * keep `defaultFrac`.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      weights: Map[String, Double], defaultFrac: Double = 1.0): DataFrame = {
    val frac = weights.foldLeft(lit(defaultFrac)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(unitHash(col(keyCol)) < frac)
  }

  /** Deterministic global pre-training shuffle, the 100 TB way: instead
    * of one global ORDER BY over the corpus (a full-cluster range sort),
    * each row hashes to one of `numShards` shards and is ordered inside
    * its shard by the same seeded hash. One hash-partition shuffle +
    * shard-local sorts; shards stream out in any order and readers
    * concatenate them. The order is a pure function of (seed, key):
    * re-runs, repartitionings, and engines agree row for row — change
    * `seed` to get an independent permutation per epoch. Returns
    * (`id`, `shard`, `pos`) with pos 0-based within shard.
    */
  def shuffleShards(df: DataFrame, keyCol: String, seed: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val h = md5(concat(lit(seed), lit(":"), col(keyCol).cast(StringType)))
    val shard = pmod(
      conv(substring(h, 1, 8), 16, 10).cast(LongType), lit(numShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col("id"))
    df.select(col(keyCol).as("id"), h.as("_h"), shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast(LongType) - 1)
      .select("id", "shard", "pos")
  }

  /** Deterministic exact-k cap per stratum — "at most k documents per
    * domain", the hard-cap companion of [[stratifiedSample]]'s
    * proportional keep. Rank = hash order (uniform, key-deterministic)
    * with the key itself as tiebreaker, so the kept set is a uniform
    * k-subset that is identical across runs, partitionings, and engines.
    * One hash-partition window per stratum; at 100 TB the window input is
    * the stratum, never the global frame.
    */
  /** Weighted priority sampling without replacement (the
    * Efraimidis–Spirakis shape, exponential-clock variant made
    * integer-exact): each item is replicated into `weightCol` unit rows
    * (bounded — callers cap the weight), every replica draws a
    * deterministic md5 key, and the item's priority is the MIN replica
    * key, so an item with w clocks wins a pairwise race with probability
    * ≈ w/(w+w′) — heavier items surface proportionally more often — yet
    * the whole draw is a pure function of (seed, id) that the DuckDB
    * oracle replays bit-for-bit (the float-keyed u^(1/w) classic cannot
    * be replayed portably). Returns the k smallest priorities.
    *
    * Scale shape: one bounded explode (≤ max-weight rows per item), one
    * map-side-combined min agg, and a partial TakeOrdered top-k — no
    * window, no shuffle beyond the agg. At 100 TB the explode factor is
    * the weight cap, a constant.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      seed: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val reps = df
      .select(col(idCol).as("doc_id"), col(weightCol).cast(LongType).as("weight"))
      // weight ≤ 0 must mean EXCLUSION: sequence(0, w-1) on w=0 yields the
      // DESCENDING array [0, -1] (two replicas → near-certain inclusion)
      // and negative weights explode arbitrarily large ranges. DuckDB's
      // range(0) is empty, so this filter is also the oracle-parity shape.
      .filter(col("weight") > 0)
      .withColumn("r", explode(sequence(lit(0L), col("weight") - 1)))
    val key = conv(substring(md5(concat_ws(":",
        lit(seed), col("doc_id").cast(StringType), col("r").cast(StringType))),
      1, 8), 16, 10).cast(LongType)
    reps.select(col("doc_id"), col("weight"), key.as("hk"))
      .groupBy("doc_id", "weight").agg(min("hk").as("priority"))
      .orderBy(col("priority").asc, col("doc_id")).limit(k)
  }

  def groupCap(df: DataFrame, keyCol: String, strataCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(unitHash(col(keyCol)), col(keyCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Topic-stratified sampling over the k-means quantizer — the
    * embedding-space analog of quality-bin rebalancing: train
    * [[Similarity.ivfCentroids]] (deterministic Lloyd), broadcast-assign
    * every document to its nearest centroid, then apply [[groupCap]]'s
    * hash-ranked cap WITHIN each cluster. This is the standard
    * cluster-balanced corpus-mixture step (cap the dominant topic
    * clusters so a scrape's boilerplate topic can't swamp the mixture).
    *
    * Returns the assignment with a `kept` flag rather than filtering, so
    * one corpus pass yields both candidate and kept counts downstream.
    * Scale shape: Lloyd is broadcast-join + hash aggs (see
    * [[Similarity.ivfCentroids]]); the cap is one window partitioned by
    * cluster — never a global frame; nothing returns to the driver.
    */
  def topicSample(corpus: DataFrame, idCol: String, embCol: String,
      nClusters: Int, iters: Int, capPerCluster: Int,
      centroids: Option[DataFrame] = None): DataFrame = {
    require(capPerCluster > 0, s"capPerCluster must be positive, got $capPerCluster")
    // a pre-trained quantizer (e.g. the shared CorpusBuilds artifact)
    // skips the Lloyd iterations entirely; determinism makes the two
    // paths value-identical
    val cents = centroids.getOrElse(
      Similarity.ivfCentroids(corpus, idCol, embCol, nClusters, iters))
    val assigned = Similarity.assignToNearest(corpus, cents, idCol, embCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("centroid_id").orderBy(unitHash(col(idCol)), col(idCol))
    assigned.withColumn("_rk", row_number().over(w))
      .withColumn("kept", (col("_rk") <= capPerCluster).cast(LongType))
      .drop("_rk")
  }

  /** Source-level curation — the C4/RefinedWeb-style DOMAIN filter: a
    * training corpus is policed per SOURCE, not just per document,
    * because template farms produce sources whose documents are mostly
    * copies of each other and boilerplate mills produce trivially-short
    * ones; both get dropped wholesale. One row per source:
    *
    *  - `n_docs`, `n_uniq_texts` (exact-dup detection within source),
    *    `dup_ppm` = ⌊10⁶·(n_docs − n_uniq)/n_docs⌋;
    *  - `avg_tokens_ppm` = ⌊10⁶·Σtokens/n_docs⌋ (rational, no doubles);
    *  - `n_cross_dup`: docs whose exact text also appears under ANOTHER
    *    source — the cross-source leakage diagnostic a per-source deduper
    *    would miss entirely;
    *  - `keep`: dup_ppm ≤ maxDupPpm AND avg_tokens_ppm ≥ 10⁶·minAvgTokens.
    *
    * Scale shape: two hash aggregations (by source and by text, both
    * map-side combined) + one semi-join of docs against the multi-source
    * text set; nothing touches the driver, everything is exact integer
    * arithmetic so the oracle replays it with zero tolerance.
    */
  def sourceCuration(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, maxDupPpm: Long = 300000,
      minAvgTokens: Long = 5): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(sourceCol).as("src"),
      col(textCol).as("txt"),
      TextAnalysis.tokenCount(col(textCol)).as("toks"))
    val perSource = base.groupBy("src").agg(
      count(lit(1)).as("n_docs"),
      countDistinct("txt").as("n_uniq_texts"),
      sum("toks").as("_tok_sum"))
    val multiSourceTexts = base.groupBy("txt")
      .agg(countDistinct("src").as("_ns"))
      .filter(col("_ns") > 1)
      .select("txt")
    val crossDup = base.join(multiSourceTexts, Seq("txt"), "left_semi")
      .groupBy("src").agg(count(lit(1)).as("n_cross_dup"))
    perSource.join(crossDup, Seq("src"), "left")
      .select(col("src").as("source"),
        col("n_docs"), col("n_uniq_texts"),
        expr("(1000000 * (n_docs - n_uniq_texts)) div n_docs").as("dup_ppm"),
        expr("(1000000 * _tok_sum) div n_docs").as("avg_tokens_ppm"),
        coalesce(col("n_cross_dup"), lit(0L)).as("n_cross_dup"))
      .withColumn("keep",
        when(col("dup_ppm") <= maxDupPpm &&
            col("avg_tokens_ppm") >= minAvgTokens * 1000000L, 1L)
          .otherwise(0L))
  }

  /** Cross-source duplication leakage MATRIX — which source pairs share
    * identical content, and how much. q103 reports per-source dup rates
    * and a total leakage number; curators triaging a mixture also need
    * the pairwise view ("is source A scraping source B?"). `fingerprint`
    * is any per-doc content key — full-text md5 for exact leakage, a lede
    * (prefix) hash for mirror/syndication detection, a minhash band for
    * near-dup leakage. Shape: one hash-distinct of (fingerprint, source)
    * — map-side combined, the frame is at most |corpus| rows — then a
    * self-equi-join on the fingerprint. The join is NOT quadratic in
    * corpus size: a fingerprint shared by s sources yields s·(s-1)/2
    * rows, and s is bounded by the source count (single digits), not the
    * copy count — a million copies of one page across 3 sources is still
    * 3 rows into the join.
    */
  def dupLeakageMatrix(df: DataFrame, fingerprint: Column,
      sourceCol: String): DataFrame = {
    val hs = df.select(fingerprint.as("h"), col(sourceCol).as("s"))
      .distinct()
    val a = hs.select(col("h"), col("s").as("src_a"))
    val b = hs.select(col("h").as("h_b"), col("s").as("src_b"))
    a.join(b, col("h") === col("h_b") && col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared_contents"))
  }

  /** Exact integer sqrt of a non-negative BIGINT column: hardware sqrt
    * plus a two-sided correction, so the result is ⌊√n⌋ EXACTLY in both
    * engines regardless of double rounding at perfect-square boundaries
    * (sqrt itself is IEEE-correctly-rounded, but floor of a 1-ulp-high
    * result would overshoot; the corrections are mutually exclusive).
    * Oracle-replayable with zero tolerance — see [[temperatureMix]].
    */
  def isqrt(n: Column): Column = {
    val r = floor(sqrt(n.cast(DoubleType))).cast(LongType)
    r - when(r * r > n, 1L).otherwise(0L) +
      when((r + 1L) * (r + 1L) <= n, 1L).otherwise(0L)
  }

  /** Temperature-balanced mixture (the Gopher/Llama source-balancing
    * recipe at temperature α = 1/2): each stratum's keep target is
    * k_s = min(n_s, base·⌊√n_s⌋) — sublinear in stratum size, so
    * dominant strata are tamed while strata with n_s ≤ base² keep
    * every document. Selection within a stratum is the hash-ranked
    * deterministic subset ([[groupCap]]'s convention), and [[isqrt]]
    * keeps the whole rule in exact integer arithmetic — the kept SET is
    * a pure function of (ids, stratum sizes, base), bit-identical across
    * runs, partitionings, and engines.
    *
    * Returns the input with `cap` and `kept` columns (no filter), so one
    * pass yields candidate and kept counts downstream. Scale shape: one
    * hash agg for stratum sizes (bounded rows), broadcast back, one
    * window partitioned by stratum — never a global frame.
    */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      base: Long): DataFrame = {
    require(base > 0, s"base must be positive, got $base")
    val caps = df.groupBy(strataCol)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("cap", least(col("n_docs"), lit(base) * isqrt(col("n_docs"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(unitHash(col(idCol)), col(idCol))
    df.join(broadcast(caps), Seq(strataCol))
      .withColumn("_rk", row_number().over(w))
      .withColumn("kept", (col("_rk") <= col("cap")).cast(LongType))
      .drop("_rk")
  }

  /** Epoch-aware token-budget mixture — the scheduling half of source
    * balancing ([[temperatureMix]] picks WHICH documents survive; this
    * computes HOW OFTEN each source is replayed). Given per-row token
    * counts, reallocate the corpus's own total token budget across
    * strata by α = 1/2 temperature weights (w_s ∝ ⌊√tokens_s⌋, the
    * Gopher/Llama mixture recipe), and report each stratum's repetition
    * factor: `epochs_ppm > 10⁶` means the source is up-sampled past one
    * epoch (the small-source repetition that mixture tables like the
    * Pile's publish), `< 10⁶` means it is subsampled.
    *
    * All arithmetic exact: [[isqrt]] for the weights, and the two
    * products that could overflow a 64-bit long at 100 TB token counts
    * (budget·isq ≈ 10¹⁴·10⁷; 10⁶·target) run in DECIMAL(38,0) before
    * the integral division — DuckDB mirrors with HUGEINT. One hash agg
    * (bounded by stratum count), a 1-row total broadcast back, per-row
    * arithmetic after that.
    */
  def epochMixture(df: DataFrame, strataCol: String, tokens: Column): DataFrame = {
    val counts = df.groupBy(strataCol).agg(sum(tokens).as("n_tokens"))
      .withColumn("isq", isqrt(col("n_tokens")))
    val totals = counts.agg(sum("n_tokens").as("budget"), sum("isq").as("isq_sum"))
    // degenerate-input guards (round-10 ADVICE): a stratum whose documents
    // all have zero tokens gives n_tokens = 0 (division → null in Spark but
    // an ERROR in DuckDB — an engine/oracle divergence); an all-empty input
    // gives isq_sum = 0. Both cases pin the affected ratio to 0.
    counts.crossJoin(broadcast(totals))
      .select(col(strataCol), col("n_tokens"),
        expr("CASE WHEN isq_sum = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000000 * isq) div isq_sum END").as("weight_ppm"),
        expr("CASE WHEN isq_sum = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST((CAST(budget AS DECIMAL(38,0)) * isq) div isq_sum AS BIGINT) END")
          .as("target_tokens"))
      .withColumn("epochs_ppm",
        expr("CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * target_tokens) div n_tokens AS BIGINT) END"))
  }

  /** Per-DOMAIN curation: [[sourceCuration]] keyed on the registrable
    * domain parsed from a URL column ([[Featurize.domainOf]]) instead of
    * a pre-labeled source tag. Real web corpora (C4, RefinedWeb) police
    * quality per registrable domain — `www.x.co.uk` and `blog.x.co.uk`
    * must land in the SAME bucket — which a raw host or source label
    * can't give you. The domain parse is a pure codegen'd regexp chain
    * (no UDF), so the grouping key costs nothing extra at scale; the
    * aggregation shape (two hash aggs + one semi-join, bounded output:
    * one row per domain) is inherited unchanged from [[sourceCuration]].
    */
  def domainCuration(df: DataFrame, idCol: String, textCol: String,
      urlCol: String, maxDupPpm: Long = 300000,
      minAvgTokens: Long = 5): DataFrame =
    sourceCuration(
      df.withColumn("_domain", Featurize.domainOf(col(urlCol))),
      idCol, textCol, "_domain", maxDupPpm, minAvgTokens)
      .withColumnRenamed("source", "domain")

  /** Hierarchical blocklist filter — the other half of per-domain
    * curation: a blocklist entry blocks its exact host AND every
    * subdomain under it (the way real URL blocklists are interpreted),
    * including whole-TLD entries. Matching explodes each host into its
    * label-suffix chain (`a.b.example.com` → 4 suffixes — label
    * boundaries, so `rc3.com` can never block `site-src3.com`) and
    * equi-joins the blocklist on the suffix: a bounded ≤#labels-fold
    * expansion and one hash join, never a LIKE scan — so a
    * million-entry blocklist is just a bigger join side (broadcast or
    * shuffled, Spark's choice), not a per-row loop.
    *
    * Output: one row per input row — (`idCol`, host, blocked_by,
    * is_blocked) with `blocked_by` the MOST SPECIFIC (longest) matching
    * entry, '' if none. Ties are impossible: two equal-length suffixes
    * of one host are the same string.
    */
  def blocklistFilter(df: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame): DataFrame = {
    val withHost = df.select(col(idCol),
      Featurize.hostOf(col(urlCol)).as("host"))
    val parts = split(col("host"), "\\.")
    val sufs = withHost.select(col(idCol), col("host"),
      explode(transform(sequence(lit(0), size(parts) - 1),
        j => array_join(slice(parts, j + 1, size(parts)), "."))).as("suf"))
    val matched = sufs
      .join(blocklist.select(col("blocked").as("suf")), Seq("suf"))
      .groupBy(idCol)
      .agg(max_by(col("suf"), length(col("suf"))).as("blocked_by"))
    withHost.join(matched, Seq(idCol), "left")
      .select(col(idCol), col("host"),
        coalesce(col("blocked_by"), lit("")).as("blocked_by"),
        when(col("blocked_by").isNotNull, 1L).otherwise(0L).as("is_blocked"))
  }
}
