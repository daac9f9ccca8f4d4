package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Production deduplication operators (DataFrame → DataFrame), designed
  * for the 100 TB path:
  *
  *  - shingling is pure array expressions (`transform`/`sequence`) — zero
  *    shuffle, no explode blow-up in the signature stage;
  *  - minhash signatures are computed per-row with `xxhash64` (codegen'd,
  *    64-bit) — one narrow pass;
  *  - the only shuffles are the LSH band self-join (on (band, bucket) —
  *    the classic linear-ish candidate generation) and the final distinct;
  *  - exact dedup is a single hash aggregation with map-side combine.
  *
  * The md5-based variants in [[DedupQueries]] exist for cross-engine
  * oracle parity; these are the fast ones.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: keeps the row with the minimal
    * tie-breaker per key (deterministic, unlike dropDuplicates).
    */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreaker: String): DataFrame = {
    val keep = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(tieBreaker)).as(tieBreaker))
    df.join(keep, keyCols :+ tieBreaker, "left_semi")
  }

  /** URL dedup: canonicalize ([[Featurize.canonicalizeUrl]]) and keep the
    * min-id row per canonical page. Per-doc audit output — every input row
    * appears with its canonical key, the group keeper, and its own keep
    * flag — so the caller can either filter `is_keep = 1` or join losers
    * to their keeper. The group pass is a hash aggregate (map-side
    * combined) plus a key-co-partitioned join back: two exchanges on the
    * canonical key at any scale, no windows.
    */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = df.select(col(idCol),
      Featurize.canonicalizeUrl(col(urlCol)).as("canonical_url"))
    val keepers = canon.groupBy("canonical_url")
      .agg(min(col(idCol)).as("keeper_id"))
    canon.join(keepers, Seq("canonical_url"))
      .select(col(idCol), col("canonical_url"),
        col("keeper_id").cast(LongType),
        when(col(idCol) === col("keeper_id"), 1L).otherwise(0L).as("is_keep"))
  }

  /** Word n-gram shingle array (distinct), computed without explode. */
  def shingleArray(textCol: Column, n: Int = 3): Column = {
    val toks = split(textCol, "\\s+")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** Word n-gram ARRAY of `split(text, " ")` semantics (empty tokens
    * kept), duplicates and positions preserved: element j is
    * toks[j..j+n−1] space-joined, one per start j in [0, size−n]; docs
    * under n tokens — and NULL text — yield no grams. This is the bulk
    * gram former: `explode`/`posexplode` of it replaces the
    * posexplode-tokens + (n−1)-lead-window pipeline the gram family used
    * to run, whose Window exchange+sort shuffled EVERY TOKEN of the
    * corpus just to see n−1 neighbors that were already adjacent in the
    * row's own text (guide §2.4: remove shuffles outright).
    *
    * Implementation: one codegen'd `regexp_extract_all` with a
    * lookbehind-anchored lookahead capture — a match fires exactly at
    * each token start with ≥ n−1 following separators, so the match
    * ORDINAL equals the gram's token-start index (positional consumers
    * posexplode it), and because single-space-split tokens are separated
    * by exactly one space, the captured text IS the old
    * `concat(w₀, ' ', …, wₙ₋₁)` byte for byte. Two rejected forms, both
    * measured slower at sf0.1: the lead-window pipeline (full token
    * exchange+sort, and multiply-referenced consumers only survived it
    * through ReusedExchange), and an interpreted `transform` lambda
    * (q30 0.64 s → 2.0 s: Catalyst HOFs do not codegen, and without an
    * exchange to reuse every referencing subtree re-ran the lambda pass).
    */
  private[ops] def gramMatches(text: Column, n: Int): Column =
    regexp_extract_all(text,
      lit("(?<=^| )(?=(" + "[^ ]* " * (n - 1) + "[^ ]*))"), lit(1))

  /** k minhash values per row: sig[k] = min over shingles of
    * xxhash64(k, shingle). Pure per-row expression — no shuffle — but the
    * array lambdas are INTERPRETED (Catalyst HOFs do not codegen), so this
    * form is for per-row signature columns and small streaming
    * micro-batches; bulk banding goes through [[bandedBuckets]], the
    * exploded codegen'd pipeline (~20× faster at corpus scale; measured —
    * see BASELINE.md round-1 notes and the round-3 rewrite).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      k => array_min(transform(shingles, s => xxhash64(k, s))))

  /** Stream-legal (id, band, bucket) LSH assignment: one row per
    * (row, band), pure per-row expressions (no window, no aggregation) —
    * the ONLY form Structured Streaming accepts mid-stream; see
    * `graft.streaming.CorpusStream.flagNearDups`. Interpreted HOFs inside:
    * fine for micro-batches, wrong for bulk corpora — use
    * [[bandedBuckets]] there.
    */
  private[graft] def bandedBucketsPerRow(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleSize: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = df.select(
      col(idCol).as("id"),
      minhashSignature(shingleArray(col(textCol), shingleSize), numHashes).as("sig"))
    sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * r + 1, lit(r))))).as(Seq("band", "bucket")))
  }

  /** ORACLE-PORTABLE stream-legal band buckets: q58's `hs` CTE
    * (bucket_b = min over 3-token shingles of md5(b || shingle)) as a
    * pure per-row expression — no window, no aggregation, so Structured
    * Streaming accepts it mid-stream, and the values are exactly what
    * the DuckDB oracle computes (q130 shares q58's oracle verbatim on
    * the strength of this). Deliberately NOT [[shingleArray]]: tokens
    * split on the literal single space and docs shorter than `n` tokens
    * get NO shingles (null buckets, which no equi-join can match) —
    * both matching the oracle's windowed-shingle CTE, where a short doc
    * simply has no `hs` rows. Interpreted HOFs inside: the md5-banded
    * family is the oracle bridge; xxhash production runs use
    * [[bandedBucketsPerRow]] / [[bandedBuckets]].
    */
  private[graft] def md5BandBucketsPerRow(df: DataFrame, idCol: String,
      textCol: String, bands: Int = 8, n: Int = 3): DataFrame = {
    val toks = split(col(textCol), " ")
    val shingles = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
    // materialize the shingle array in its own projection: the per-band
    // lambda below references it `bands` times, and an inline expression
    // would re-run the whole window-concat chain per band (measured 8×
    // interpreted-HOF cost on the micro-batch path). array_distinct is
    // free correctness-wise — min over duplicates equals min over the
    // set — and cuts the interpreted md5 count by the in-doc dup rate.
    df.select(col(idCol).as("id"), array_distinct(shingles).as("_sh"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => array_min(transform(col("_sh"),
            s => md5(concat(b.cast(org.apache.spark.sql.types.StringType), s))))))
          .as(Seq("band", "bucket")))
  }

  /** BATCH twin of [[md5BandBucketsPerRow]] — identical (band, bucket)
    * VALUES (same md5(band || 3-token-shingle) minima over the same
    * windowed shingle set) through the exploded pipeline: in-array gram
    * forming ([[gramMatches]]), explode, one hash aggregate with
    * `bands` partial `min(md5(...))`s, stack-unpivot. This is the side
    * that scans the standing CORPUS when building the incremental-dedup
    * index (q130's static side) — the per-row form's interpreted HOFs
    * there cost ~20× (the [[bandedBuckets]] lesson); the stream side has
    * no choice (aggregations are illegal mid-stream) but only pays them
    * on the ingest micro-batch.
    */
  private[graft] def md5BandBuckets(df: DataFrame, idCol: String,
      textCol: String, bands: Int = 8): DataFrame = {
    // grams form per row via the codegen'd regex ([[gramMatches]], no
    // lead-window token shuffle); the `bands` md5 minima stay on the
    // exploded codegen'd aggregate
    val sh = df.select(col(idCol).as("id"),
      explode(gramMatches(col(textCol), 3)).as("sh"))
    val sigCols = (0 until bands).map(i =>
      min(md5(concat(lit(i.toString), col("sh")))).as(s"s$i"))
    val stackArgs = (0 until bands)
      .map(i => s"$i, s$i").mkString(s"stack($bands, ", ", ", ") AS (band, bucket)")
    sh.groupBy("id").agg(sigCols.head, sigCols.tail: _*)
      .select(col("id"), expr(stackArgs))
  }

  /** (id, band, bucket) LSH assignment for BATCH corpora: the exploded
    * codegen'd pipeline — posexplode tokens, lead-window shingles, one
    * wide aggregation with `numHashes` partial min(xxhash64)s, bucket per
    * band from its signature slice, stack-unpivot to rows. Equivalent
    * bucketing to [[bandedBucketsPerRow]] (identical per-k minima over the
    * identical shingle set; bucket VALUES differ — they hash the slice
    * differently — but collision structure, which is all LSH uses, is the
    * same). Measured ~20× faster than the per-row HOF form at sf0.1
    * because every step stays in whole-stage codegen; the token shuffle it
    * adds is linear and map-side-combined.
    */
  /** Exploded (id, sh) shingle rows WITH positional duplicates — the
    * shingle pipeline every bulk operator builds on: in-array gram
    * forming ([[gramMatches]]) + explode, short docs contributing
    * their whole text as the single shingle ([[shingleArray]] parity).
    * Duplicate-sensitive consumers (Jaccard) must dedup downstream
    * (`collect_set` / `.distinct()`); min-hashing consumers must not.
    */
  private[graft] def shingleRows(df: DataFrame, idCol: String,
      textCol: String, shingleSize: Int): DataFrame = {
    // One per-row codegen'd gram pass + explode — no lead-window token
    // shuffle. `\s+`-split parity via whitespace-run collapse: split on
    // "\\s+" equals split on " " of the collapsed text (leading runs
    // leave the same leading empty token; a trailing whitespace run
    // leaves one trailing empty token in both forms, and [[gramMatches]]
    // reproduces the old null-lead cutoff, so parity holds),
    // and collapsed tokens are single-space-separated, so [[gramMatches]]
    // captures are byte-identical to the old window concats. Branch
    // parity with the old two-frame union: docs with ≥ n tokens emit
    // every positional gram; shorter docs emit their whole text
    // single-spaced; NULL text (size(NULL) = NULL fails both guards)
    // emits nothing — explode skips the NULL array.
    val norm = regexp_replace(col("_t"), "\\s+", " ")
    val toks = split(norm, " ")
    val grams = when(size(toks) >= shingleSize, gramMatches(norm, shingleSize))
      .when(size(toks) < shingleSize, array(concat_ws(" ", toks)))
    df.select(col(idCol).as("id"), col(textCol).as("_t"))
      .select(col("id"), explode(grams).as("sh"))
  }

  private[graft] def bandedBuckets(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleSize: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sh = shingleRows(df, idCol, textCol, shingleSize)
    // duplicates left in: min() is duplicate-insensitive, distinct would
    // be a wasted shuffle of the biggest frame
    val sigCols = (0 until numHashes).map(k =>
      min(xxhash64(lit(k), col("sh"))).as(s"s$k"))
    val sig = sh.groupBy("id").agg(sigCols.head, sigCols.tail: _*)
    val bucketCols = (0 until bands).map(b =>
      xxhash64((b * r until (b + 1) * r).map(i => col(s"s$i")): _*).as(s"b$b"))
    val stackExpr = s"stack($bands, " +
      (0 until bands).map(b => s"$b, b$b").mkString(", ") + ") AS (band, bucket)"
    sig.select(col("id") +: bucketCols: _*)
      .select(col("id"), expr(stackExpr))
  }

  private val obsId = new java.util.concurrent.atomic.AtomicLong()

  /** LSH candidate pairs: ids sharing any band bucket. bands × rowsPerBand
    * must equal numHashes. Returns (id_a, id_b) with id_a < id_b.
    *
    * `maxBucketSize` is the skew guard: a bucket holding f rows would emit
    * f² clique pairs, and a dedup corpus at scale is FULL of large
    * near-identical clusters — one 10⁵-doc boilerplate cluster would be
    * 10¹⁰ pairs per band. Buckets at or under the cap emit their full
    * clique; buckets ABOVE the cap degrade to DUAL-ROOT STAR pairs (each
    * member paired with the bucket's TWO smallest ids) — O(2f) pairs that
    * still flag every member against a cluster representative, so no
    * document is silently lost even when ONE unrelated min-id document
    * band-collides into the hot bucket (a single-root star would send
    * every pair through the verify against that outlier and lose the
    * cluster; two simultaneous outlier roots is the accepted residual
    * risk). Downstream [[jaccardVerify]] and [[canonicalize]] consume
    * star pairs exactly as well as clique pairs. The degraded-row volume
    * is observable via the `graft.lsh.bucket_cap.*` metric
    * (`rows_over_cap`) on the query's ObservationListener.
    */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      maxBucketSize: Int = 64): DataFrame = {
    val banded = bandedBuckets(df, idCol, textCol, numHashes, bands, shingleSize)
    // Hot-bucket detection is a map-side-combinable groupBy — one row per
    // bucket crosses the shuffle — NOT a count().over(Window), which would
    // materialize every row of a 10⁸-row boilerplate bucket in one task
    // before the filter discards it. The hot set is by construction the
    // pathological tail (buckets over the cap), so the join-backs against
    // it stay small and AQE turns them into broadcasts at runtime; the
    // anti-joined fat side keeps its original partitioning.
    val hot = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("_bs"), min(col("id")).as("_r1"))
      .filter(col("_bs") > maxBucketSize)
      .observe(s"graft.lsh.bucket_cap.${obsId.incrementAndGet()}",
        coalesce(sum(col("_bs")), lit(0L)).as("rows_over_cap"))
    val small = banded.join(hot.select("band", "bucket"),
      Seq("band", "bucket"), "left_anti")
    val a = small.select(col("id").as("id_a"), col("band"), col("bucket"))
    val b = small.select(col("id").as("id_b"), col("band").as("band_b"), col("bucket").as("bucket_b"))
    val clique = a.join(b,
        col("band") === col("band_b") && col("bucket") === col("bucket_b") &&
          col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    // DUAL-ROOT star for over-cap buckets: members pair with the bucket's
    // TWO smallest ids (2f rows). With one root, an unrelated document
    // that band-collides into the hot bucket holding the minimum id makes
    // every star pair fail the downstream Jaccard verify and the whole
    // cluster silently escapes dup flagging; a second root keeps the
    // cluster connected through a genuine member unless BOTH smallest ids
    // are outliers (the accepted residual risk).
    val overCap = banded.join(hot.select("band", "bucket", "_r1"),
      Seq("band", "bucket"))
    val r2 = overCap.filter(col("id") =!= col("_r1"))
      .groupBy("band", "bucket").agg(min(col("id")).as("_r2"))
    val rootIds = hot.select(col("band"), col("bucket"), col("_r1").as("_root"))
      .unionAll(r2.select(col("band"), col("bucket"), col("_r2").as("_root")))
    val star = overCap.select(col("band"), col("bucket"), col("id"))
      .join(rootIds, Seq("band", "bucket"))
      .filter(col("_root") < col("id"))
      .select(col("_root").as("id_a"), col("id").as("id_b"))
    clique.union(star).distinct()
  }

  /** Star-form LSH edges for component resolution: every row in a bucket
    * is connected to the bucket's MINIMUM id instead of to every other row.
    * Connected components over these edges are identical to components over
    * the full clique pairs (within a bucket everything reaches the min, so
    * transitive reachability is unchanged), but a bucket of f rows costs
    * O(f) edges instead of O(f²) — no cap needed, no skew exposure. This is
    * the scale path for cluster resolution; [[minhashCandidates]] (capped)
    * is for when the pairs themselves are the product.
    */
  def minhashStarEdges(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    val banded = bandedBuckets(df, idCol, textCol, numHashes, bands, shingleSize)
    // Per-bucket roots via a map-side-combinable groupBy.min + join-back,
    // not min().over(Window): the window form sorts every row of a bucket
    // into one task, so a giant bucket is a straggler; the join form keeps
    // the fat side splittable (AQE skew-join can split an SMJ partition,
    // it can never split a Window partition).
    val roots = banded.groupBy("band", "bucket").agg(min(col("id")).as("_root"))
    banded.join(roots, Seq("band", "bucket"))
      .filter(col("id") =!= col("_root"))
      .select(col("_root").as("id_a"), col("id").as("id_b"))
      .distinct()
  }

  /** Incremental dedup — the shape a standing 100 TB corpus actually
    * needs: flag documents in a NEW `batch` whose LSH band bucket collides
    * with any document already in `corpus`, without ever pairing the
    * corpus against itself. The join is batch-buckets ⋉ corpus-buckets
    * (left_semi, so corpus rows are never materialized into the output),
    * and the corpus side is exactly the precomputable part: at scale its
    * (band, bucket) table is persisted once, bucket-partitioned, and each
    * ingest batch — typically orders of magnitude smaller — probes it,
    * ideally as a broadcast of the BATCH side's buckets. Returns
    * (`id`, `is_dup` 1/0) for every batch row.
    */
  def dedupAgainst(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    val corpusBuckets = bandedBuckets(corpus, idCol, textCol, numHashes, bands, shingleSize)
      .select("band", "bucket")
    val flagged = bandedBuckets(batch, idCol, textCol, numHashes, bands, shingleSize)
      .join(corpusBuckets, Seq("band", "bucket"), "left_semi")
      .select(col("id")).distinct()
      .withColumn("_dup", lit(1L))
    batch.select(col(idCol).as("id"))
      .join(flagged, Seq("id"), "left")
      .select(col("id"), coalesce(col("_dup"), lit(0L)).as("is_dup"))
  }

  /** Exact Jaccard verification of candidate pairs (the precision stage
    * after LSH recall): joins shingle sets back and computes
    * |A∩B| / |A∪B| with array ops. Shingle sets are built by the codegen'd
    * exploded pipeline + `collect_set` (which dedups), and ONLY for docs
    * that actually appear in a candidate pair (semi-join first) — at scale
    * the candidate id set is far smaller than the corpus, so set
    * construction cost follows the candidates, not the corpus.
    */
  def jaccardVerify(
      df: DataFrame, candidates: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleSize: Int = 3): DataFrame = {
    val candIds = candidates.select(col("id_a").as("id"))
      .union(candidates.select(col("id_b").as("id")))
      .distinct()
    val needed = df.join(candIds, df(idCol) === candIds("id"), "left_semi")
    val sh = shingleRows(needed, idCol, textCol, shingleSize)
      .groupBy("id").agg(collect_set(col("sh")).as("sh"))
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Direct n-gram Jaccard pairs via a shingle self-join, with a
    * document-frequency cap as the skew guard: a shingle occurring in f
    * docs contributes f² join rows, so one hot boilerplate shingle makes
    * the uncapped join quadratic at scale. Shingles above `maxDocFreq`
    * carry no discriminative signal and are dropped from the Jaccard
    * universe (both from intersections and set sizes — the capped operator
    * is Jaccard over the capped shingle space, a well-defined semantics
    * rather than a lossy approximation of the uncapped one). For corpora
    * where no shingle exceeds the cap the result is identical to uncapped.
    *
    * Prefer [[nearDuplicates]] (LSH candidates → array verify) when a
    * minhash pass is acceptable; this operator is the exact-recall path.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      shingleSize: Int = 3, maxDocFreq: Int = 64): DataFrame = {
    // codegen'd shingle rows, deduped to set semantics (Jaccard needs sets)
    val sh = shingleRows(df, idCol, textCol, shingleSize).distinct()
    // Hot shingles (doc-freq over the cap) come from a map-side-combinable
    // groupBy count — one row per shingle crosses the shuffle — and are
    // removed with an anti-join against that (tiny, AQE-broadcastable) hot
    // set; a count().over(Window.partitionBy(sh)) would drag every row of
    // a hot shingle into one task just to drop it.
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDocFreq)
      .select("sh")
    val capped = sh.join(hot, Seq("sh"), "left_anti")
    val sizes = capped.groupBy("id").agg(count(lit(1)).as("n"))
    val a = capped.select(col("id").as("id_a"), col("sh"))
    val b = capped.select(col("id").as("id_b"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("jaccard",
        col("shared").cast(DoubleType) / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** End-to-end near-dup: LSH candidates → exact Jaccard filter.
    *
    * Inherits [[minhashCandidates]]'s `maxBucketSize` star degradation,
    * which changes RECALL for over-cap buckets: only member-vs-bucket-min
    * pairs reach the Jaccard verify there, so an intra-cluster pair whose
    * similarity to the bucket root falls below `threshold` is not emitted
    * even if the pair itself clears it (every member still surfaces in at
    * least one pair when it matches the root, so no document is silently
    * lost from dup FLAGGING — what degrades is pair completeness). Pass
    * `maxBucketSize = Int.MaxValue` to restore exact uncapped behavior
    * when the corpus is known skew-free; the over-cap row volume is
    * observable via the `graft.lsh.bucket_cap.*` metric on an
    * ObservationListener.
    */
  def nearDuplicates(
      df: DataFrame, idCol: String, textCol: String, threshold: Double = 0.8,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      maxBucketSize: Int = 64): DataFrame =
    jaccardVerify(df,
      minhashCandidates(df, idCol, textCol, numHashes, bands, shingleSize,
        maxBucketSize),
      idCol, textCol, threshold, shingleSize)

  /** Connected components over an undirected pair list — the cluster-
    * resolution stage a dedup pipeline needs after candidate pairs: every
    * node's label converges to the MINIMUM id in its component, so
    * `(id, label)` is directly the `(doc_id, canonical_id)` keep/drop map.
    *
    * Pure DataFrame joins (no GraphX): each round takes the min label over
    * self + neighbors, then pointer-jumps (label := label(label)), which
    * roughly halves path lengths — O(log D) rounds for diameter D instead
    * of O(D) for plain propagation. The loop is driver-side but each
    * iteration is fully distributed (two hash joins + two hash aggs), and
    * convergence is detected with a limit-1 existence probe, not a full
    * count.
    *
    * Every iterate is checkpointed: the round's self-join references
    * its input twice, so without lineage truncation the logical plan grows
    * ~3× per round and plan ANALYSIS kills the driver long before any data
    * does. When the session has a reliable checkpoint dir configured
    * (`sparkContext.setCheckpointDir`), iterates use fault-tolerant
    * `checkpoint()` — `localCheckpoint` blocks die with their executor, so
    * on a long-running cluster job losing one executor mid-iteration would
    * otherwise fail the whole fixpoint unrecoverably. Without a checkpoint
    * dir (tests, local mode) it falls back to `localCheckpoint`, whose
    * blocks the ContextCleaner frees once the previous iterate becomes
    * unreachable.
    *
    * Exiting via `maxIters` without convergence logs a warning and returns
    * the (possibly non-minimal) labels — callers that need certainty should
    * raise `maxIters`; pointer jumping converges in O(log diameter) rounds,
    * so the default 25 covers diameters far beyond any dedup graph.
    *
    * Output: (`node`, `label`) for every node appearing in `pairs`.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 25): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    // reliable checkpoint files are reclaimed by the ContextCleaner ONLY
    // under this flag (default false) — without it every invocation leaks
    // the edge frame plus one labels frame per round to the checkpoint dir
    if (reliable && !sc.getConf.getBoolean(
        "spark.cleaner.referenceTracking.cleanCheckpoints", defaultValue = false))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "connectedComponents is using reliable checkpoints but " +
          "spark.cleaner.referenceTracking.cleanCheckpoints is false: " +
          "iterate checkpoint files will accumulate in " +
          sc.getCheckpointDir.get + " until cleaned externally")
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    // no distinct: duplicate edges cannot change a min-aggregate, and the
    // dedup shuffle over the (biggest) edge frame would be pure cost
    val edges = ckpt(pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst"))))
    // init fuses round 1's neighbor-min into the same aggregation the
    // node list needs anyway: label0 = min(self, direct neighbors)
    var labels = ckpt(edges
      .groupBy(col("src").as("node")).agg(min("dst").as("m"))
      .select(col("node"), least(col("node"), col("m")).as("label")))
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      val nbr = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
        .groupBy("node").agg(min("label").as("nlabel"))
      val stepped = labels.withColumnRenamed("label", "old")
        .join(nbr, Seq("node"), "left")
        .select(col("node"), col("old"),
          least(col("old"), coalesce(col("nlabel"), col("old"))).as("lbl"))
      // pointer jump + carry the old label so convergence is a flag scan
      // over the checkpointed frame, not another join job
      val jumped = ckpt(stepped.as("x")
        .join(stepped.select(col("node").as("lnode"), col("lbl").as("llbl")),
          col("x.lbl") === col("lnode"), "left")
        .select(col("x.node").as("node"),
          coalesce(col("llbl"), col("x.lbl")).as("label"),
          (coalesce(col("llbl"), col("x.lbl")) =!= col("x.old")).as("_changed")))
      done = jumped.filter(col("_changed")).limit(1).count() == 0
      labels = jumped.drop("_changed")
      i += 1
    }
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents exited at maxIters=$maxIters without converging; " +
          "labels may be non-minimal — raise maxIters")
    labels
  }

  /** Near-dup resolution end to end: candidate pairs → components →
    * one canonical (minimum) id per cluster. Every row of `df` gets a
    * `canonical_id` (its own id when unpaired) and an `is_keep` flag
    * (1 for the cluster representative, 0 for rows to drop).
    */
  def canonicalize(
      df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("node", idCol)
    df.join(comps, Seq(idCol), "left")
      .withColumn("canonical_id", coalesce(col("label"), col(idCol)))
      .withColumn("is_keep",
        when(col("canonical_id") === col(idCol), 1L).otherwise(0L))
      .drop("label")
  }

  /** Quality-aware cluster representative selection — the step real dedup
    * pipelines run after [[canonicalize]]: keep the BEST copy of each
    * near-dup cluster, not the arbitrary minimum id (the min-id keeper
    * throws away the highest-quality duplicate whenever it isn't the
    * oldest). `canon` is [[canonicalize]]'s (id, canonical_id, …) output;
    * `scored` carries (id, `scoreCol`). The representative is the
    * cluster's max-score row, ties broken by minimum id — computed as a
    * lexicographic struct-min hash aggregate, NOT a per-cluster window:
    * min(struct(-score, id)) partial-aggregates map-side, so a pathological
    * million-doc boilerplate cluster costs one combiner row per task
    * instead of a single-partition window sort.
    *
    * Output: one row per input id — (`idCol`, canonical_id, `scoreCol`,
    * rep_id, is_rep).
    */
  def selectRepresentatives(
      canon: DataFrame, scored: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val j = canon.select(col(idCol), col("canonical_id"))
      .join(scored.select(col(idCol), col(scoreCol)), Seq(idCol))
    val reps = j
      .groupBy("canonical_id")
      .agg(min(struct((-col(scoreCol)).as("ns"), col(idCol).as("id"))).as("m"))
      .select(col("canonical_id"), col("m.id").as("rep_id"))
    j.join(reps, Seq("canonical_id"))
      .withColumn("is_rep",
        when(col(idCol) === col("rep_id"), 1L).otherwise(0L))
      .select(col(idCol), col("canonical_id"), col(scoreCol),
        col("rep_id"), col("is_rep"))
  }

  /** Corpus snapshot diff — the CDC step a recrawl/refresh pipeline runs
    * between corpus versions: classify every id as added / removed /
    * changed / unchanged by content hash. Presence is tracked with marker
    * columns (not hash-null-ness) so a null payload cannot misclassify a
    * row. One md5 projection per side + one full-outer hash join on the
    * id — both sides shuffle-partition on the same key, linear at any
    * corpus size, no window.
    */
  def snapshotDiff(
      old: DataFrame, neu: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val o = old.select(col(idCol), md5(col(payloadCol)).as("_oh"),
      lit(1).as("_op"))
    val n = neu.select(col(idCol), md5(col(payloadCol)).as("_nh"),
      lit(1).as("_np"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_op").isNull, "added")
          .when(col("_np").isNull, "removed")
          .when(col("_oh") <=> col("_nh"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** 64-bit SimHash fingerprint per row, as a pure per-row expression:
    * per-bit majority vote over xxhash64 of distinct tokens. SQL-expr form
    * because `shiftleft` with a *column* shift amount has no Scala
    * functions-API binding. The whitespace regex is spelled
    * `concat(chr(92), 's+')` — byte-identical under BOTH parser modes
    * (spark.sql.parser.escapedStringLiterals flips how '\\s+' unescapes,
    * and the SQL entry sets that flag session-wide; a chr()-built literal
    * contains no backslash for either mode to disagree on, and constant-
    * folds before execution).
    */
  def simhash64(textColName: String): Column = expr(
    s"""aggregate(
       |  zip_with(
       |    transform(sequence(0, 63), j ->
       |      aggregate(
       |        transform(array_distinct(split($textColName, concat(chr(92), 's+'))), t -> xxhash64(t)),
       |        0, (acc, h) -> acc + CASE WHEN (h >> j) & 1L = 1L THEN 1 ELSE -1 END)),
       |    sequence(0, 63),
       |    (v, j) -> CASE WHEN v > 0 THEN shiftleft(1L, j) ELSE 0L END),
       |  0L, (acc, x) -> acc + x)""".stripMargin)

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs over ANY packed-bit fingerprint column (simhash,
    * image dHash halves, audio fingerprints): SimHash-style banded LSH.
    * The fingerprint is cut into `nBands` contiguous `bandBits`-bit
    * bands; two rows are candidates iff they agree EXACTLY on at least
    * one band (pigeonhole: any pair within Hamming distance < nBands is
    * guaranteed a shared band), then candidates are verified with
    * [[hammingDistance]] ≤ `maxHamming`. Returns (id_a, id_b, hamming),
    * id_a < id_b.
    *
    * Scale shape: one narrow nBands-wide explode, a shuffle on
    * (band, band_value) — the same linear-ish candidate generation as
    * the minhash band join — then distinct + a codegen'd bit_count
    * filter. `maxBucketSize` is the hot-bucket guard: a clique of f
    * identical fingerprints costs f² candidate rows, so buckets larger
    * than the cap are dropped from candidate generation entirely
    * (callers should collapse exact-fingerprint groups first — a hash
    * agg — when giant exact clusters are expected; the cap is the
    * boilerplate backstop, same contract as the minhash band cap).
    */
  def bandedHammingPairs(df: DataFrame, idCol: String, fpCol: String,
      nBands: Int = 4, bandBits: Int = 8, maxHamming: Int = 3,
      maxBucketSize: Long = Long.MaxValue): DataFrame = {
    require(nBands > 0 && bandBits > 0 && nBands * bandBits <= 64,
      s"invalid band layout: $nBands x $bandBits bits")
    val mask = (1L << bandBits) - 1
    val bandVals = array((0 until nBands).map(b =>
      shiftrightunsigned(col("fp"), b * bandBits).bitwiseAND(lit(mask))): _*)
    val banded0 = df
      .select(col(idCol).as("id"), col(fpCol).cast(LongType).as("fp"))
      .select(col("id"), col("fp"), posexplode(bandVals).as(Seq("band", "bv")))
    val banded =
      if (maxBucketSize == Long.MaxValue) banded0
      else {
        // over-cap (band, value) buckets via map-side-combinable groupBy
        // count + anti-join — same no-straggler shape as
        // [[minhashCandidates]]; never count().over(Window).
        val hot = banded0.groupBy("band", "bv").agg(count(lit(1)).as("_bs"))
          .filter(col("_bs") > maxBucketSize)
          .select("band", "bv")
        banded0.join(hot, Seq("band", "bv"), "left_anti")
      }
    val a = banded.select(col("id").as("id_a"), col("fp").as("fp_a"),
      col("band"), col("bv"))
    val b = banded.select(col("id").as("id_b"), col("fp").as("fp_b"),
      col("band").as("band_b"), col("bv").as("bv_b"))
    a.join(b, col("band") === col("band_b") && col("bv") === col("bv_b") &&
        col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fp_a", "fp_b")
      .distinct()
      .withColumn("hamming", hammingDistance(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast(LongType).as("hamming"))
  }

  /** Bulk SimHash over a corpus: identical fingerprints to [[simhash64]]
    * (same distinct-token hashing, same vote>0 bit rule — spec-asserted
    * equal), but computed as an exploded codegen pipeline: one token
    * explode, 64 conditional-sum partials in a single wide hash
    * aggregation, bits recombined with literal shifts. The per-row
    * [[simhash64]] expression walks interpreted array lambdas (64 × tokens
    * per row) — fine for a few rows, wrong for a corpus; this is the form
    * bulk pipelines should call.
    */
  def simhashFrame(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = df
      .select(col(idCol).as("id"),
        explode(array_distinct(split(col(textCol), "\\s+"))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val votes = (0 until 64).map(j =>
      sum(when(expr(s"(h >> $j) & 1L") === 1L, 1).otherwise(-1)).as(s"v$j"))
    val agg = h.groupBy("id").agg(votes.head, votes.tail: _*)
    val bits = (0 until 64).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L))
    // left join back to the input ids: explode() emits nothing for NULL
    // text, but a doc must never VANISH from the bulk output. The fill is
    // 0L because that is what the per-row twin computes for null text (its
    // CASE treats the all-null vote array as "no bit set") — twin parity
    // over every input is spec-asserted.
    df.select(col(idCol).as("id"))
      .join(agg.select(col("id"), bits.reduce(_ + _).as("simhash")), Seq("id"), "left")
      .select(col("id"), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** Corpus-level segment dedup (the CCNet/RefinedWeb "line dedup" pass,
    * generalized to fixed token windows for corpora without newline
    * structure): split each document into non-overlapping `width`-token
    * segments, drop every segment whose exact content appears in more than
    * `maxDocFreq` documents — except in the keeper document (lowest id),
    * which retains its copy — and reassemble the surviving segments in
    * order. Returns (`id`, `n_segments`, `n_kept`, `text_dedup`).
    *
    * Scale shape (the reason this isn't a groupBy over all segments +
    * rebuild): the doc-frequency aggregation keeps ONLY over-cap hashes,
    * so the correction join's build side is the duplicated-segment set —
    * typically a tiny fraction of the corpus (boilerplate), which AQE can
    * broadcast. Everything else is map-side: segmenting is
    * explode(sequence)+slice (no shuffle), and the rebuild groups by doc
    * id, the key the segment rows are already laid out by. A hot
    * boilerplate hash lands on one reducer in the agg but joins back as a
    * single build row — no pair blow-up. Segments are matched by md5, not
    * content, so the shuffle carries 32 hex chars instead of segment text.
    */
  def segmentDedup(
      df: DataFrame, idCol: String, textCol: String,
      width: Int = 16, maxDocFreq: Int = 1): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val base = df
      .select(col(idCol).as("id"), split(col(textCol), " ", -1).as("_toks"))
      .withColumn("_nseg", expr(s"(size(_toks) + ${width - 1}) div $width"))
    val segs = base
      .select(col("id"), col("_toks"),
        explode(sequence(lit(0), (col("_nseg") - 1).cast(IntegerType))).as("_i"))
      .select(col("id"), col("_i").cast(LongType).as("seg_no"),
        concat_ws(" ", slice(col("_toks"), col("_i") * width + 1, lit(width))).as("seg"))
      .withColumn("_h", md5(col("seg")))
    val overCap = segs
      .groupBy("_h")
      .agg(countDistinct(col("id")).as("_df"), min(col("id")).as("_keeper"))
      .filter(col("_df") > maxDocFreq)
      .select("_h", "_keeper")
    val kept = segs
      .join(overCap, Seq("_h"), "left")
      .filter(col("_keeper").isNull || col("id") === col("_keeper"))
    val rebuilt = kept
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("seg_no"), col("seg")))),
            p => p.getField("seg")), " ").as("text_dedup"))
    base.select(col("id"), col("_nseg").cast(LongType).as("n_segments"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** SymSpell-shaped fuzzy vocabulary pairs: all distinct word pairs at
    * edit distance ≤ 1, found via DELETION-NEIGHBORHOOD blocking instead
    * of an all-pairs scan. Every word emits itself plus its 1-character
    * deletions; two words are within one insert/delete/substitute iff
    * their neighborhoods intersect, so the candidate space is a hash join
    * on the variant key — |vocab|·(len+1) rows, never |vocab|² — with a
    * cheap `levenshtein` verify on candidates only. Skew note: a variant
    * shared by f words emits f² candidates; for natural-language vocab f
    * stays tiny (the worst key is the empty-string variant shared by all
    * 1-char words, f ≤ alphabet size), so no cap is needed — unlike LSH
    * buckets, this blocking key cannot aggregate unboundedly.
    */
  def editDistance1Pairs(words: DataFrame, wordCol: String): DataFrame = {
    val w = words.select(col(wordCol).as("w"))
      .filter(col("w") =!= "").distinct()
    // array_union dedups variants (deleting either duplicate letter of
    // "letter" yields the same string) — mirrors the oracle's DISTINCT
    val vars = w.select(col("w"), explode(array_union(
        array(col("w")),
        transform(sequence(lit(1), length(col("w"))),
          i => concat(
            col("w").substr(lit(1), i - 1),
            col("w").substr(i + 1, length(col("w")))))))
      .as("v"))
    // the vast majority of variants are unique to one word and can never
    // produce a pair — drop them BEFORE the self-join (the count window
    // shuffles by v, which the join then reuses), and persist the small
    // survivor set so the two join branches don't re-explode the vocab
    val shared = vars
      .withColumn("_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("v")))
      .filter(col("_n") > 1)
      .drop("_n")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = shared.select(col("w").as("w1"), col("v"))
      .join(shared.select(col("w").as("w2"), col("v")), Seq("v"))
      .filter(col("w1") < col("w2"))
      .select("w1", "w2").distinct()
      .filter(levenshtein(col("w1"), col("w2")) <= 1)
      .withColumn("dist", levenshtein(col("w1"), col("w2")).cast(LongType))
    // Eagerly materialize the (tiny: near-duplicate word pairs) result so
    // `shared` can be unpersisted before returning instead of leaking its
    // cached blocks for the session lifetime (round-5 ADVICE, closed r7).
    val sc = words.sparkSession.sparkContext
    val out = if (sc.getCheckpointDir.isDefined) pairs.checkpoint(true)
              else pairs.localCheckpoint(true)
    shared.unpersist(blocking = false)
    out
  }

  /** Exact-substring repetition detection (the Lee-et-al "dedup training
    * data" shape, window approximation): every `w`-token sliding window is
    * hashed; windows whose hash occurs more than once ANYWHERE in the
    * corpus mark their positions as repeated. Returns one row per doc:
    * (`idCol`, `n_windows`, `n_repeated`) — the repeated-window count is
    * the span a substring-deduper would cut. One shuffle total: windows
    * form inside each doc's token array (no token shuffle), then the
    * global window-hash frequency aggregate (map-side combined); the
    * join back is a semi-join reusing the hash shuffle. At 100 TB the frequency
    * table is the big frame — it is one 16-byte hash + count per DISTINCT
    * window, and windows repeat heavily (that is the point), so it is far
    * smaller than the corpus.
    */
  def repeatedWindows(
      df: DataFrame, idCol: String, textCol: String, w: Int = 8): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    val base = df.select(col(idCol),
      filter(split(col(textCol), " "), t => t =!= "").as("_toks"))
      .withColumn("_n", size(col("_toks")))
    // windows form per row via the codegen'd regex over the space-run-
    // collapsed text (trim + collapse = the empty-token filter, so the
    // captures are byte-identical to the old single-space window
    // concats); exactly the _n−w+1 full windows, no token shuffle
    val wins = df
      .select(col(idCol),
        explode(gramMatches(
          regexp_replace(trim(col(textCol)), " +", " "), w)).as("_wtxt"))
      .select(col(idCol), md5(col("_wtxt")).as("_h"))
    val rep = wins.groupBy("_h").agg(count(lit(1)).as("_c"))
      .filter(col("_c") > 1).select("_h")
    val counts = wins.join(rep, Seq("_h"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_repeated"))
    base.select(col(idCol),
        greatest(col("_n") - (w - 1), lit(0)).cast(LongType).as("n_windows"))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol), col("n_windows"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"))
  }

  /** The REMOVAL half of [[repeatedWindows]] (the Lee-et-al "deduplicating
    * training data" transform, not just the diagnostic): every token
    * covered by ANY corpus-wide repeated `w`-token window is cut, and the
    * survivors are re-joined single-spaced. One row per input doc:
    * (`idCol`, `n_tokens`, `n_removed`, `cleaned_md5`) — the md5 pins the
    * exact reconstructed text without shipping it.
    *
    * Tokenization and window hashing are IDENTICAL to [[repeatedWindows]]
    * (space split, empties dropped, positions over the filtered tokens),
    * so the pair composes: detect with one, cut with the other. Output
    * text is token-normalized (single-spaced) by construction — the
    * standard trade of token-level dedup.
    *
    * Scale shape: the cover set explodes exactly `w` rows per repeated
    * window START (linear, no quadratic blowup however hot the window),
    * distinct + anti-join both key on (doc, position). Docs shorter than
    * `w` tokens have no windows and pass through untouched.
    */
  def removeRepeatedWindows(
      df: DataFrame, idCol: String, textCol: String, w: Int = 8): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol),
      filter(split(col(textCol), " "), t => t =!= "").as("_toks"))
      .withColumn("_n", size(col("_toks")))
    val tok = base.select(col(idCol), posexplode(col("_toks")).as(Seq("_p", "_t")))
    // windows form per row via the codegen'd regex over the space-run-
    // collapsed text: the match ordinal IS the old window start position
    // _p over the filtered tokens (0-based), no lead-window token shuffle
    val wins = df
      .select(col(idCol),
        posexplode(gramMatches(
          regexp_replace(trim(col(textCol)), " +", " "), w))
          .as(Seq("_p", "_wtxt")))
      .select(col(idCol), col("_p"), md5(col("_wtxt")).as("_h"))
    val rep = wins.groupBy("_h").agg(count(lit(1)).as("_c"))
      .filter(col("_c") > 1).select("_h")
    val covered = wins.join(rep, Seq("_h"), "left_semi")
      .select(col(idCol).as("_cid"),
        explode(sequence(col("_p"), col("_p") + (w - 1))).as("_idx"))
      .distinct()
    val kept = tok.join(covered,
      col(idCol) === col("_cid") && col("_p") === col("_idx"), "left_anti")
    val agg = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("_nk"),
        array_sort(collect_list(struct(col("_p"), col("_t")))).as("_ps"))
      .select(col(idCol), col("_nk"),
        md5(concat_ws(" ",
          transform(col("_ps"), x => x.getField("_t")))).as("cleaned_md5"))
    base.select(col(idCol), col("_n").cast(LongType).as("n_tokens"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("_nk"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned_md5"), md5(lit(""))).as("cleaned_md5"))
  }

  /** Containment pairs — one-sided Jaccard: shared / min(|A|, |B|) over
    * distinct shingle sets. Near-1 containment with LOW symmetric Jaccard
    * is the wrapper case (one doc embeds another plus boilerplate), which
    * symmetric near-dup misses entirely. Same plan shape and skew guard
    * as [[ngramJaccardPairs]]: shingle self-join keyed on the shingle,
    * document-frequency cap pruning non-discriminative hot shingles.
    */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      shingleSize: Int = 3, maxDocFreq: Int = 64): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, shingleSize).distinct()
    // Hot-shingle cap via map-side-combinable groupBy + anti-join against
    // the (tiny, AQE-broadcastable) hot set — the ngramJaccardPairs shape
    // — not count().over(Window.partitionBy(sh)), which re-shuffled and
    // SORTED every shingle row and dragged each hot shingle into one task
    // just to drop it.
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDocFreq)
      .select("sh")
    val capped = sh.join(hot, Seq("sh"), "left_anti")
    val sizes = capped.groupBy("id").agg(count(lit(1)).as("n"))
    val a = capped.select(col("id").as("id_a"), col("sh"))
    val b = capped.select(col("id").as("id_b"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("containment",
        col("shared").cast(DoubleType) / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }

  /** Cross-document variable-length substring dedup at suffix
    * granularity — the ExactSubstr family (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): find
    * every token span of length ≥ k that appears verbatim in MORE THAN
    * ONE document and excise it from all of them. q92/q106 remove
    * fixed-width repeats WITHIN a doc and q144 excises a known
    * benchmark's grams; this is the corpus-vs-itself form — the
    * duplicated-gram set is discovered from the corpus, not given.
    *
    * Distributed shape (the suffix-array algorithm is single-machine;
    * the k-gram union form is its exact distributed equivalent for
    * excision): a position t is inside a cross-doc duplicated span of
    * length ≥ k IFF some k-token window covering t occurs in ≥ 2
    * distinct documents. Proof sketch: any duplicated span of length
    * L ≥ k covers each of its positions with one of its own k-windows,
    * each of which is itself a duplicated span; conversely a duplicated
    * k-window IS a duplicated span ≥ k. So the union of duplicated
    * k-gram windows, merged into maximal runs (gaps-and-islands), is
    * exactly the variable-length excision set — runs LONGER than k
    * emerge naturally as consecutive duplicated windows chain.
    *
    *  1. per-doc gram pass: grams form inside the token array and
    *     explode — zero shuffles; grams carry a 128-bit md5 fingerprint
    *     so the corpus shuffle moves 32 hex chars, not k words;
    *  2. duplicated grams: groupBy(fingerprint) with min(id) ≠ max(id)
    *     — two map-side-combined aggregates, NEVER a count-distinct
    *     (its dedup shuffle would move the whole gram table again);
    *  3. hits: one left_semi of the gram table against the (small)
    *     duplicated set, then a bounded k× covered-position explode;
    *  4. islands: one lag() window over covered positions only —
    *     per-doc partitions sized by contamination, not corpus.
    *
    * Removal is ALL copies (the published ExactSubstr convention — no
    * canonical survivor, since partially-overlapping spans have no
    * consistent "first" copy); a keep-one policy is a downstream join
    * against [[selectRepresentatives]]-style cluster roots if wanted.
    * Output per input doc (zeros preserved): (id, n_tokens, n_removed,
    * n_spans, n_kept).
    */
  def crossDocSpanDedup(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "span threshold k must be at least 2")
    // k-grams form per row via the codegen'd regex (match ordinal = gram
    // start position, no lead-window token shuffle); md5 on the exploded
    // rows
    val grams = docs
      .select(col(idCol).as("id"),
        posexplode(gramMatches(col(textCol), k)).as(Seq("i", "_g")))
      .select(col("id"), col("i"), md5(col("_g")).as("gh"))
    val dup = grams.groupBy("gh")
      .agg(min("id").as("_mn"), max("id").as("_mx"))
      .filter(col("_mn") =!= col("_mx"))
      .select("gh")
    val covered = grams.join(dup, Seq("gh"), "left_semi")
      .select(col("id"),
        explode(sequence(col("i"), col("i") + (k - 1))).as("t"))
      .distinct()
    val spans = covered
      .withColumn("pt",
        lag("t", 1).over(Window.partitionBy("id").orderBy("t")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_removed"),
        sum(when(col("pt").isNull || col("pt") =!= col("t") - 1, 1L)
          .otherwise(0L)).as("n_spans"))
    // per-doc token counts from the array size (one row per doc crosses
    // the shuffle, not one per token); NULL text contributed no exploded
    // tokens before, so it stays excluded (isNotNull guard)
    docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("_s"))
      .filter(col("_s").isNotNull)
      .groupBy("id").agg(sum(size(col("_s"))).as("n_tokens"))
      .join(spans, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (col("n_tokens") - coalesce(col("n_removed"), lit(0L)))
          .as("n_kept"))
  }
}
