package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text featurization (north-star): hashing-trick term frequency and
  * TF-IDF — the bridge from the `documents` table to the vector ops in
  * [[Similarity]] (a corpus with no precomputed embeddings still gets
  * dedup/ANN via these).
  *
  * Representation: SPARSE AS ROWS — (id, bucket, weight) — not a dense
  * array column. At 100 TB the exploded form is the scalable one: it
  * shuffles only non-zeros, aggregates with plain hash aggregation,
  * cosine against it is a (bucket)-keyed join + sum of products, and
  * every step stays in whole-stage codegen (no array lambdas — see
  * BASELINE.md round-1 notes on interpreted HOFs).
  *
  * Bucket hashing is md5-based (first 8 hex chars → int64 → mod), NOT
  * xxhash/murmur: portable, so the DuckDB oracle replays the identical
  * assignment (q60).
  */
object Featurize {

  /** Portable term→bucket hash in [0, numFeatures). */
  def termBucket(term: org.apache.spark.sql.Column, numFeatures: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(term), 1, 8), 16, 10).cast(LongType), lit(numFeatures.toLong))

  /** Host pattern: optional scheme and userinfo stripped, port/path/
    * query/fragment cut. Public so the DuckDB oracle (q111) interpolates
    * the IDENTICAL pattern — RE2 and Java regex agree on this
    * alternation-free prefix match.
    */
  val hostPattern: String =
    "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)"

  /** Representative two-level public suffixes. Real curation pipelines
    * ship the full Mozilla public-suffix list; the simplification keeps
    * the rule oracle-replayable (one regex alternation, no lookup table)
    * while still collapsing `www.x.co.uk` and `blog.x.co.uk` to the
    * registrable `x.co.uk` — the property per-domain curation needs.
    */
  private val twoLevelSuffixes = Seq(
    "co.uk", "ac.uk", "org.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "co.in", "co.nz",
    "co.za")

  /** Registrable-domain pattern over a lowercased host: the last two
    * host labels, or three when the last two are a known two-level
    * suffix. At the winning match position only one alternative can
    * succeed, so Java (leftmost-first) and RE2 (DuckDB) agree. Public
    * for the same oracle-sharing reason as [[hostPattern]].
    */
  val domainPattern: String = {
    val alts = twoLevelSuffixes.map(_.replace(".", "\\.")).mkString("|")
    s"([^.]+\\.(?:$alts)$$|[^.]+\\.[^.]+$$)"
  }

  /** Lowercased host of a URL ([[hostPattern]]). Pure regexp —
    * codegen'd, no UDF. */
  def hostOf(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(regexp_extract(url, hostPattern, 1))

  /** Registrable domain of a URL ([[hostOf]] + [[domainPattern]]).
    * Single-label hosts (`localhost`) fall back to the host itself:
    * both engines return '' on no match, bridged by the same
    * nullif/coalesce fallback.
    */
  def domainOf(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val host = hostOf(url)
    val reg = regexp_extract(host, domainPattern, 1)
    coalesce(nullif(reg, lit("")), host)
  }

  /** Canonical page identity of a URL — the key web-corpus dedup uses
    * before any content hashing (crawls see the same page under scheme,
    * case, `www.`, default-port, tracking-param, fragment, and
    * trailing-slash variants). Rules, in order: drop the scheme and
    * userinfo; lowercase the host and strip a leading `www.`; drop the
    * fragment; strip an explicit default port (`:80`/`:443` — any other
    * port is a different origin and is kept); strip one trailing slash
    * from the path; drop `utm_*` query params (prefix-exact via
    * substr — LIKE's `_` wildcard would over-match) keeping the rest.
    *
    * Pure regexp/array-expression chain — no UDF — with every pattern
    * lookahead-free so Java and RE2 (DuckDB, q117's oracle) agree.
    */
  def canonicalizeUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val host = regexp_replace(hostOf(url), "^www\\.", "")
    val rest = regexp_extract(url,
      "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@?#]*@)?[^/:?#]+(.*)$", 1)
    val noFrag = regexp_replace(rest, "#.*$", "")
    val noPort = regexp_replace(noFrag, "^:(?:80|443)(/|\\?|$)", "$1")
    val query = regexp_extract(noPort, "\\?(.*)$", 1)
    val path = regexp_replace(regexp_replace(noPort, "\\?.*$", ""), "/$", "")
    val keptQ = array_join(
      filter(split(query, "&"), p => substring(p, 1, 4) =!= "utm_"), "&")
    concat(host, path,
      when(keptQ === "", lit("")).otherwise(concat(lit("?"), keptQ)))
  }

  /** Hashing-trick TF: one row per (doc, bucket) with the term count.
    * Tokenization is whitespace split with empties dropped.
    */
  def hashingTf(df: DataFrame, idCol: String, textCol: String,
      numFeatures: Int = 1024): DataFrame =
    df.select(col(idCol).as("id"), explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .select(col("id"), termBucket(col("w"), numFeatures).as("bucket"))
      .groupBy("id", "bucket")
      .agg(count(lit(1)).as("tf"))

  /** fastText-shaped linear quality classifier over hashed unigrams:
    * `score(doc) = Σ_tokens w(token)` where the per-token weight is a
    * deterministic md5-derived integer in [−8, 8) — the inference shape
    * of the model-based quality filters (CCNet/GPT-3-style fastText
    * gates) with the trained weight table replaced by a portable hash so
    * the whole pass is engine-exact and value-oracled. Swapping in real
    * trained weights is a broadcast join against a (numFeatures)-row
    * weight table with IDENTICAL plan shape — the hash IS the lookup.
    *
    * Scale: explode + one map-side-combinable hash agg per doc; the
    * weight is a pure codegen'd expression chain (md5 → conv → mod), no
    * UDF, no join, no window. `keep = score > 0`.
    */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
      salt: String = "qw"): DataFrame = {
    val w = conv(substring(md5(concat(lit(salt), col("w"))), 1, 4), 16, 10)
      .cast(LongType) % 16L - 8L
    df.select(col(idCol).as("id"),
        explode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("w"))
      .select(col("id"), w.as("wt"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("wt").as("score"))
      .withColumn("keep", (col("score") > 0L).cast(LongType))
  }

  /** Corpus TF-IDF over the [[hashingTf]] rows: weight = tf · idf with the
    * standard smoothed idf = ln((N+1)/(df+1)) + 1. The document-frequency
    * side is one extra aggregation + a broadcast-sized (numFeatures-row)
    * join — corpus-scale cost is the same single shuffle hashingTf already
    * pays.
    */
  def tfIdf(tf: DataFrame, nDocs: Long): DataFrame = {
    val df = tf.groupBy("bucket").agg(countDistinct("id").as("df"))
    tf.join(broadcast(df), Seq("bucket"))
      .withColumn("idf",
        log((lit(nDocs.toDouble) + 1.0) / (col("df").cast(DoubleType) + 1.0)) + 1.0)
      .select(col("id"), col("bucket"), col("tf"),
        (col("tf").cast(DoubleType) * col("idf")).as("tfidf"))
  }

  /** DSIR-shaped importance weighting (the "data selection via importance
    * resampling" recipe: score every raw document by how much more likely
    * its hashed bag-of-words features are under a generative model of a
    * small CURATED corpus than under the raw-corpus model, then keep the
    * target-like tail). Both models are Laplace-smoothed bucket unigram
    * distributions over [[hashingTf]] features — two corpus-level hash
    * aggs + one broadcast of the numFeatures-row ratio table, so the
    * whole scorer is one pass over the raw corpus at any scale.
    *
    * Parity per the q60 convention (see this file's header): the score is
    * kept in RATIONAL ppm space — per-bucket ratio
    * r_ppm = ⌊10⁶·p_target/p_raw⌋ via pure BIGINT division, per-doc score
    * = Σ tf·r_ppm — because libm `ln` is not correctly-rounded across
    * engines; the log-likelihood ratio ordering is monotone per bucket in
    * this ratio, and everything that can drift (tokenization, bucketing,
    * counts, smoothing) is pinned exactly. `keep` = score above the
    * neutral line 10⁶·n_tokens, i.e. the doc's mean feature ratio favors
    * the target model. The two corpus token totals are driver-side
    * scalars (collect of an AGGREGATE, the q84 pattern — never data).
    * The BIGINT ratio is exact while 10⁶·n_target·n_raw < 2⁶³, i.e.
    * through ~10⁶-token models per side — the MODEL-size bound, not a
    * corpus bound (DSIR's target is small by definition, and the raw
    * model can be built from a fixed-size hash-sample of the corpus);
    * past it, switch the ratio column to the standard log-space double.
    */
  def importanceDigest(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, numFeatures: Int = 1024): DataFrame = {
    val tfR = hashingTf(raw, idCol, textCol, numFeatures)
    val tfT = hashingTf(target, idCol, textCol, numFeatures)
    val nR = tfR.agg(sum("tf")).head.getLong(0)
    val nT = tfT.agg(sum("tf")).head.getLong(0)
    val cR = tfR.groupBy("bucket").agg(sum("tf").as("cr"))
    val cT = tfT.groupBy("bucket").agg(sum("tf").as("ct"))
    // raw-side buckets only: a doc's buckets are raw-corpus buckets by
    // construction; smoothing (+1 over numFeatures extra mass) covers
    // buckets the target corpus never saw
    val ratio = cR.join(cT, Seq("bucket"), "left")
      .select(col("bucket"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
      .withColumn("r_ppm", expr(
        s"(1000000 * (ct + 1) * ${nR + numFeatures}L) div ((cr + 1) * ${nT + numFeatures}L)"))
      .select("bucket", "r_ppm")
    tfR.join(broadcast(ratio), Seq("bucket"))
      .groupBy("id")
      .agg(
        sum("tf").cast(LongType).as("n_tokens"),
        sum(col("tf") * col("r_ppm")).cast(LongType).as("score_ppm"))
      .select(col("id"), col("n_tokens"), col("score_ppm"),
        when(col("score_ppm") > col("n_tokens") * 1000000L, 1L)
          .otherwise(0L).as("keep"))
  }

  /** Sparse cosine top-k over (id, bucket, weight) rows: bucket-keyed join
    * of query rows against corpus rows, sum of products, normalize by the
    * precomputed L2 norms. Only co-occurring buckets join — the sparse
    * analog of [[Similarity.bruteForceTopK]], linear in shared non-zeros.
    * `weightCol` names the weight column, so the family composes directly:
    * `sparseCosineTopK(tfIdf(tf, n), tfIdf(tf, n), k, weightCol = "tfidf")`
    * or `weightCol = "tf"` over raw [[hashingTf]] output.
    *
    * `maxBucketDf` is the inverted-index skew guard: a feature present in
    * f corpus docs joins every query row carrying it against all f — a
    * stopword-class bucket makes the join quadratic for all-pairs use.
    * Buckets whose corpus document frequency exceeds the cap are dropped
    * from BOTH sides and from the norms, so the capped result is exact
    * cosine over the capped feature subspace (ubiquitous features carry
    * ~zero idf weight anyway — this is why tf-idf pipelines can cap
    * aggressively). Default leaves behavior exact/uncapped.
    */
  def sparseCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      weightCol: String = "w", maxBucketDf: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cIn, qIn) =
      if (maxBucketDf == Int.MaxValue) (corpus, queries)
      else {
        // the hot set is tiny (ubiquitous features) -> broadcast anti-join
        val hot = broadcast(corpus.groupBy("bucket")
          .agg(count_distinct(col("id")).as("_df"))
          .filter(col("_df") > maxBucketDf)
          .select("bucket"))
        (corpus.join(hot, Seq("bucket"), "left_anti"),
          queries.join(hot, Seq("bucket"), "left_anti"))
      }
    def norms(v: DataFrame) = v.groupBy("id")
      .agg(sqrt(sum(col(weightCol) * col(weightCol))).as("nrm"))
    val c = cIn.select(col("id").as("c_id"), col("bucket"), col(weightCol).as("c_w"))
    val q = qIn.select(col("id").as("q_id"), col("bucket"), col(weightCol).as("q_w"))
    val dots = q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id")
      .agg(sum(col("q_w") * col("c_w")).as("dot"))
    val scored = dots
      .join(norms(qIn).select(col("id").as("q_id"), col("nrm").as("q_n")), Seq("q_id"))
      .join(norms(cIn).select(col("id").as("c_id"), col("nrm").as("c_n")), Seq("c_id"))
      .select(col("q_id"), col("c_id"),
        (col("dot") / (col("q_n") * col("c_n"))).as("cosine"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id"))))
      .filter(col("rnk") <= k)
  }

  /** IN-ENGINE training of the linear quality classifier whose inference
    * shape is [[hashedLinearScore]] / q139 — batch perceptron over hashed
    * unigram counts, ENTIRELY in exact integer arithmetic so every weight
    * is oracle-replayable with zero tolerance (no learning-rate doubles:
    * η = 1). Features: `bucket = termBucket(word, numFeatures)` counts,
    * plus a constant bias feature at bucket −1. Labels are self-supervised
    * from a held-out rule (y = +1 iff the doc has ≥ `minTokens` tokens) —
    * the standard bootstrap where a cheap heuristic labels data for a
    * model that generalizes it (fastText-quality-classifier recipe).
    *
    * Per epoch: margin_d = Σ_b c_db·w_b (one hash agg over the cached
    * feature frame, weights injected as a LITERAL map — pure codegen, no
    * join, the MLlib broadcast-the-model iteration pattern), misclassified
    * = y·margin ≤ 0 (epoch 1: w = 0 ⇒ all rows, the standard bootstrap),
    * gradient = Σ_misclassified y·c_db per bucket (one semi-join + hash
    * agg), then the 65-row model is collected to the driver — model
    * maintenance, not data movement: the collect is O(numFeatures)
    * regardless of corpus size. Feature frame is built once and persisted;
    * epochs don't re-scan the corpus. Returns (bucket, weight) for bucket
    * ∈ [−1, numFeatures), −1 = bias.
    */
  def perceptronTrain(df: DataFrame, idCol: String, textCol: String,
      numFeatures: Int = 64, epochs: Int = 3, minTokens: Long = 56): DataFrame = {
    val spark = df.sparkSession
    val tokFeats = df.select(col(idCol).as("id"),
        explode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("w"))
      .select(col("id"), termBucket(col("w"), numFeatures).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("cnt"))
    val labels = tokFeats.groupBy("id").agg(sum("cnt").as("n_tokens"))
      .select(col("id"),
        when(col("n_tokens") >= minTokens, 1L).otherwise(-1L).as("y"))
    // persisted pre-partitioned on id: every epoch's margin agg
    // (groupBy id — a subset-key distribution, no exchange) and the
    // base side of the misclassified semi-join reuse this partitioning,
    // so an epoch shuffles only the doc-id set and the 65-row gradient
    val base = tokFeats
      .unionByName(labels.select(col("id"), lit(-1L).as("bucket"),
        lit(1L).as("cnt")))
      .join(labels, Seq("id"))
      .repartition(col("id"))
      .persist()
    var weights = Map.empty[Long, Long]
    try {
      for (_ <- 1 to epochs) {
        val wCol =
          if (weights.isEmpty) lit(0L)
          else coalesce(element_at(typedlit(weights), col("bucket")), lit(0L))
        val miscl = base.groupBy("id", "y")
          .agg(sum(col("cnt") * wCol).as("margin"))
          .filter(col("y") * col("margin") <= 0L)
          .select("id")
        val grads = base.join(miscl, Seq("id"), "left_semi")
          .groupBy("bucket").agg(sum(col("y") * col("cnt")).as("g"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        weights = grads.foldLeft(weights) { case (m, (b, g)) =>
          m.updated(b, m.getOrElse(b, 0L) + g)
        }
      }
    } finally base.unpersist()
    import spark.implicits._
    (-1L until numFeatures.toLong)
      .map(b => (b, weights.getOrElse(b, 0L)))
      .toDF("bucket", "weight")
  }
}
