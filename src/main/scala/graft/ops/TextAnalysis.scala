package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reusable text-analysis column functions (north-star text ops). All are
  * built-in expression compositions — codegen-friendly, no UDFs, usable in
  * any pipeline position (including pushdown-friendly filters).
  */
object TextAnalysis {

  /** Whitespace-delimited token count. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast(LongType)

  /** GPT-2-style pre-tokenizer pattern, simplified and LOOKAHEAD-FREE so
    * the DuckDB oracle (q112) replays it verbatim: RE2 has no lookahead,
    * and both engines use leftmost-first ordered alternation, so the
    * shared pattern tokenizes identically. Divergence from the original
    * GPT-2 pattern (whose tail is `\s+(?!\S)`): an interior run of 2+
    * spaces becomes ONE whitespace token and the following word token
    * loses its leading space — the token COUNT is identical everywhere,
    * only boundary strings at multi-space runs differ. Public so the
    * oracle interpolates the identical pattern.
    */
  val bpeishPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish subword regex tokenizer ([[bpeishPattern]]): word fragments,
    * numbers, punctuation runs — the usual pre-tokenizer for LLM token
    * estimation.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeishPattern), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text)).cast(LongType)

  /** Stopword-count-based language guess (en/de/es/fr heuristic). */
  def languageGuess(text: Column): Column = {
    def cnt(pat: String) = size(regexp_extract_all(text, lit(pat), lit(0)))
    val (en, de, es, fr) =
      (cnt("\\b(the|and|of)\\b"), cnt("\\b(der|und|das)\\b"),
        cnt("\\b(el|la|los)\\b"), cnt("\\b(le|et|les)\\b"))
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** 0–3 quality score: length window, stopword presence, punct ratio. */
  def qualityScore(text: Column): Column = {
    val nTokens = tokenCount(text)
    val nPunct = size(regexp_extract_all(text, lit("[.,!?]"), lit(0))).cast(LongType)
    (when(length(text).between(50, 10000), 1).otherwise(0)
      + when(text.like("% the %"), 1).otherwise(0)
      + when(nPunct * 10 <= nTokens, 1).otherwise(0)).cast(LongType)
  }

  /** Rolling-hash document fingerprint: min xxhash64 over sliding char
    * n-grams (winnowing-style), as a pure array expression. The array
    * lambda is INTERPRETED — fine inline over a few rows; bulk corpora
    * should use [[fingerprintFrame]] (same values, codegen'd).
    */
  def fingerprint(text: Column, n: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      j => xxhash64(text.substr(j, lit(n)))))

  /** The counting step of BPE vocabulary induction (Sennrich et al.
    * 2016): frequency-weighted adjacent symbol-pair counts, ranked. The
    * corpus is touched ONCE (the word-frequency hash aggregate, map-side
    * combined); the pair stage then runs over the DISTINCT-WORD table —
    * vocabulary-sized, not corpus-sized — which is what makes tokenizer
    * training feasible at 100 TB: a trillion tokens collapse to a few
    * million (word, freq) rows before any per-character work happens.
    * Symbols here are characters (merge iteration 0); iterating merges
    * would re-run this over a re-segmented vocab table.
    */
  def bpePairCounts(df: org.apache.spark.sql.DataFrame, textCol: String,
      topK: Int = 20): org.apache.spark.sql.DataFrame = {
    val wf = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    wf
      .select(col("f"),
        // sequence(1, 0) would count down; single-char words have no pairs
        explode(when(length(col("w")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2))))).as("pair"))
      .groupBy("pair").agg(sum("f").cast(LongType).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)
  }

  /** FULL BPE vocabulary induction (Sennrich et al. 2016 algorithm 1):
    * iterate select-top-pair → merge → recount for `nMerges` rounds and
    * return one row per round — the merge rule (a, b), its
    * frequency-weighted count, and the post-merge vocab state
    * (`n_symbols` = distinct symbols, `n_tokens` = Σ f·|syms|). This is
    * the trainer that [[bpePairCounts]] is the first step of.
    *
    * Merge semantics are the textbook greedy left-to-right single pass:
    * in a run of equal symbols `[a,a,a]` merging (a,a) yields `[aa,a]`,
    * and a symbol produced by this round's merge never re-merges in the
    * same round. The engine implements it as a row-local array fold
    * (`aggregate` with an append-or-replace-last step); the DuckDB
    * oracle replays the identical fold via `list_reduce` — both are
    * exactly the greedy pass, so counts match bit-for-bit.
    *
    * Scale shape: the corpus is touched ONCE (word-frequency hash
    * aggregate); every round after that runs over the DISTINCT-WORD
    * table — vocabulary-sized, not corpus-sized. Each round is 3 jobs
    * on that small frame: a pair-count topK (map-side combined, pair
    * space is vocab-alphabet-sized), the merge fold + localCheckpoint
    * (keeps the re-segmentation lineage O(1) across rounds — the
    * [[Graph.iterate]] cadence lesson), and one stats aggregate. The
    * top pair itself is a 1-row driver fetch per round — inherent to
    * the algorithm (the next round's fold is BUILT from it) and
    * vocab-bounded, the same driver-scalar class as a convergence
    * check. At 100 TB the trillion-token corpus collapses to a few
    * million (word, f) rows before any per-round work happens.
    */
  def bpeTrain(df: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int): org.apache.spark.sql.DataFrame = {
    val (stats, words) = bpeTrainCore(df, textCol, nMerges)
    words.unpersist(blocking = false)
    statsFrame(df.sparkSession, stats)
  }

  private[ops] def statsFrame(spark: org.apache.spark.sql.SparkSession,
      stats: Seq[(Long, String, String, Long, Long, Long)])
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    stats.toDF(
      "merge_round", "a", "b", "pair_cnt", "n_symbols", "n_tokens")
  }

  /** Shared trainer loop behind [[bpeTrain]] (per-round stats) and
    * [[bpeEncode]] (the final segmentation): returns the merge-round
    * stat tuples AND the re-segmented distinct-word frame
    * `(w, f, syms)` after the last merge — localCheckpoint'ed; the
    * caller owns the unpersist (or shares it via
    * [[CorpusBuilds.documentsBpe]], which is how q128 and q132 split
    * one training run).
    */
  private[ops] def bpeTrainCore(df: org.apache.spark.sql.DataFrame,
      textCol: String, nMerges: Int)
      : (Seq[(Long, String, String, Long, Long, Long)],
         org.apache.spark.sql.DataFrame) = {
    val words0 = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(col("w"), col("f"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"))
      .localCheckpoint()
    var words = words0
    var prev = words0
    val stats = Seq.newBuilder[(Long, String, String, Long, Long, Long)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      r += 1
      val top = words
        .select(col("f"),
          explode(when(size(col("syms")) < 2,
            array().cast("array<struct<a:string,b:string>>"))
            .otherwise(expr(
              "transform(sequence(1, size(syms) - 1), i -> " +
                "named_struct('a', element_at(syms, i), " +
                "'b', element_at(syms, i + 1)))"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("f").cast(LongType).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .take(1)
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        words = words.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"), (acc, x) => {
            // get() is 0-based and null-safe: on an empty accumulator the
            // comparison is NULL -> falls to the append branch
            val last = get(acc, size(acc) - 1)
            when(last === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(last, x))))
              .otherwise(concat(acc, array(x)))
          })).localCheckpoint()
        prev.unpersist(blocking = false)
        prev = words
        val st = words.select(col("f"), explode(col("syms")).as("sym"))
          .agg(sum("f").cast(LongType).as("n_tokens"),
            countDistinct("sym").cast(LongType).as("n_symbols"))
          .head()
        stats += ((r.toLong, a, b, cnt, st.getLong(1), st.getLong(0)))
      }
    }
    (stats.result(), words)
  }

  /** BPE ENCODE — the apply side of the tokenizer story: train `nMerges`
    * rules ([[bpeTrainCore]]), then tokenize the corpus WITH the trained
    * vocab and report per-document `n_words`, `n_chars`, and
    * `n_bpe_tokens` (= Σ per-word segment count) — the token accounting
    * every training-data budget runs with its real tokenizer rather than
    * a whitespace proxy.
    *
    * Scale shape: segmentation happens ONCE PER DISTINCT WORD (the
    * trainer's final vocab frame carries it already — zero extra merge
    * work); the corpus pass is tokenize → hash-join words to their
    * segment counts (vocab side is broadcast-able at any realistic vocab
    * size) → one map-side-combined per-doc aggregate. A naive per-row
    * re-application of the merge chain would run 6 interpreted folds per
    * corpus WORD; this runs them per distinct word, then joins.
    */
  def bpeEncode(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, nMerges: Int): org.apache.spark.sql.DataFrame = {
    val (_, words) = bpeTrainCore(df, textCol, nMerges)
    // materialize the tiny (w, segment-count) frame so the full syms
    // arrays can be dropped before the returned (lazy) plan runs
    val seg = words
      .select(col("w"), size(col("syms")).cast(LongType).as("_nseg"))
      .localCheckpoint(true)
    words.unpersist(blocking = false)
    bpeEncodeWith(df, idCol, textCol, seg)
  }

  /** [[bpeEncode]] against an already-trained `(w, _nseg)` segmentation
    * frame — the production split (train once, encode everywhere; see
    * [[CorpusBuilds.documentsBpe]]).
    */
  def bpeEncodeWith(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, seg: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(seg, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("n_words"),
        sum(length(col("w"))).cast(LongType).as("n_chars"),
        sum(col("_nseg")).cast(LongType).as("n_bpe_tokens"))

  /** Gopher-style quality rule gate (Rae et al. 2021 §A1.1 heuristics,
    * adapted to the whitespace tokenizer): per-document rule flags plus
    * the combined keep decision. Unlike q56's signal computation (which
    * aggregates bigrams across a shuffle), the ENTIRE gate is one
    * per-row pass — the top-bigram count comes from `array_sort` + a
    * max-run `aggregate` over the in-row bigram array, so a 100 TB
    * corpus filters with zero data movement (the higher-order lambdas
    * are interpreted, not codegen'd, but stay row-local).
    *
    * Every rule threshold is an integer cross-multiplication (e.g. mean
    * word length in [3,10] as `3·n ≤ chars ≤ 10·n`), so the DuckDB
    * oracle (q115) agrees bit-exactly with no float quantization at all.
    *
    * Rules: word count in [50, 100000]; mean word length in [3, 10];
    * ≥80% words contain a letter; ≥2 stopword hits (the/and/of/to/in);
    * top bigram ≤20% of bigrams (repetition).
    */
  def gopherRules(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val base = df
      .select(col(idCol), split(col(textCol), " ").as("_ws"))
      .select(
        col(idCol),
        size(col("_ws")).cast(LongType).as("n_words"),
        expr("aggregate(_ws, 0L, (a, x) -> a + length(x))").as("char_sum"),
        size(filter(col("_ws"), w => w.rlike("\\p{L}")))
          .cast(LongType).as("n_alpha"),
        size(filter(col("_ws"), w => w.isin("the", "and", "of", "to", "in")))
          .cast(LongType).as("n_stop"),
        // sequence(1, 0) would count DOWN in Spark; guard short docs.
        when(size(col("_ws")) < 2, array().cast("array<string>"))
          .otherwise(expr(
            "transform(sequence(1, size(_ws) - 1), " +
              "i -> concat(element_at(_ws, i), ' ', element_at(_ws, i + 1)))"))
          .as("_bg"))
      .withColumn("n_bigrams", size(col("_bg")).cast(LongType))
      .withColumn("top_bigram_cnt", expr(
        """aggregate(array_sort(_bg),
          |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
          |  (s, x) -> named_struct(
          |    'prev', x,
          |    'run', CASE WHEN s.prev IS NOT NULL AND x = s.prev
          |            THEN s.run + 1 ELSE 1L END,
          |    'best', GREATEST(s.best,
          |      CASE WHEN s.prev IS NOT NULL AND x = s.prev
          |       THEN s.run + 1 ELSE 1L END)),
          |  s -> s.best)""".stripMargin))
    def flag(c: Column) = when(c, 1L).otherwise(0L)
    val rWords = base("n_words").between(50L, 100000L)
    val rMean = lit(3L) * base("n_words") <= base("char_sum") &&
      base("char_sum") <= lit(10L) * base("n_words")
    val rAlpha = lit(5L) * base("n_alpha") >= lit(4L) * base("n_words")
    val rStop = base("n_stop") >= 2L
    val rRep = base("n_bigrams") === 0L ||
      lit(5L) * base("top_bigram_cnt") <= base("n_bigrams")
    base.select(
      col(idCol), col("n_words"), col("char_sum"), col("n_alpha"),
      col("n_stop"), col("top_bigram_cnt"), col("n_bigrams"),
      flag(rWords).as("r_words"), flag(rMean).as("r_mean_len"),
      flag(rAlpha).as("r_alpha"), flag(rStop).as("r_stop"),
      flag(rRep).as("r_rep"),
      flag(rWords && rMean && rAlpha && rStop && rRep).as("keep"))
  }

  /** Bulk form of [[fingerprint]]: explode the sliding positions, hash,
    * min-aggregate per doc — every step whole-stage-codegen'd, map-side
    * combined, and identical values to the column form (spec-asserted).
    */
  def fingerprintFrame(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 8): org.apache.spark.sql.DataFrame = {
    val agg = df.select(col(idCol).as("id"),
        explode(sequence(lit(1), greatest(length(col(textCol)) - (n - 1), lit(1)))).as("j"),
        col(textCol).as("_t"))
      .select(col("id"), xxhash64(col("_t").substr(col("j"), lit(n))).as("h"))
      .groupBy("id")
      .agg(min("h").as("fingerprint"))
    // Join back to the input ids so no doc can ever vanish from the bulk
    // output. (Unlike simhashFrame, null text does NOT currently drop
    // here: greatest(null, 1) keeps one sliding position whose null
    // substring hashes to the xxhash64 seed — in BOTH forms, so they
    // agree; the join is structural insurance should that expression
    // change.)
    df.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
  }

  /** Pointwise mutual information over ADJACENT word pairs — the word
    * association / collocation miner ("new york", "machine learning")
    * corpus analyses run. Marginals are bigram-table marginals (left
    * occurrences of a, right occurrences of b), so
    * PMI(a,b) = P(a,b)/(P(a)·P(b)) = N·c(a,b)/(c_l(a)·c_r(b)), reported
    * as the exact floor-ppm RATIO (10⁶·N·c_ab div (c_a·c_b)) rather than
    * its log — log is double-luck across engines, the ratio is integer.
    * The 10⁶·N·c product runs in DECIMAL(38,0): at 100 TB N ~ 10¹³ and a
    * hot pair ~ 10¹⁰ would overflow any BIGINT product.
    *
    * Scale shape: one token explode, one per-DOC lead window (bounded by
    * document length), three map-side-combined hash aggs, two marginal
    * joins keyed on single words, one broadcast of the 1-row total.
    * `minCount` prunes the pair table before the joins — rare-pair noise
    * removal and the join-size guard in one.
    */
  def wordPmi(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minCount: Long = 5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy("i")
    val tok = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("i", "w")))
    val big = tok.withColumn("b", lead("w", 1).over(w))
      .filter(col("w") =!= "" && col("b").isNotNull && col("b") =!= "")
      .select(col("w").as("a"), col("b"))
    val pairs = big.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val leftM = big.groupBy("a").agg(count(lit(1)).as("c_a"))
    val rightM = big.groupBy("b").agg(count(lit(1)).as("c_b"))
    val total = big.agg(count(lit(1)).as("n_big"))
    pairs
      .join(leftM, Seq("a"))
      .join(rightM, Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("c_ab"),
        // DECIMAL(38)-guard the denominator too: raw BIGINT c_a*c_b wraps
        // past ~9.2e18 at 100 TB word counts (the numerator was already
        // guarded)
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n_big * c_ab) " +
          "div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)").as("pmi_ppm"))
  }

  /** BM25-shape keyword relevance scoring (Robertson/Spärck Jones) with
    * the transcendentals replaced by exact rationals so the score is a
    * zero-tolerance integer: idf's log((N−df+½)/(df+½)) becomes the
    * rational (2N−2df+1)/(2df+1) itself (same ordering, never negative
    * — the log's notorious negative-idf edge vanishes), and the tf
    * saturation keeps its exact Robertson form with k1=6/5, b=3/4
    * cleared of denominators:
    *
    *   tf_part = 22·A·tf / (10·A·tf + 3·A + 9·dl·N)
    *
    * (A = corpus token count, N = doc count, dl = doc length). Each
    * term's contribution is floored to ppm, then summed per doc.
    *
    * Scale shape: one token explode feeding three map-side-combined
    * aggs (doc lengths, the query-term pick, per-doc tf restricted by a
    * broadcast semi-join on the k query terms), a term-keyed df agg,
    * and one 1-row totals broadcast; top-k is a partial TakeOrdered.
    * All products DECIMAL(38,0)-guarded: at 100 TB (A≈10¹⁴, N≈10¹⁰) the
    * largest numerator is ≈10³⁵.
    */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, nTerms: Int, minTermLen: Int, k: Int)
      : org.apache.spark.sql.DataFrame = {
    // Ckpt.stage, not persist: toks feeds three subtrees (dl, terms, tf)
    // but the result is returned lazily, so a persist had no unpersist
    // point and its blocks accumulated across executions; local-checkpoint
    // blocks are GC-reclaimed (the reliable path needs
    // cleanCheckpoints=true — Ckpt.stage warns when it's off).
    val toks = Ckpt.stage(docs.select(col(idCol).as("doc_id"),
        explode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("w")))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("a_tokens"))
    val terms = toks.filter(length(col("w")) >= minTermLen)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(nTerms)
      .select("w")
    val tf = toks.join(terms, Seq("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) *
                  (2 * n_docs - 2 * df + 1) * 22 * a_tokens * tf) div
                (CAST(2 * df + 1 AS DECIMAL(38,0)) *
                  (CAST(10 AS DECIMAL(38,0)) * a_tokens * tf +
                   3 * a_tokens + CAST(9 AS DECIMAL(38,0)) * dl * n_docs))"""
          .stripMargin).as("contrib"))
      .groupBy("doc_id").agg(sum("contrib").as("score"))
      .select(col("doc_id"), col("score").cast(LongType).as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("doc_id")).limit(k)
  }
}
