package graft.ops

import graft.QueryDef
import graft.relational.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation queries: benchmark decontamination ([[Contamination]])
  * and deterministic mixture reweighting ([[Sampling.stratifiedSample]]).
  */
object CurationQueries {

  /** The 12 chained `lead`s of the 13-gram window, as DuckDB SQL. */
  private val GramExpr =
    "w" + (1 to 12).map(k => s" || ' ' || lead(w, $k) OVER win").mkString

  /** Train/eval 13-gram contamination (GPT-3-era decontamination
    * convention): train = doc_id % 5 ≠ 0, eval = % 5 = 0 (the q58 split).
    * Eval grams are probed against the DISTINCT train-gram set; every
    * eval doc reports (n_grams, n_hit, hit_ppm), zeros included.
    */
  val q61_contamination: QueryDef = QueryDef(
    "q61_contamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Contamination.ngramOverlap(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", n = 13)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    Some(s"""WITH tok AS (
      |  SELECT doc_id,
      |    generate_subscripts(string_split(text, ' '), 1) AS i,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, $GramExpr AS gram
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
      |eg AS (SELECT doc_id, gram FROM g WHERE gram IS NOT NULL AND doc_id % 5 = 0),
      |tg AS (SELECT DISTINCT gram FROM g WHERE gram IS NOT NULL AND doc_id % 5 <> 0),
      |hit AS (
      |  SELECT eg.doc_id, COUNT(*) AS n_hit
      |  FROM eg JOIN tg ON eg.gram = tg.gram GROUP BY eg.doc_id),
      |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM eg GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(t.n_grams, 0) AS BIGINT) AS n_grams,
      |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
      |  CAST(FLOOR(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) * 1000000.0
      |    / GREATEST(COALESCE(t.n_grams, 0), 1)) AS BIGINT) AS hit_ppm
      |FROM documents d
      |LEFT JOIN tot t ON d.doc_id = t.doc_id
      |LEFT JOIN hit h ON d.doc_id = h.doc_id
      |WHERE d.doc_id % 5 = 0
      |ORDER BY d.doc_id""".stripMargin),
    "Benchmark decontamination: eval 13-grams probed against the distinct " +
      "train-gram set (persistable at scale), per-doc collision report")

  private val MixWeights = Seq(
    "en" -> 1.0, "de" -> 0.5, "es" -> 0.25, "fr" -> 0.1, "zh" -> 0.05)

  /** Deterministic mixture reweighting: per-language keep fractions via
    * the md5 unit hash, so the sampled corpus is identical across runs,
    * partitionings, and engines. Oracled by replaying the exact
    * hash-vs-threshold comparison in DuckDB and comparing the per-stratum
    * survivor counts AND the survivor id digest (sum of kept doc_ids).
    */
  val q62_stratified_mix: QueryDef = QueryDef(
    "q62_stratified_mix",
    (s, d) => {
      Sampling.stratifiedSample(Tables.documents(s, d), "doc_id", "lang",
          MixWeights.toMap)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), min("doc_id").as("first_id"),
          sum("doc_id").cast(LongType).as("id_digest"))
        .orderBy("lang")
    },
    Some {
      val unitHash =
        "CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT) / 4294967296.0"
      val caseExpr = "CASE " + MixWeights.map { case (k, f) =>
        s"WHEN lang = '$k' THEN $f" }.mkString(" ") + " ELSE 1.0 END"
      s"""WITH kept AS (
        |  SELECT doc_id, lang FROM documents
        |  WHERE $unitHash < $caseExpr)
        |SELECT lang, COUNT(*) AS n, MIN(doc_id) AS first_id,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_digest
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin
    },
    "Deterministic per-language mixture reweighting (stable stratified " +
      "sampling), survivor counts + id digest hash-compared")

  /** Sliding token-window chunking as a CORRECTNESS row: every window's
    * text is md5-hashed on both sides, so parity proves window counts,
    * boundaries, overlap, and short-tail handling are all identical.
    * maxTokens=64, overlap=16 → stride=48.
    */
  val q67_token_chunks: QueryDef = QueryDef(
    "q67_token_chunks",
    (s, d) =>
      Packing.chunkByTokens(Tables.documents(s, d), "doc_id", "text",
          maxTokens = 64, overlap = 16)
        .select(col("doc_id"), col("chunk_no"),
          md5(col("chunk_text")).as("chunk_md5"), col("n_tokens"))
        .orderBy("doc_id", "chunk_no"),
    Some("""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks, n,
      |    1 + CASE WHEN n > 64
      |      THEN CAST(ceil((n - 64) / 48.0) AS BIGINT) ELSE 0 END AS nc
      |  FROM t),
      |e AS (
      |  SELECT doc_id, toks, n, unnest(range(0, nc)) AS k FROM c)
      |SELECT doc_id, k AS chunk_no,
      |  md5(array_to_string(list_slice(toks, k * 48 + 1, k * 48 + 64), ' ')) AS chunk_md5,
      |  least(64, n - k * 48) AS n_tokens
      |FROM e
      |ORDER BY doc_id, chunk_no""".stripMargin),
    "Token-window chunking (64/16 overlap) — the upstream step packGreedy's " +
      "oversize-doc contract requires")

  /** The Bloom-prefiltered decontamination path
    * ([[Contamination.ngramOverlapBloom]]) under q61's EXACT oracle: no
    * false negatives means the prefilter must not change a single row
    * or count — hash parity here proves the scale optimization is
    * semantics-free, the same way q76 gates the salted join and q44
    * shares q42's oracle.
    */
  val q81_contamination_bloom: QueryDef = QueryDef(
    "q81_contamination_bloom",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Contamination.ngramOverlapBloom(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", n = 13)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    q61_contamination.oracle,
    "Bloom-prefiltered decontamination — bit-identical to the exact path")

  /** [[Featurize.importanceDigest]] — DSIR-shaped data selection: score
    * every document by the ratio of its hashed-unigram likelihood under a
    * curated-target model (docs with id % 7 = 0, the q61-style split
    * convention) vs the raw-corpus model, Laplace-smoothed, in pure
    * rational ppm arithmetic (q60's no-libm-ln convention). The oracle
    * replays tokenization, md5 buckets, both corpus models, the BIGINT
    * ratio division, and the keep decision exactly.
    */
  val q101_importance_resample: QueryDef = QueryDef(
    "q101_importance_resample",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Featurize.importanceDigest(
          docs, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 1024 AS bucket,
      |    COUNT(*) AS tf
      |  FROM tok GROUP BY doc_id, bucket),
      |tft AS (SELECT bucket, SUM(tf) AS ct FROM tf WHERE doc_id % 7 = 0 GROUP BY bucket),
      |cr AS (SELECT bucket, SUM(tf) AS cr FROM tf GROUP BY bucket),
      |nr AS (SELECT SUM(tf) AS n FROM tf),
      |nt AS (SELECT SUM(tf) AS n FROM tf WHERE doc_id % 7 = 0),
      |ratio AS (
      |  SELECT cr.bucket,
      |    CAST(floor((1000000 * (COALESCE(t.ct, 0) + 1) * ((SELECT n FROM nr) + 1024))
      |      / ((cr.cr + 1) * ((SELECT n FROM nt) + 1024))) AS BIGINT) AS r_ppm
      |  FROM cr LEFT JOIN tft t ON t.bucket = cr.bucket),
      |scored AS (
      |  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
      |    CAST(SUM(tf.tf * r.r_ppm) AS BIGINT) AS score_ppm
      |  FROM tf JOIN ratio r ON r.bucket = tf.bucket
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, n_tokens, score_ppm,
      |  CAST(CASE WHEN score_ppm > 1000000 * n_tokens THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM scored ORDER BY doc_id""".stripMargin),
    "DSIR-shaped importance resampling: hashed-unigram target/raw " +
      "likelihood-ratio scoring in rational ppm space, keep = " +
      "target-favored docs")

  /** Quality-stratified rebalancing — the perplexity-binning pass of a
    * training-data pipeline: score every doc under the corpus bigram LM
    * (q85's pipeline), bin by FIXED score thresholds (avg_p ppm div
    * 100000 — fixed bins, NOT ntile: a global rank window is
    * scale-illegal), then keep a deterministic hash-ranked cap of 30
    * docs per bin ([[Sampling.groupCap]], q91's convention) so no
    * quality band dominates the mixture. Emits per-bin candidate/kept
    * counts plus the kept-id digest that pins the EXACT kept subset.
    */
  val q109_quality_rebalance: QueryDef = QueryDef(
    "q109_quality_rebalance",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val lm = CorpusBuilds.documentsBigramLm(s, d) // shared with q85
      val bucketed = LanguageModel
        .scoreAvgCondProb(docs, "doc_id", "text", lm)
        .select(col("doc_id"), expr("avg_p_ppm div 100000").as("bucket"))
      val candidates = bucketed.groupBy("bucket")
        .agg(count(lit(1)).as("n_candidates"))
      val kept = Sampling.groupCap(bucketed, "doc_id", "bucket", k = 30)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_kept"),
          sum("doc_id").cast(LongType).as("id_digest"))
      candidates.join(kept, Seq("bucket"))
        .select(col("bucket"), col("n_candidates"), col("n_kept"),
          col("id_digest"))
        .orderBy("bucket")
    },
    Some("""WITH toks AS (
      |  SELECT doc_id, i, w FROM (
      |    SELECT doc_id,
      |      generate_subscripts(string_split(text, ' '), 1) AS i,
      |      unnest(string_split(text, ' ')) AS w
      |    FROM documents) t
      |  WHERE w <> ''),
      |bg AS (
      |  SELECT a.doc_id, a.w AS w1, b.w AS w2
      |  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
      |lm AS (SELECT w1, w2, CAST(c2 AS DOUBLE) / c1 AS p FROM c2 JOIN c1 USING (w1)),
      |scored AS (
      |  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
      |    SUM(CAST(COALESCE(lm.p, CAST(0 AS DOUBLE)) AS DECIMAL(28,12))) AS s
      |  FROM bg LEFT JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
      |  GROUP BY 1),
      |bucketed AS (
      |  SELECT doc_id,
      |    CAST(floor(CAST(floor(1000000 * (CAST(s AS DOUBLE) / n_bigrams)) AS BIGINT) / 100000) AS BIGINT) AS bucket
      |  FROM scored),
      |ranked AS (
      |  SELECT doc_id, bucket,
      |    row_number() OVER (PARTITION BY bucket ORDER BY
      |      CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT) / 4294967296.0,
      |      doc_id) AS rk
      |  FROM bucketed),
      |cand AS (SELECT bucket, COUNT(*) AS n_candidates FROM bucketed GROUP BY bucket),
      |kept AS (
      |  SELECT bucket, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_digest
      |  FROM ranked WHERE rk <= 30 GROUP BY bucket)
      |SELECT c.bucket, CAST(c.n_candidates AS BIGINT) AS n_candidates,
      |  CAST(k.n_kept AS BIGINT) AS n_kept, k.id_digest
      |FROM cand c JOIN kept k ON k.bucket = c.bucket
      |ORDER BY c.bucket""".stripMargin),
    "Quality-stratified rebalancing: LM-score fixed bins + deterministic " +
      "hash-ranked per-bin cap (perplexity-binning mixture control)")

  /** The CAPSTONE composition — the end-to-end "produce the training
    * mixture" pipeline every stage of this library exists for, run as
    * ONE query: near-dup keeper selection (q123's shared CorpusBuilds
    * components + q26 quality) → Gopher quality gate (q115) →
    * temperature-balanced mixture over the survivors (q113's α=1/2 rule,
    * base 10). Output is the per-language funnel: corpus docs →
    * dedup-kept → quality-kept → candidates (both gates) → cap →
    * final kept set (count + id digest). Every stage reuses its
    * already-oracled kernel, and the oracle replays the full chain —
    * so the row value-checks the COMPOSITION (gate ordering, survivor
    * strata, caps over post-filter counts), not just the pieces.
    *
    * Scale shape: nothing new is paid — the component build is the
    * shared checkpointed artifact, the gates are per-row passes, and
    * the mixture runs over the (smaller) survivor frame; the funnel
    * aggregate is one map-side-combined hash agg per stage, output one
    * row per language.
    */
  val q134_curation_pipeline: QueryDef = QueryDef(
    "q134_curation_pipeline",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val scored = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      val reps = Dedup.selectRepresentatives(
          CorpusBuilds.documentsCanonical(s, d), scored, "doc_id", "quality")
        .select(col("doc_id"), col("is_rep"))
      val gopher = TextAnalysis.gopherRules(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep").as("g_keep"))
      val flags = docs.select("doc_id", "lang")
        .join(reps, Seq("doc_id"))
        .join(gopher, Seq("doc_id"))
      val surv = flags.filter(col("is_rep") === 1L && col("g_keep") === 1L)
        .select("doc_id", "lang")
      val mix = Sampling.temperatureMix(surv, "doc_id", "lang", base = 10)
      val funnel = flags.groupBy("lang").agg(
        count(lit(1)).cast(LongType).as("n_docs"),
        sum("is_rep").cast(LongType).as("n_rep"),
        sum("g_keep").cast(LongType).as("n_quality"),
        sum(col("is_rep") * col("g_keep")).cast(LongType).as("n_candidates"))
      val kept = mix.groupBy("lang").agg(
        max("cap").cast(LongType).as("cap"),
        sum("kept").cast(LongType).as("n_kept"),
        sum(when(col("kept") === 1L, col("doc_id"))).cast(LongType)
          .as("kept_id_digest"))
      funnel.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("n_rep"), col("n_quality"),
          col("n_candidates"),
          coalesce(col("cap"), lit(0L)).as("cap"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_id_digest"), lit(0L)).as("kept_id_digest"))
        .orderBy("lang")
    },
    Some("WITH RECURSIVE " + DedupQueries.shinglesSql.stripPrefix("WITH ") +
      """,
        |hs AS (
        |  SELECT doc_id, band, min(md5(band || sh)) AS bucket
        |  FROM sh, (SELECT CAST(unnest(list_value(0,1,2,3,4,5,6,7)) AS STRING) AS band) b
        |  GROUP BY doc_id, band),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM hs a JOIN hs b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |e AS (SELECT id_a AS a, id_b AS b FROM cand
        |      UNION SELECT id_b, id_a FROM cand),
        |r(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id FROM r GROUP BY a),
        |qual AS (
        |  SELECT doc_id,
        |    CAST((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 1 ELSE 0 END)
        |       + (CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END)
        |       + (CASE WHEN CAST(len(regexp_extract_all(text, '([.,!?])', 1)) AS BIGINT) * 10
        |               <= CAST(len(regexp_extract_all(text, '(\S+)', 1)) AS BIGINT)
        |          THEN 1 ELSE 0 END) AS BIGINT) AS quality
        |  FROM documents),
        |cbase AS (
        |  SELECT d.doc_id, d.lang,
        |    COALESCE(c.canonical_id, d.doc_id) AS canonical_id, q.quality
        |  FROM documents d
        |  LEFT JOIN comp c ON c.doc_id = d.doc_id
        |  JOIN qual q ON q.doc_id = d.doc_id),
        |rep AS (
        |  SELECT canonical_id, doc_id AS rep_id FROM (
        |    SELECT canonical_id, doc_id,
        |      row_number() OVER (PARTITION BY canonical_id
        |                         ORDER BY quality DESC, doc_id) AS rn
        |    FROM cbase) t
        |  WHERE rn = 1),
        |gt AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |gbase AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS char_sum,
        |    CAST(len(list_filter(ws, x -> regexp_matches(x, '\p{L}'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(ws, x -> x IN ('the','and','of','to','in'))) AS BIGINT) AS n_stop
        |  FROM gt),
        |gbg AS (
        |  SELECT doc_id, w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS bg
        |  FROM tok),
        |gbc AS (SELECT doc_id, bg, COUNT(*) AS c FROM gbg WHERE bg IS NOT NULL
        |  GROUP BY doc_id, bg),
        |gtop AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg FROM gbc GROUP BY doc_id),
        |gk AS (
        |  SELECT b.doc_id,
        |    CAST(CASE WHEN b.n_words BETWEEN 50 AND 100000
        |          AND 3 * b.n_words <= b.char_sum AND b.char_sum <= 10 * b.n_words
        |          AND 5 * b.n_alpha >= 4 * b.n_words
        |          AND b.n_stop >= 2
        |          AND (COALESCE(t.n_bg, 0) = 0
        |            OR 5 * COALESCE(t.top_c, 0) <= COALESCE(t.n_bg, 0))
        |         THEN 1 ELSE 0 END AS BIGINT) AS g_keep
        |  FROM gbase b LEFT JOIN gtop t ON b.doc_id = t.doc_id),
        |flags AS (
        |  SELECT cb.doc_id, cb.lang,
        |    CAST(CASE WHEN cb.doc_id = rep.rep_id THEN 1 ELSE 0 END AS BIGINT) AS is_rep,
        |    gk.g_keep
        |  FROM cbase cb
        |  JOIN rep USING (canonical_id)
        |  JOIN gk ON gk.doc_id = cb.doc_id),
        |surv AS (SELECT doc_id, lang FROM flags WHERE is_rep = 1 AND g_keep = 1),
        |counts AS (SELECT lang, COUNT(*) AS n_docs FROM surv GROUP BY lang),
        |isq AS (
        |  SELECT lang, n_docs,
        |    r - CASE WHEN r * r > n_docs THEN 1 ELSE 0 END
        |      + CASE WHEN (r + 1) * (r + 1) <= n_docs THEN 1 ELSE 0 END AS isq
        |  FROM (SELECT lang, n_docs,
        |          CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS r
        |        FROM counts) t),
        |caps AS (SELECT lang, n_docs, LEAST(n_docs, 10 * isq) AS cap FROM isq),
        |ranked AS (
        |  SELECT sv.doc_id, sv.lang, c.cap,
        |    row_number() OVER (PARTITION BY sv.lang ORDER BY
        |      CAST(('0x' || substr(md5(CAST(sv.doc_id AS STRING)), 1, 8)) AS BIGINT) / 4294967296.0,
        |      sv.doc_id) AS rk
        |  FROM surv sv JOIN caps c USING (lang)),
        |keptagg AS (
        |  SELECT lang, CAST(MAX(cap) AS BIGINT) AS cap,
        |    CAST(SUM(CASE WHEN rk <= cap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |    CAST(SUM(CASE WHEN rk <= cap THEN doc_id END) AS BIGINT) AS kept_id_digest
        |  FROM ranked GROUP BY lang)
        |SELECT f.lang, f.n_docs, f.n_rep, f.n_quality, f.n_candidates,
        |  COALESCE(k.cap, 0) AS cap,
        |  COALESCE(k.n_kept, 0) AS n_kept,
        |  COALESCE(k.kept_id_digest, 0) AS kept_id_digest
        |FROM (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(is_rep) AS BIGINT) AS n_rep,
        |    CAST(SUM(g_keep) AS BIGINT) AS n_quality,
        |    CAST(SUM(is_rep * g_keep) AS BIGINT) AS n_candidates
        |  FROM flags GROUP BY lang) f
        |LEFT JOIN keptagg k USING (lang)
        |ORDER BY f.lang""".stripMargin),
    "End-to-end curation pipeline (capstone composition): dedup keeper " +
      "selection -> Gopher gate -> temperature mixture, per-language " +
      "funnel value-oracled through the full chain")

  /** [[Drift.tokenDrift]] between the documents corpus and the q126
    * simulated recrawl (identical snapshot synthesis: ids ≡3 (mod 10)
    * vanish, ids ≡7 get " v2" appended, ids ≡0 spawn new pages) — the
    * distribution-drift monitor that pairs with q126's membership diff.
    * Top-200 drifted tokens, every (token, old_ppm, new_ppm, drift_ppm)
    * row value-checked; (drift_ppm DESC, token) is a total order, so the
    * LIMIT cut is engine-stable.
    */
  val q136_token_drift: QueryDef = QueryDef(
    "q136_token_drift",
    (s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val neu = docs.filter(col("doc_id") % 10 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 7, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionAll(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("new page "), col("doc_id").cast(StringType)).as("text")))
      Drift.tokenDrift(docs, neu, "text")
        .orderBy(col("drift_ppm").desc, col("token"))
        .limit(200)
    },
    Some("""WITH neu AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 7 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 10 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    'new page ' || CAST(doc_id AS STRING) AS text
      |  FROM documents WHERE doc_id % 10 = 0),
      |oc AS (
      |  SELECT token, COUNT(*) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> '' GROUP BY token),
      |nc AS (
      |  SELECT token, COUNT(*) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS token FROM neu)
      |  WHERE token <> '' GROUP BY token),
      |op AS (
      |  SELECT token,
      |    CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * cnt) / (SELECT SUM(cnt) FROM oc)) AS BIGINT) AS old_ppm
      |  FROM oc),
      |np AS (
      |  SELECT token,
      |    CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * cnt) / (SELECT SUM(cnt) FROM nc)) AS BIGINT) AS new_ppm
      |  FROM nc)
      |SELECT COALESCE(op.token, np.token) AS token,
      |  CAST(COALESCE(old_ppm, 0) AS BIGINT) AS old_ppm,
      |  CAST(COALESCE(new_ppm, 0) AS BIGINT) AS new_ppm,
      |  CAST(abs(COALESCE(new_ppm, 0) - COALESCE(old_ppm, 0)) AS BIGINT) AS drift_ppm
      |FROM op FULL OUTER JOIN np ON op.token = np.token
      |ORDER BY drift_ppm DESC, token
      |LIMIT 200""".stripMargin),
    "Corpus token-distribution drift between snapshots: per-token " +
      "floor-ppm frequency shift, full-outer vocab join, top-200 by " +
      "drift — the content-drift monitor paired with q126's recrawl CDC")

  /** [[Contamination.spanDecontaminate]] with q61's split reversed: the
    * %5=0 docs are the BENCHMARK whose 13-grams must be excised from the
    * %5≠0 TRAINING docs. Reports the surgical cut per train doc —
    * n_removed tokens in n_spans maximal runs — instead of q61's
    * whole-doc flag. The oracle replays gram construction, the covered-
    * position explode, the DISTINCT overlap merge, and the lag()-based
    * gaps-and-islands span count; a single off-by-one in span coverage
    * shifts n_removed and hash-fails.
    */
  val q144_span_decontamination: QueryDef = QueryDef(
    "q144_span_decontamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Contamination.spanDecontaminate(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", n = 13)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    Some(s"""WITH tok AS (
      |  SELECT doc_id,
      |    generate_subscripts(string_split(text, ' '), 1) AS i,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, i, $GramExpr AS gram
      |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
      |bg AS (SELECT DISTINCT gram FROM g WHERE gram IS NOT NULL AND doc_id % 5 = 0),
      |hits AS (
      |  SELECT g.doc_id, g.i FROM g JOIN bg ON g.gram = bg.gram
      |  WHERE g.doc_id % 5 <> 0),
      |cov AS (
      |  SELECT DISTINCT doc_id, i + d AS t
      |  FROM hits, (SELECT d FROM range(0, 13) AS t(d)) ds),
      |sp AS (
      |  SELECT doc_id, COUNT(*) AS n_removed,
      |    SUM(CASE WHEN pt IS NULL OR pt <> t - 1 THEN 1 ELSE 0 END) AS n_spans
      |  FROM (SELECT doc_id, t, lag(t) OVER (PARTITION BY doc_id ORDER BY t) AS pt
      |        FROM cov) x
      |  GROUP BY doc_id),
      |nt AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens FROM tok
      |  WHERE doc_id % 5 <> 0 GROUP BY doc_id)
      |SELECT nt.doc_id,
      |  CAST(nt.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(sp.n_removed, 0) AS BIGINT) AS n_removed,
      |  CAST(COALESCE(sp.n_spans, 0) AS BIGINT) AS n_spans,
      |  CAST(nt.n_tokens - COALESCE(sp.n_removed, 0) AS BIGINT) AS n_kept
      |FROM nt LEFT JOIN sp ON nt.doc_id = sp.doc_id
      |ORDER BY nt.doc_id""".stripMargin),
    "Span-level decontamination: excise benchmark 13-gram overlaps from " +
      "training docs; per-doc removed-token and maximal-span counts")

  /** Data-quality constraint audit ([[Audit]]) — the validation gate a
    * corpus version passes before release: five named constraints
    * spanning completeness, uniqueness, row-level consistency
    * (`n_chars = length(text)` — a REAL metadata/payload agreement
    * check), a value-range rule tight enough to FAIL (value ≤ 100
    * against a 490-max column — the audit must prove it counts, not
    * rubber-stamps), and events→customer referential integrity. All
    * three documents checks fuse into ONE aggregation pass; the range
    * check is one pass over events; the referential check one
    * anti-join. The oracle recomputes every counter as scalar SQL.
    */
  val q157_constraint_audit: QueryDef = QueryDef(
    "q157_constraint_audit",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val ev = Tables.events(s, d)
      Audit.audit(docs, Seq(
          Audit.complete("completeness:documents.text", col("text")),
          Audit.unique("uniqueness:documents.doc_id", col("doc_id")),
          Audit.satisfies("consistency:documents.n_chars",
            col("n_chars") === length(col("text")))))
        .unionAll(Audit.audit(ev, Seq(
          Audit.satisfies("range:events.value<=100", col("value") <= 100.0))))
        .unionAll(Audit.refCheck("referential:events.user_id",
          ev, "user_id", Tables.customer(s, d), "c_custkey"))
        .orderBy("check_name")
    },
    Some("""SELECT check_name, n_checked, n_violations,
      |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
      |FROM (
      |  SELECT 'completeness:documents.text' AS check_name,
      |    CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_checked,
      |    CAST((SELECT COUNT(*) FROM documents WHERE text IS NULL) AS BIGINT)
      |      AS n_violations
      |  UNION ALL
      |  SELECT 'uniqueness:documents.doc_id',
      |    CAST((SELECT COUNT(*) FROM documents) AS BIGINT),
      |    CAST((SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents) AS BIGINT)
      |  UNION ALL
      |  SELECT 'consistency:documents.n_chars',
      |    CAST((SELECT COUNT(*) FROM documents) AS BIGINT),
      |    CAST((SELECT SUM(CASE WHEN NOT (n_chars = length(text)) THEN 1 ELSE 0 END)
      |          FROM documents) AS BIGINT)
      |  UNION ALL
      |  SELECT 'range:events.value<=100',
      |    CAST((SELECT COUNT(*) FROM events) AS BIGINT),
      |    CAST((SELECT SUM(CASE WHEN NOT (value <= 100) THEN 1 ELSE 0 END)
      |          FROM events) AS BIGINT)
      |  UNION ALL
      |  SELECT 'referential:events.user_id',
      |    CAST((SELECT COUNT(*) FROM events) AS BIGINT),
      |    CAST((SELECT COUNT(*) FROM events e WHERE NOT EXISTS
      |          (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS BIGINT)
      |) t ORDER BY check_name""".stripMargin),
    "Constraint audit (Deequ shape): completeness/uniqueness/consistency/" +
      "range/referential checks, single-pass per table, exact counters")

  def defs: Seq[QueryDef] = Seq(q61_contamination, q62_stratified_mix,
    q67_token_chunks, q81_contamination_bloom, q101_importance_resample,
    q109_quality_rebalance, q134_curation_pipeline, q136_token_drift,
    q144_span_decontamination, q157_constraint_audit)
}
