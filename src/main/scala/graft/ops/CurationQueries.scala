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
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0"
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
      |    (1000000 * (COALESCE(t.ct, 0) + 1) * ((SELECT n FROM nr) + 1024))
      |      // ((cr.cr + 1) * ((SELECT n FROM nt) + 1024)) AS r_ppm
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
      |    CAST(floor(1000000 * (CAST(s AS DOUBLE) / n_bigrams)) AS BIGINT) // 100000 AS bucket
      |  FROM scored),
      |ranked AS (
      |  SELECT doc_id, bucket,
      |    row_number() OVER (PARTITION BY bucket ORDER BY
      |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0,
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

  def defs: Seq[QueryDef] = Seq(q61_contamination, q62_stratified_mix,
    q67_token_chunks, q81_contamination_bloom, q101_importance_resample,
    q109_quality_rebalance)
}
