package graft.ops

import graft.QueryDef
import graft.relational.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over the `documents` table (SURVEY.md §2.5 A5 +
  * north-star text ops): tokenization, word frequency, quality scoring,
  * language guessing, char-shingle fingerprinting, binary metadata.
  *
  * All scalar chains are built-in codegen'd expressions — no UDFs — so the
  * whole per-document pass stays in one WholeStageCodegen stage and scales
  * embarrassingly (no shuffle until the final aggregation).
  */
object TextQueries {

  private def q(name: String, oracle: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle), doc)

  val q13_word_topk: QueryDef = q(
    "q13_word_topk",
    """SELECT word, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY cnt DESC, word
      |LIMIT 10""".stripMargin,
    "Word frequency top-k (A5/L4: the reference's latent /analyze endpoint)") {
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(10)
  }

  val q25_token_stats: QueryDef = q(
    "q25_token_stats",
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '(\S+)', 1)) AS BIGINT) AS n_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    "Token counting (whitespace tokenizer) — per-doc scalar pass") { (s, d) =>
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast(LongType).as("n_tokens"),
        length(col("text")).cast(LongType).as("n_chars"))
      .orderBy("doc_id")
  }

  val q26_quality_score: QueryDef = q(
    "q26_quality_score",
    """SELECT doc_id, n_tokens,
      |  CAST((CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1 ELSE 0 END)
      |     + (CASE WHEN has_stop THEN 1 ELSE 0 END)
      |     + (CASE WHEN n_punct * 10 <= n_tokens THEN 1 ELSE 0 END) AS BIGINT) AS quality
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '(\S+)', 1)) AS BIGINT) AS n_tokens,
      |    CAST(len(regexp_extract_all(text, '([.,!?])', 1)) AS BIGINT) AS n_punct,
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    text LIKE '% the %' AS has_stop
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin,
    "Quality scoring: length window + stopword presence + punctuation ratio") {
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast(LongType).as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("[.,!?]"), lit(0))).cast(LongType).as("n_punct"),
          length(col("text")).cast(LongType).as("n_chars"),
          col("text").like("% the %").as("has_stop"))
        .select(
          col("doc_id"),
          col("n_tokens"),
          (when(col("n_chars").between(50, 10000), 1).otherwise(0)
            + when(col("has_stop"), 1).otherwise(0)
            + when(col("n_punct") * 10 <= col("n_tokens"), 1).otherwise(0))
            .cast(LongType).as("quality"))
        .orderBy("doc_id")
  }

  val q27_lang_guess: QueryDef = q(
    "q27_lang_guess",
    """SELECT doc_id,
      |  CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
      |       WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
      |       WHEN c_es >= c_fr THEN 'es'
      |       ELSE 'fr' END AS lang_guess
      |FROM (
      |  SELECT doc_id,
      |    len(regexp_extract_all(text, '(\b(the|and|of)\b)', 1)) AS c_en,
      |    len(regexp_extract_all(text, '(\b(der|und|das)\b)', 1)) AS c_de,
      |    len(regexp_extract_all(text, '(\b(el|la|los)\b)', 1)) AS c_es,
      |    len(regexp_extract_all(text, '(\b(le|et|les)\b)', 1)) AS c_fr
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin,
    "Language ID via stopword n-gram counts (deterministic heuristic)") { (s, d) =>
    def cnt(pat: String) = size(regexp_extract_all(col("text"), lit(pat), lit(0)))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        cnt("\\b(the|and|of)\\b").as("c_en"),
        cnt("\\b(der|und|das)\\b").as("c_de"),
        cnt("\\b(el|la|los)\\b").as("c_es"),
        cnt("\\b(le|et|les)\\b").as("c_fr"))
      .select(
        col("doc_id"),
        when(col("c_en") >= col("c_de") && col("c_en") >= col("c_es") && col("c_en") >= col("c_fr"), "en")
          .when(col("c_de") >= col("c_es") && col("c_de") >= col("c_fr"), "de")
          .when(col("c_es") >= col("c_fr"), "es")
          .otherwise("fr").as("lang_guess"))
      .orderBy("doc_id")
  }

  val q36_doc_fingerprint: QueryDef = q(
    "q36_doc_fingerprint",
    """SELECT doc_id, min(md5(substring(text, j, 8))) AS fingerprint
      |FROM documents
      |CROSS JOIN range(1, 65537) AS t(j)
      |WHERE j <= greatest(length(text) - 7, 1)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin,
    "Document fingerprint: min-hash over sliding char 8-grams (winnowing-style)") {
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)))).as("j"),
          col("text"))
        .select(col("doc_id"), md5(col("text").substr(col("j"), lit(8))).as("h"))
        .groupBy("doc_id")
        .agg(min(col("h")).as("fingerprint"))
        .orderBy("doc_id")
  }

  val q34_binary_meta: QueryDef = q(
    "q34_binary_meta",
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  sha256(text) AS content_sha
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    "Multimodal plumbing: opaque-binary byte length + content hash " +
      "(the decode step itself is the stubbed part, see ops.Multimodal)") {
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          octet_length(col("text")).cast(LongType).as("n_bytes"),
          sha2(col("text").cast(BinaryType), 256).as("content_sha"))
        .orderBy("doc_id")
  }

  /** Multimodal frame-sampling plumbing as an oracle-checked query: fixed-
    * stride payload slices with per-frame content hashes — the exact shape
    * ops.Multimodal.frameSample produces for video-kind binaries, exercised
    * here on text payloads so DuckDB can verify it.
    */
  val q51_frame_meta: QueryDef = q(
    "q51_frame_meta",
    """SELECT doc_id, CAST(floor((j - 1) / 32) AS BIGINT) AS frame_no,
      |  md5(substring(text, j, 32)) AS frame_hash
      |FROM documents
      |CROSS JOIN range(1, 65537) AS t(j)
      |WHERE j <= length(text) AND (j - 1) % 32 = 0
      |ORDER BY doc_id, frame_no""".stripMargin,
    "Frame sampling metadata (multimodal plumbing, stride-32 slices; " +
      "oracle bound: docs ≤ 64 KiB)") { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        // (?s): '.' must cross newlines or the chunking stalls at the
        // first block containing one
        posexplode(split(col("text"), "(?s)(?<=\\G.{32})")).as(Seq("frame_no", "frame")))
      .filter(length(col("frame")) > 0)
      .select(col("doc_id"), col("frame_no").cast(LongType).as("frame_no"),
        md5(col("frame")).as("frame_hash"))
      .orderBy("doc_id", "frame_no")
  }

  /** Gopher-style repetition/diversity quality signals, per doc: word
    * count, type-token ratio, and top-bigram dominance. Fractions are
    * emitted as floor(x·10⁶) BIGINT ("ppm") in BOTH engines — one IEEE
    * division then an explicit floor, so the hash compare never depends
    * on double serialization formats. The bigram counting is the exploded
    * lead-window shape (codegen'd) that shares its doc_id shuffle between
    * the word and bigram aggregates.
    */
  val q56_repetition_metrics: QueryDef = q(
    "q56_repetition_metrics",
    """WITH tok AS (
      |  SELECT doc_id,
      |    generate_subscripts(string_split(text, ' '), 1) AS i,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS bg
      |  FROM tok),
      |bc AS (
      |  SELECT doc_id, bg, COUNT(*) AS c FROM bg WHERE bg IS NOT NULL
      |  GROUP BY doc_id, bg),
      |top AS (
      |  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg FROM bc GROUP BY doc_id),
      |wd AS (
      |  SELECT doc_id, COUNT(*) AS n_words, COUNT(DISTINCT w) AS n_distinct
      |  FROM tok GROUP BY doc_id)
      |SELECT w.doc_id, CAST(w.n_words AS BIGINT) AS n_words,
      |  CAST(FLOOR(CAST(w.n_distinct AS DOUBLE) * 1000000.0 / w.n_words) AS BIGINT) AS distinct_ppm,
      |  CAST(COALESCE(t.top_c, 0) AS BIGINT) AS top_bigram_cnt,
      |  CAST(FLOOR(CAST(COALESCE(t.top_c, 0) AS DOUBLE) * 1000000.0
      |       / GREATEST(COALESCE(t.n_bg, 0), 1)) AS BIGINT) AS top_bigram_ppm
      |FROM wd w LEFT JOIN top t ON w.doc_id = t.doc_id
      |ORDER BY w.doc_id""".stripMargin,
    "Repetition/diversity quality signals: type-token ratio + top-bigram " +
      "dominance (Gopher-style), ppm-quantized for engine-exact parity") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d).select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("i", "w")))
    val win = Window.partitionBy("doc_id").orderBy("i")
    val bc = tok
      .withColumn("bg", concat(col("w"), lit(" "), lead("w", 1).over(win)))
      .filter(col("bg").isNotNull)
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
    val top = bc.groupBy("doc_id")
      .agg(max("c").as("top_c"), sum("c").as("n_bg"))
    val wd = tok.groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), countDistinct("w").as("n_distinct"))
    wd.join(top, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_words").cast(LongType).as("n_words"),
        floor(col("n_distinct").cast(DoubleType) * 1000000.0 / col("n_words"))
          .cast(LongType).as("distinct_ppm"),
        coalesce(col("top_c"), lit(0L)).cast(LongType).as("top_bigram_cnt"),
        floor(coalesce(col("top_c"), lit(0L)).cast(DoubleType) * 1000000.0 /
          greatest(coalesce(col("n_bg"), lit(0L)), lit(1L)))
          .cast(LongType).as("top_bigram_ppm"))
      .orderBy("doc_id")
  }

  /** The corpus-cleaning chain (ops.TextCleaning), oracle-checked with the
    * redaction actually FIRING: the synthetic corpus contains no markup or
    * URLs, so both engines first build the same adversarial payload from
    * each row (tags + a per-doc URL + a per-doc email + an entity), then
    * clean it. The hash compare covers the cleaned STRING itself, pinning
    * tag-strip, entity unescape, URL/email redaction, and whitespace
    * normalization byte-for-byte across engines, plus the Gopher
    * mean-word-length and symbol-ratio signals (ppm-quantized).
    */
  val q57_clean_redact: QueryDef = q(
    "q57_clean_redact",
    """WITH raw AS (
      |  SELECT doc_id,
      |    '<p>Begin</p> ' || substring(text, 1, 40) ||
      |    ' see https://ex.am/p?q=' || CAST(doc_id AS STRING) ||
      |    ' &amp; mail u' || CAST(doc_id AS STRING) || '@ex.com <br/> end' AS raw
      |  FROM documents),
      |stripped AS (
      |  SELECT doc_id,
      |    replace(replace(replace(replace(replace(replace(
      |      regexp_replace(raw, '<[^>]+>', ' ', 'g'),
      |      '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |      '&#39;', ''''), '&nbsp;', ' ') AS s
      |  FROM raw),
      |redacted AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(s, 'https?://[^\s]+', '[URL]', 'g'),
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS s
      |  FROM stripped),
      |cleaned AS (
      |  SELECT doc_id, trim(regexp_replace(s, '\s+', ' ', 'g')) AS cleaned
      |  FROM redacted)
      |SELECT c.doc_id, c.cleaned,
      |  CAST(len(regexp_extract_all(r.raw, '(https?://[^\s]+)', 1)) AS BIGINT) AS n_urls,
      |  CAST(len(regexp_extract_all(r.raw,
      |    '([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})', 1)) AS BIGINT) AS n_emails,
      |  CAST(FLOOR(CAST(length(regexp_replace(c.cleaned, '\s', '', 'g')) AS DOUBLE)
      |    * 1000000.0
      |    / GREATEST(len(regexp_extract_all(c.cleaned, '(\S+)', 1)), 1)) AS BIGINT)
      |    AS mean_wl_ppm,
      |  CAST(FLOOR(CAST(len(regexp_extract_all(c.cleaned, '([^\p{L}\p{N}\s])', 1)) AS DOUBLE)
      |    * 1000000.0 / GREATEST(length(c.cleaned), 1)) AS BIGINT) AS symbol_ppm
      |FROM cleaned c JOIN raw r ON c.doc_id = r.doc_id
      |ORDER BY c.doc_id""".stripMargin,
    "Corpus cleaning chain (HTML strip, entity unescape, URL/email " +
      "redaction, whitespace normalize) + mean-word-length and symbol-" +
      "ratio signals; adversarial input built per-row in both engines") { (s, d) =>
    val raw = concat(
      lit("<p>Begin</p> "), substring(col("text"), 1, 40),
      lit(" see https://ex.am/p?q="), col("doc_id").cast(StringType),
      lit(" &amp; mail u"), col("doc_id").cast(StringType),
      lit("@ex.com <br/> end"))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        TextCleaning.cleanChain(raw).as("cleaned"),
        TextCleaning.urlCount(raw).as("n_urls"),
        TextCleaning.emailCount(raw).as("n_emails"))
      .select(
        col("doc_id"), col("cleaned"), col("n_urls"), col("n_emails"),
        floor(TextCleaning.meanWordLength(col("cleaned")) * 1000000.0)
          .cast(LongType).as("mean_wl_ppm"),
        floor(TextCleaning.symbolFraction(col("cleaned")) * 1000000.0)
          .cast(LongType).as("symbol_ppm"))
      .orderBy("doc_id")
  }

  /** [[LanguageModel]] self-scoring over the corpus: build the bigram LM
    * from `documents`, score every document's mean conditional probability
    * under it — the KenLM-shaped quality filter (low score = improbable
    * word transitions = low quality). Parity per the q38 decimal rules:
    * per-bigram p is one IEEE division, the sum is DECIMAL(28,12), only
    * the final mean is floored to ppm. The oracle joins LEFT + coalesce-0
    * exactly like [[LanguageModel.scoreAvgCondProb]] — under self-scoring
    * every bigram is in the LM so INNER would coincide, but the join
    * shape must match the ENGINE's semantics (unseen transitions stay in
    * the denominator at probability 0), not the corpus accident
    * (round-5 ADVICE finding, closed round 7).
    */
  val q85_lm_quality: QueryDef = q(
    "q85_lm_quality",
    """WITH toks AS (
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
      |  GROUP BY 1)
      |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |  CAST(floor(1000000 * (CAST(s AS DOUBLE) / n_bigrams)) AS BIGINT) AS avg_p_ppm
      |FROM scored ORDER BY doc_id""".stripMargin,
    "Bigram-LM quality scoring (KenLM-shaped filter): corpus-trained " +
      "conditional-probability model, mean per-doc transition probability") {
    (s, d) =>
      val docs = Tables.documents(s, d)
      val lm = CorpusBuilds.documentsBigramLm(s, d) // shared with q109
      LanguageModel.scoreAvgCondProb(docs, "doc_id", "text", lm)
        .orderBy("doc_id")
  }

  /** Empty-token parity note: DuckDB's string_split keeps empty fragments
    * exactly like Spark's split, but both sides filter them anyway so the
    * LM never contains separator artifacts (see
    * [[LanguageModel.bigramRows]]).
    */
  /** [[TextAnalysis.bpeishTokens]] — LLM token-count estimation with the
    * GPT-2-style pre-tokenizer (the lookahead-free [[TextAnalysis.bpeishPattern]],
    * interpolated into the oracle verbatim): per-doc subword-token count,
    * word-token count, the chars-per-token "fertility" estimate every
    * token-budgeted pipeline plans with (rational ppm, no doubles), and
    * an md5 digest of the exact token sequence so the oracle pins the
    * tokenization itself, not just its cardinality. One codegen'd scalar
    * pass, no shuffle until the final sort.
    */
  val q112_bpeish_tokens: QueryDef = q(
    "q112_bpeish_tokens",
    s"""WITH t AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |    regexp_extract_all(text, '${TextAnalysis.bpeishPattern.replace("'", "''")}') AS toks
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(toks, x -> regexp_full_match(x, ' ?\\p{L}+'))) AS BIGINT)
      |    AS n_word_tokens,
      |  CAST(CASE WHEN len(toks) = 0 THEN 0
      |       ELSE CAST(floor((1000000 * n_chars) / len(toks)) AS BIGINT) END AS BIGINT)
      |    AS chars_per_token_ppm,
      |  CAST(('0x' || substr(md5(array_to_string(toks, chr(1))), 1, 8)) AS BIGINT)
      |    AS token_digest
      |FROM t ORDER BY doc_id""".stripMargin,
    "BPE-ish pre-tokenization stats: subword/word token counts, " +
      "chars-per-token fertility (ppm), exact-token-sequence digest") {
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), length(col("text")).as("n_chars"),
          TextAnalysis.bpeishTokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast(LongType).as("n_tokens"),
          size(filter(col("toks"), t => t.rlike("^ ?\\p{L}+$")))
            .cast(LongType).as("n_word_tokens"),
          when(size(col("toks")) === 0, 0L)
            .otherwise(expr("(1000000 * n_chars) div size(toks)"))
            .cast(LongType).as("chars_per_token_ppm"),
          conv(substring(md5(concat_ws("\u0001", col("toks"))), 1, 8), 16, 10)
            .cast(LongType).as("token_digest"))
        .orderBy("doc_id")
  }

  /** [[TextAnalysis.gopherRules]] as a graded entry: the standard
    * pre-training quality GATE (Gopher §A1.1 shape) — per-rule flags +
    * combined keep. Distinct from q26 (a 0-3 score) and q56 (the raw
    * repetition signals): this is the decision layer, and its engine
    * side runs shuffle-free (the oracle's window/groupBy CTEs replicate
    * the semantics, not the plan).
    */
  val q115_gopher_rules: QueryDef = q(
    "q115_gopher_rules",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |base AS (
      |  SELECT doc_id,
      |    CAST(len(ws) AS BIGINT) AS n_words,
      |    CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS char_sum,
      |    CAST(len(list_filter(ws, x -> regexp_matches(x, '\p{L}'))) AS BIGINT) AS n_alpha,
      |    CAST(len(list_filter(ws, x -> x IN ('the','and','of','to','in'))) AS BIGINT) AS n_stop
      |  FROM t),
      |tok AS (
      |  SELECT doc_id,
      |    generate_subscripts(string_split(text, ' '), 1) AS i,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS bg
      |  FROM tok),
      |bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg WHERE bg IS NOT NULL
      |  GROUP BY doc_id, bg),
      |top AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg FROM bc GROUP BY doc_id)
      |SELECT b.doc_id, b.n_words, b.char_sum, b.n_alpha, b.n_stop,
      |  CAST(COALESCE(t.top_c, 0) AS BIGINT) AS top_bigram_cnt,
      |  CAST(COALESCE(t.n_bg, 0) AS BIGINT) AS n_bigrams,
      |  CAST(CASE WHEN b.n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_words,
      |  CAST(CASE WHEN 3 * b.n_words <= b.char_sum AND b.char_sum <= 10 * b.n_words
      |       THEN 1 ELSE 0 END AS BIGINT) AS r_mean_len,
      |  CAST(CASE WHEN 5 * b.n_alpha >= 4 * b.n_words THEN 1 ELSE 0 END AS BIGINT) AS r_alpha,
      |  CAST(CASE WHEN b.n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
      |  CAST(CASE WHEN COALESCE(t.n_bg, 0) = 0
      |        OR 5 * COALESCE(t.top_c, 0) <= COALESCE(t.n_bg, 0)
      |       THEN 1 ELSE 0 END AS BIGINT) AS r_rep,
      |  CAST(CASE WHEN b.n_words BETWEEN 50 AND 100000
      |        AND 3 * b.n_words <= b.char_sum AND b.char_sum <= 10 * b.n_words
      |        AND 5 * b.n_alpha >= 4 * b.n_words
      |        AND b.n_stop >= 2
      |        AND (COALESCE(t.n_bg, 0) = 0
      |          OR 5 * COALESCE(t.top_c, 0) <= COALESCE(t.n_bg, 0))
      |       THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id
      |ORDER BY b.doc_id""".stripMargin,
    "Gopher-style quality rule gate: 5 integer-exact rule flags + keep, " +
      "computed shuffle-free per row (array max-run repetition)") { (s, d) =>
    TextAnalysis.gopherRules(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** [[TextAnalysis.bpePairCounts]]: the symbol-pair counting step of
    * BPE tokenizer training. Complements q112 (which APPLIES a fixed
    * pre-tokenizer): this is the op that TRAINS one. The top-20 gate is
    * deterministic — ties break on the pair string.
    */
  val q118_bpe_pair_counts: QueryDef = q(
    "q118_bpe_pair_counts",
    """WITH wf AS (
      |  SELECT w, COUNT(*) AS f FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      |  WHERE w <> '' GROUP BY w),
      |pr AS (
      |  SELECT substr(w, CAST(i AS INT), 2) AS pair, f
      |  FROM (SELECT w, f, unnest(range(1, length(w))) AS i FROM wf) t)
      |SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt
      |FROM pr GROUP BY pair
      |ORDER BY cnt DESC, pair
      |LIMIT 20""".stripMargin,
    "BPE vocab induction, merge step 0: frequency-weighted adjacent " +
      "char-pair counts over the distinct-word table (corpus touched " +
      "once; pair stage is vocabulary-sized)") { (s, d) =>
    TextAnalysis.bpePairCounts(Tables.documents(s, d), "text", topK = 20)
  }

  /** Unrolled BPE training rounds for the q128 oracle: each round r
    * materializes pair counts over the round-(r-1) segmentation, the
    * top-1 pair (cnt DESC, then pair — bit-identical to the engine's
    * ordering on ASCII), the re-segmented vocab via the same greedy
    * left-to-right `list_reduce` fold the engine runs (DuckDB list
    * slicing is inclusive at the negative end, hence `acc[:len(acc)-1]`),
    * and a 1-row stats frame. AS MATERIALIZED on s$r and t$r: s$r is
    * read by pc$(r+1), s$(r+1) AND two stat subqueries — an inlining
    * planner would re-run the fold chain exponentially (the q121
    * lesson).
    */
  private def bpeRoundSql(rounds: Int): String =
    (1 to rounds).map { r =>
      s"""pc$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b, SUM(f) AS cnt
         |  FROM (SELECT f, syms, unnest(range(1, len(syms))) AS i
         |        FROM s${r - 1}) t
         |  GROUP BY 1, 2),
         |t$r AS MATERIALIZED (
         |  SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM pc$r
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |s$r AS MATERIALIZED (
         |  SELECT w, f, list_reduce(list_transform(syms, s -> list_value(s)),
         |    (acc, x) -> CASE WHEN acc[-1] = t$r.a AND x[1] = t$r.b
         |                THEN list_slice(acc, 1, len(acc) - 1)
         |                     || list_value(acc[-1] || x[1])
         |                ELSE acc || x END) AS syms
         |  FROM s${r - 1}, t$r),
         |st$r AS (
         |  SELECT CAST($r AS BIGINT) AS merge_round,
         |    (SELECT a FROM t$r) AS a, (SELECT b FROM t$r) AS b,
         |    (SELECT cnt FROM t$r) AS pair_cnt,
         |    (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT)
         |     FROM (SELECT unnest(syms) AS sym FROM s$r)) AS n_symbols,
         |    (SELECT CAST(SUM(f * len(syms)) AS BIGINT) FROM s$r)
         |      AS n_tokens)""".stripMargin
    }.mkString(",\n")

  /** [[TextAnalysis.bpeTrain]]: the FULL iterative BPE tokenizer trainer
    * — q118 is its first pair-count step; this runs the whole
    * select-merge-recount loop for 6 rounds and value-checks every merge
    * rule, its count, and the post-merge vocab size / corpus token count
    * against an oracle that unrolls the identical greedy fold per round.
    */
  /** Shared CTE prefix of the q128/q132 oracles: word frequencies and
    * the round-0 per-character segmentation, `w` carried so the encode
    * oracle can join documents back to their trained segmentation.
    */
  private val bpePrefixSql: String =
    """WITH wf AS MATERIALIZED (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      |  WHERE w <> '' GROUP BY w),
      |s0 AS MATERIALIZED (
      |  SELECT w, f, list_transform(range(1, length(w) + 1),
      |           i -> substr(w, CAST(i AS INT), 1)) AS syms
      |  FROM wf),
      |""".stripMargin

  val q128_bpe_train: QueryDef = q(
    "q128_bpe_train",
    bpePrefixSql + bpeRoundSql(6) + "\n" +
      (1 to 6).map(r => s"SELECT * FROM st$r").mkString("", "\nUNION ALL\n",
        "\nORDER BY merge_round"),
    "Full BPE vocab induction: 6 select-merge-recount rounds over the " +
      "distinct-word table (corpus touched once; rounds are vocab-sized)") {
    (s, d) =>
      // the training run is the shared CorpusBuilds artifact q132 encodes
      // with — one trainer execution serves both queries
      TextAnalysis.statsFrame(s, CorpusBuilds.documentsBpe(s, d, 6)._1)
  }

  /** [[TextAnalysis.bpeEncode]] — the APPLY side of q128's trainer: the
    * corpus tokenized with its own trained 6-merge vocab, per-document
    * word/char/BPE-token counts. The token accounting a training budget
    * runs with its REAL tokenizer instead of a whitespace proxy; the
    * oracle re-trains through the shared unrolled rounds (w carried) and
    * joins documents back to the final segmentation.
    */
  val q132_bpe_encode: QueryDef = q(
    "q132_bpe_encode",
    bpePrefixSql + bpeRoundSql(6) + ",\n" +
      """tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents)
        |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(length(t.w)) AS BIGINT) AS n_chars,
        |  CAST(SUM(len(s.syms)) AS BIGINT) AS n_bpe_tokens
        |FROM tok t JOIN s6 s ON s.w = t.w
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "BPE encode with the trained vocab: per-doc word/char/BPE-token " +
      "counts — segmentation computed once per distinct word, then a " +
      "hash join + per-doc aggregate") { (s, d) =>
    TextAnalysis.bpeEncodeWith(Tables.documents(s, d), "doc_id", "text",
        CorpusBuilds.documentsBpe(s, d, 6)._2)
      .orderBy("doc_id")
  }

  /** Unicode NFC normalization via the native `graft_nfc` expression
    * (graft.functions.NfcNormalize — the third custom codegen expression):
    * decomposed sequences must hash identically to their precomposed
    * forms before any dedup/fingerprint stage. The corpus text is ASCII,
    * where NFC is the identity, so each doc gets a mixed-form suffix
    * appended IN THE QUERY — "e"+U+0301, "o"+U+0308 (decomposed) and
    * U+00E9 (precomposed) — making the normalization observable: length
    * shrinks by exactly the two combining marks and the md5 is taken over
    * composed UTF-8 in both engines (DuckDB runs its own
    * `nfc_normalize`, so the oracle checks real cross-engine Unicode
    * agreement, not a replayed formula).
    */
  val q125_nfc_normalize: QueryDef = q(
    "q125_nfc_normalize",
    // the combining accents ride as literal UTF-8 chars, not chr(): Spark's
    // chr() is bytewise (chr(769) = chr(769 % 256)) where DuckDB's is a
    // code-point constructor — the literal spelling means one text for both
    s"""SELECT doc_id,
      |  CAST(length(t) AS BIGINT) AS n_before,
      |  CAST(length(nfc_normalize(t)) AS BIGINT) AS n_after,
      |  md5(nfc_normalize(t)) AS norm_hash
      |FROM (SELECT doc_id,
      |        text || ' mixed:e${"́"}o${"̈"}${"é"}' AS t
      |      FROM documents) x
      |ORDER BY doc_id""".stripMargin,
    "Unicode NFC normalization (native graft_nfc codegen expression) — " +
      "decomposed/precomposed forms converge, cross-engine value oracle") {
    (s, d) =>
      org.apache.spark.sql.GraftRegistrar.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("text"), lit(" mixed:e\u0301o\u0308\u00e9")).as("t"))
        .select(col("doc_id"),
          length(col("t")).cast(LongType).as("n_before"),
          length(expr("graft_nfc(t)")).cast(LongType).as("n_after"),
          md5(expr("graft_nfc(t)")).as("norm_hash"))
        .orderBy("doc_id")
  }

  /** [[graft.ops.TextAnalysis.wordPmi]] over the documents corpus: top-50
    * adjacent-pair collocations by exact floor-ppm PMI ratio (min pair
    * count 5). The oracle rebuilds the identical bigram table (lag-window
    * adjacency over the raw split positions, empties filtered after),
    * marginals, and DECIMAL product — any drift in adjacency, marginal
    * choice, or overflow handling hash-fails.
    */
  val q166_word_pmi: QueryDef = q(
    "q166_word_pmi",
    """WITH tok AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |big AS (
      |  SELECT w AS a, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS b
      |  FROM tok),
      |bigf AS (SELECT a, b FROM big
      |         WHERE a <> '' AND b IS NOT NULL AND b <> ''),
      |pc AS (SELECT a, b, COUNT(*) AS c_ab FROM bigf GROUP BY a, b
      |       HAVING COUNT(*) >= 5),
      |la AS (SELECT a, COUNT(*) AS c_a FROM bigf GROUP BY a),
      |rb AS (SELECT b, COUNT(*) AS c_b FROM bigf GROUP BY b),
      |tot AS (SELECT COUNT(*) AS n_big FROM bigf)
      |SELECT a, b, c_ab,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * (SELECT n_big FROM tot) * c_ab)
      |    / (c_a * c_b)) AS BIGINT) AS BIGINT) AS pmi_ppm
      |FROM pc JOIN la USING (a) JOIN rb USING (b)
      |ORDER BY pmi_ppm DESC, a, b
      |LIMIT 50""".stripMargin,
    "Adjacent-pair PMI collocations (exact floor-ppm ratio, DECIMAL(38) " +
      "products): top-50, marginals and adjacency replayed by the oracle") {
    (s, d) =>
      TextAnalysis.wordPmi(Tables.documents(s, d), "doc_id", "text", minCount = 5)
        .orderBy(col("pmi_ppm").desc, col("a"), col("b"))
        .limit(50)
  }

  /** [[TextAnalysis.bm25TopK]]: BM25-shape keyword retrieval with every
    * transcendental replaced by an exact rational (idf → the
    * (2N−2df+1)/(2df+1) argument itself; k1=6/5, b=3/4 cleared of
    * denominators), so the relevance ranking is a zero-tolerance integer
    * oracle rather than a float-tolerance gate. The query = the corpus's
    * 3 most frequent ≥6-char tokens (deterministic, (cnt DESC, w)
    * tie-broken), the answer = the 20 highest-scoring docs.
    */
  val q183_bm25_scoring: QueryDef = q(
    "q183_bm25_scoring",
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
      |  FROM documents),
      |dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
      |tot AS (SELECT count(*) AS n_docs, sum(dl) AS a_tokens FROM dl),
      |terms AS MATERIALIZED (
      |  SELECT w FROM toks WHERE length(w) >= 6
      |  GROUP BY w ORDER BY count(*) DESC, w LIMIT 3),
      |tf AS MATERIALIZED (
      |  SELECT t.doc_id, t.w, count(*) AS tf
      |  FROM toks t JOIN terms USING (w) GROUP BY t.doc_id, t.w),
      |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      |sc AS (
      |  SELECT tf.doc_id, sum(
      |    CAST(floor((CAST(1000000 AS DECIMAL(38,0)) *
      |       (2 * (SELECT n_docs FROM tot) - 2 * dfx.df + 1) * 22 *
      |       (SELECT a_tokens FROM tot) * tf.tf) /
      |    ((CAST(2 AS DECIMAL(38,0)) * dfx.df + 1) *
      |       (CAST(10 AS DECIMAL(38,0)) * (SELECT a_tokens FROM tot) * tf.tf +
      |        3 * (SELECT a_tokens FROM tot) +
      |        CAST(9 AS DECIMAL(38,0)) * dl.dl * (SELECT n_docs FROM tot)))) AS BIGINT)) AS score
      |  FROM tf
      |  JOIN dfx ON dfx.w = tf.w
      |  JOIN dl ON dl.doc_id = tf.doc_id
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, CAST(score AS BIGINT) AS score_ppm
      |FROM sc ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin,
    "BM25-shape keyword relevance (exact rational idf + Robertson tf " +
      "saturation, floor-ppm per term): top-20 docs, zero-tolerance oracle") {
    (s, d) =>
      TextAnalysis.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        nTerms = 3, minTermLen = 6, k = 20)
  }

  /** RAKE keyword extraction (Rose et al., 2010): candidate phrases are
    * the maximal stopword-free token runs, each word scores
    * deg(w)/freq(w) — deg = Σ length of every phrase the word occurs in,
    * freq = its occurrence count — and a phrase scores the sum of its
    * words' scores. The scoring is made integer-exact by flooring each
    * word score to ppm BEFORE the phrase sum (pinned semantics both
    * engines). Phrase segmentation = one running stopword count per doc
    * (doc-bounded window), so identical phrase ids fall out of identical
    * token orders; word stats are two corpus-wide map-side-combined
    * aggs. Top-20 distinct phrases by (score, phrase).
    */
  val q195_rake_keywords: QueryDef = q(
    "q195_rake_keywords",
    """WITH toks AS (
      |  SELECT doc_id, i, w, CASE WHEN w IN ('a', 'the') THEN 1 ELSE 0 END AS stop
      |  FROM (
      |    SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
      |      unnest(string_split(text, ' ')) AS w
      |    FROM documents)
      |  WHERE w <> ''),
      |seg AS (
      |  SELECT doc_id, i, w, stop,
      |    sum(stop) OVER (PARTITION BY doc_id ORDER BY i) AS pid
      |  FROM toks),
      |pw AS (SELECT doc_id, pid, i, w FROM seg WHERE stop = 0),
      |ph AS MATERIALIZED (
      |  SELECT doc_id, pid, string_agg(w, ' ' ORDER BY i) AS phrase,
      |    count(*) AS plen
      |  FROM pw GROUP BY doc_id, pid),
      |wstat AS MATERIALIZED (
      |  SELECT pw.w, count(*) AS freq, CAST(sum(ph.plen) AS BIGINT) AS deg
      |  FROM pw JOIN ph ON ph.doc_id = pw.doc_id AND ph.pid = pw.pid
      |  GROUP BY pw.w),
      |wsc AS (
      |  SELECT w, CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * deg) / freq) AS BIGINT) AS ws
      |  FROM wstat),
      |psc AS (
      |  SELECT ph.doc_id, ph.pid, ph.phrase,
      |    CAST(sum(wsc.ws) AS BIGINT) AS score_ppm
      |  FROM pw
      |  JOIN ph ON ph.doc_id = pw.doc_id AND ph.pid = pw.pid
      |  JOIN wsc ON wsc.w = pw.w
      |  GROUP BY 1, 2, 3)
      |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
      |  max(score_ppm) AS score_ppm
      |FROM psc GROUP BY phrase
      |ORDER BY score_ppm DESC, phrase LIMIT 20""".stripMargin,
    "RAKE keyword extraction: stopword-split phrases, deg/freq word " +
      "scores floored to ppm, top-20 phrases — zero-tolerance oracle") {
    (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("i")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
        .filter(col("w") =!= "")
        .withColumn("stop", when(col("w").isin("a", "the"), 1L).otherwise(0L))
      val seg = toks.withColumn("pid", sum("stop").over(w))
      // Ckpt.stage, not persist: pw feeds three subtrees and ph two, but
      // the result is lazy — persisted blocks had no unpersist point and
      // leaked across executions (GC reclaims local-checkpoint blocks;
      // the reliable path needs cleanCheckpoints=true — Ckpt.stage warns)
      val pw = graft.ops.Ckpt.stage(seg.filter(col("stop") === 0L)
        .select("doc_id", "pid", "i", "w"))
      val ph = graft.ops.Ckpt.stage(pw.groupBy("doc_id", "pid")
        .agg(concat_ws(" ", transform(
            sort_array(collect_list(struct(col("i"), col("w")))),
            e => e("w"))).as("phrase"),
          count(lit(1)).as("plen")))
      val wstat = pw.join(ph, Seq("doc_id", "pid"))
        .groupBy("w").agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      val wsc = wstat.select(col("w"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * deg) div freq").as("ws"))
      val psc = pw.join(ph, Seq("doc_id", "pid")).join(wsc, Seq("w"))
        .groupBy("doc_id", "pid", "phrase")
        .agg(sum("ws").cast(LongType).as("score_ppm"))
      psc.groupBy("phrase")
        .agg(count(lit(1)).as("n_occurrences"), max("score_ppm").as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("phrase"))
        .limit(20)
  }

  /** Dataset card — the corpus-level release report (metric, value)
    * every published training set ships with: cardinalities, language/
    * source diversity, size totals, exact-duplicate pressure, short-doc
    * rate, and top-language share, each a replayable exact integer. One
    * doc-level aggregation pass + one md5 duplicate-group agg + one
    * language-count agg, unioned into the bounded report frame.
    */
  val q213_dataset_card: QueryDef = q(
    "q213_dataset_card",
    """WITH base AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |    CAST(sum(len(regexp_extract_all(text, '(\S+)', 1))) AS BIGINT)
      |      AS total_tokens,
      |    CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_short
      |  FROM documents),
      |dup AS (
      |  SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_dup_docs
      |  FROM (SELECT md5(text) AS h, count(*) AS c FROM documents
      |        GROUP BY 1) g WHERE c >= 2),
      |toplang AS (
      |  SELECT CAST(max(c) AS BIGINT) AS top_lang_docs
      |  FROM (SELECT lang, count(*) AS c FROM documents GROUP BY 1))
      |SELECT metric, value FROM (
      |  SELECT 'n_docs' AS metric, n_docs AS value FROM base
      |  UNION ALL SELECT 'n_langs', n_langs FROM base
      |  UNION ALL SELECT 'n_sources', n_sources FROM base
      |  UNION ALL SELECT 'total_chars', total_chars FROM base
      |  UNION ALL SELECT 'total_tokens', total_tokens FROM base
      |  UNION ALL SELECT 'short_doc_ppm',
      |    CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * n_short) / n_docs) AS BIGINT) AS BIGINT)
      |  FROM base
      |  UNION ALL SELECT 'exact_dup_ppm',
      |    CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * (SELECT n_dup_docs FROM dup))
      |      / n_docs) AS BIGINT) AS BIGINT) FROM base
      |  UNION ALL SELECT 'top_lang_share_ppm',
      |    CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * (SELECT top_lang_docs FROM toplang))
      |      / n_docs) AS BIGINT) AS BIGINT) FROM base)
      |ORDER BY metric""".stripMargin,
    "Dataset card: corpus release report (metric, value) — counts, " +
      "diversity, size, duplicate pressure, all exact integers") { (s, d) =>
    val docs = Tables.documents(s, d)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct("lang").as("n_langs"),
      countDistinct("source").as("n_sources"),
      sum("n_chars").cast(LongType).as("total_chars"),
      sum(size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))))
        .cast(LongType).as("total_tokens"),
      sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("n_short"))
    val dup = docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .agg(coalesce(sum("c"), lit(0L)).cast(LongType).as("n_dup_docs"))
    val topl = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .agg(max("c").as("top_lang_docs"))
    val rep = base.crossJoin(broadcast(dup)).crossJoin(broadcast(topl))
    def row(name: String, c: Column) =
      rep.select(lit(name).as("metric"), c.cast(LongType).as("value"))
    row("n_docs", col("n_docs"))
      .unionAll(row("n_langs", col("n_langs")))
      .unionAll(row("n_sources", col("n_sources")))
      .unionAll(row("total_chars", col("total_chars")))
      .unionAll(row("total_tokens", col("total_tokens")))
      .unionAll(row("short_doc_ppm",
        expr("(CAST(1000000 AS DECIMAL(38,0)) * n_short) div n_docs")))
      .unionAll(row("exact_dup_ppm",
        expr("(CAST(1000000 AS DECIMAL(38,0)) * n_dup_docs) div n_docs")))
      .unionAll(row("top_lang_share_ppm",
        expr("(CAST(1000000 AS DECIMAL(38,0)) * top_lang_docs) div n_docs")))
      .orderBy("metric")
  }

  /** All-pairs document similarity via the INVERTED-INDEX join (the
    * Bayardo/Ma/Srikant all-pairs-similarity shape): per-(doc, shingle)
    * integer idf weights — idf as the exact rational ⌈10⁶/df⌉ — and pair
    * dot products generated ONLY through shared DISCRIMINATIVE shingles
    * (2 ≤ df ≤ 64; a unit in every doc carries no pair signal and would
    * explode the join — the q192 hub-cap rule on the term dimension;
    * df = 1 pairs with nothing and is pruned before the join). The unit
    * is the WORD 3-SHINGLE, not the word: the round-12 probe caught the
    * word form silently emptying at sf0.1 — the synthetic vocabulary is
    * 31 words, every one past any sane df cap — while the shingle
    * domain (27k units at sf0.1, max df 25) discriminates at every
    * scale, exactly why near-dup systems index shingles. Pair space is
    * bounded by Σ_{df≤cap} df², every product DECIMAL(38)-guarded,
    * top-20 pairs by exact integer dot.
    */
  val q229_sparse_cosine_pairs: QueryDef = q(
    "q229_sparse_cosine_pairs",
    graft.ops.DedupQueries.shinglesSql +
      """,
        |dfx AS (
        |  SELECT sh, CAST(count(*) AS BIGINT) AS df
        |  FROM sh GROUP BY sh HAVING count(*) BETWEEN 2 AND 64),
        |wt AS (
        |  SELECT s.doc_id, s.sh, CAST(floor((1000000 + d.df - 1) / d.df) AS BIGINT) AS wgt
        |  FROM sh s JOIN dfx d ON d.sh = s.sh),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b,
        |    CAST(sum(CAST(a.wgt AS DECIMAL(38,0)) * b.wgt) AS BIGINT) AS dot
        |  FROM wt a JOIN wt b ON b.sh = a.sh AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, dot FROM pairs
        |ORDER BY dot DESC, a, b LIMIT 20""".stripMargin,
    "All-pairs doc similarity: inverted-index join over df-capped word " +
      "3-shingles (2<=df<=64), exact integer idf dots, top-20") { (s, d) =>
    val sh = graft.ops.DedupQueries.shingles(Tables.documents(s, d))
      .select("doc_id", "sh")
    val dfx = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 64))
    val wt = sh.join(dfx, Seq("sh"))
      .select(col("doc_id"), col("sh"),
        expr("(1000000 + df - 1) div df").as("wgt"))
    wt.select(col("sh"), col("doc_id").as("a"), col("wgt").as("wa"))
      .join(wt.select(col("sh"), col("doc_id").as("b"), col("wgt").as("wb")),
        Seq("sh"))
      .filter(col("b") > col("a"))
      .groupBy("a", "b")
      .agg(sum(col("wa").cast(DecimalType(38, 0)) * col("wb"))
        .cast(LongType).as("dot"))
      .orderBy(col("dot").desc, col("a"), col("b"))
      .limit(20)
  }

  /** Reciprocal-rank fusion (RRF, the Cormack/Clarke/Büttcher hybrid-
    * retrieval standard) — how a pipeline combines rankings from
    * retrievers whose SCORES are incomparable (BM25 floats vs cosine vs
    * priors): each retriever contributes 1/(60+rank), ranks only. Here
    * the two fused signals are a length prior (n_chars DESC) and a
    * lexical-diversity ranking (distinct-word ratio, exact floor-ppm),
    * each cut at retriever depth 100; the fusion is a full-outer join of
    * two RANK LISTS (depth-bounded — never corpus-sized) with the
    * transcendental-free contribution floor(10⁶/(60+rank)), so every
    * score is an exact integer both engines replay. Ties broken by
    * doc_id everywhere; missing-from-one-list contributes zero.
    */
  val q237_rank_fusion: QueryDef = q(
    "q237_rank_fusion",
    """WITH stats AS (
      |  SELECT doc_id, n_chars,
      |    CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * count(DISTINCT w)) / count(*)) AS BIGINT)
      |      AS BIGINT) AS div_ppm
      |  FROM (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS w
      |        FROM documents) t
      |  WHERE w <> ''
      |  GROUP BY doc_id, n_chars),
      |ra AS (
      |  SELECT doc_id, r FROM (
      |    SELECT doc_id, CAST(row_number() OVER (
      |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS r
      |    FROM stats) t WHERE r <= 100),
      |rb AS (
      |  SELECT doc_id, r FROM (
      |    SELECT doc_id, CAST(row_number() OVER (
      |      ORDER BY div_ppm DESC, doc_id) AS BIGINT) AS r
      |    FROM stats) t WHERE r <= 100),
      |fused AS (
      |  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
      |    COALESCE(CAST(floor(1000000 / (60 + ra.r)) AS BIGINT), 0)
      |      + COALESCE(CAST(floor(1000000 / (60 + rb.r)) AS BIGINT), 0) AS rrf_ppm
      |  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id)
      |SELECT doc_id, CAST(rrf_ppm AS BIGINT) AS rrf_ppm
      |FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT 20""".stripMargin,
    "Reciprocal-rank fusion of two retriever rankings (length prior + " +
      "lexical diversity, depth 100): exact integer 1/(60+rank) " +
      "contributions, top-20") { (s, d) =>
    val stats = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "n_chars")
      .agg(expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * count(DISTINCT w))" +
        " div count(1) AS BIGINT)").as("div_ppm"))
    def rankList(order: Column): org.apache.spark.sql.DataFrame = stats
      .orderBy(order, col("doc_id")).limit(100)
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(order, col("doc_id"))).cast(LongType))
      .select("doc_id", "r")
    val ra = rankList(col("n_chars").desc)
      .withColumnRenamed("r", "ra")
    val rb = rankList(col("div_ppm").desc)
      .withColumnRenamed("r", "rb")
    ra.join(rb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(expr("1000000 div (60 + ra)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rb)"), lit(0L))).as("rrf_ppm"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
      .limit(20)
  }

  /** Interpolated Kneser–Ney bigram probabilities in EXACT RATIONALS —
    * the n-gram LM estimate (KenLM's default) with the D = 3/4 absolute
    * discount cleared of denominators:
    * `p(b|a) = (c_ab − D)⁺/c_a + D·N1f(a)/c_a · N1b(b)/|B|`, reported as
    * `⌊10⁶·((4·c_ab − 3)⁺·|B| + 3·N1f(a)·N1b(b)) / (4·c_a·|B|)⌋` — one
    * integer expression both engines replay bit-for-bit (the float form
    * diverges in the last ulp across sum orders). Scale shape: the corpus
    * collapses to the bigram-TYPE table first (one map-side-combinable
    * agg); marginals c_a = Σ_b c_ab, the continuation counts N1f/N1b, and
    * |B| are all aggregates OVER THE TYPE TABLE (aggregate-sized, never
    * re-scanning rows); products carry DECIMAL(38)/HUGEINT guards
    * (Association.lift_ppm's rule — c_ab·|B| wraps BIGINT at 100 TB).
    */
  val q248_kn_bigram: QueryDef = q(
    "q248_kn_bigram",
    """WITH tok AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |big AS (
      |  SELECT w AS a, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS b
      |  FROM tok),
      |bigf AS (SELECT a, b FROM big
      |         WHERE a <> '' AND b IS NOT NULL AND b <> ''),
      |pc AS (SELECT a, b, COUNT(*) AS c_ab FROM bigf GROUP BY a, b),
      |ca AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a,
      |         COUNT(*) AS n1f FROM pc GROUP BY a),
      |nb AS (SELECT b, COUNT(*) AS n1b FROM pc GROUP BY b),
      |tot AS (SELECT COUNT(*) AS n_types FROM pc)
      |SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab, c_a,
      |  CAST(n1f AS BIGINT) AS n1f, CAST(n1b AS BIGINT) AS n1b,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) *
      |        (CAST(greatest(4 * c_ab - 3, 0) AS DECIMAL(38,0)) * n_types +
      |         CAST(3 AS DECIMAL(38,0)) * n1f * n1b))
      |    / (CAST(4 AS DECIMAL(38,0)) * c_a * n_types)) AS BIGINT) AS BIGINT) AS p_kn_ppm
      |FROM pc JOIN ca USING (a) JOIN nb USING (b), tot
      |ORDER BY c_ab DESC, a, b
      |LIMIT 50""".stripMargin,
    "Kneser-Ney bigram LM estimates (D=3/4, continuation counts) in " +
      "exact floor-ppm rationals; marginals from the type table, top-50") {
    (s, d) =>
      val wdoc = Window.partitionBy("doc_id").orderBy("i")
      val tok = Tables.documents(s, d).select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("i", "w")))
      val bigf = tok.withColumn("b", lead("w", 1).over(wdoc))
        .filter(col("w") =!= "" && col("b").isNotNull && col("b") =!= "")
        .select(col("w").as("a"), col("b"))
      val pc = bigf.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val ca = pc.groupBy("a")
        .agg(sum("c_ab").cast(LongType).as("c_a"), count(lit(1)).as("n1f"))
      val nb = pc.groupBy("b").agg(count(lit(1)).as("n1b"))
      val types = pc.agg(count(lit(1)).as("n_types"))
      pc.join(ca, Seq("a")).join(nb, Seq("b"))
        .crossJoin(broadcast(types))
        .select(col("a"), col("b"), col("c_ab").cast(LongType).as("c_ab"),
          col("c_a"), col("n1f").cast(LongType).as("n1f"),
          col("n1b").cast(LongType).as("n1b"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * " +
            "(CAST(greatest(4 * c_ab - 3, 0) AS DECIMAL(38,0)) * n_types + " +
            "CAST(3 AS DECIMAL(38,0)) * n1f * n1b)) div " +
            "(CAST(4 AS DECIMAL(38,0)) * c_a * n_types) AS BIGINT)")
            .as("p_kn_ppm"))
        .orderBy(col("c_ab").desc, col("a"), col("b"))
        .limit(50)
  }

  /** Vocabulary COVERAGE curve — the tokenizer-design metric (how much of
    * the corpus does a size-N word vocabulary cover?): exact floor-ppm
    * coverage at N ∈ {100, 1000, 10000}. Scale shape: word counts are one
    * map-side-combinable agg; the candidate vocab is a distributed TopK
    * (`orderBy(cnt).limit(10000)` — take-ordered, NO corpus-sized sort);
    * the rank window runs above that bounded 10⁴-row frame (q237's
    * allowlisted shape); coverage is three conditional sums unpivoted by
    * `stack`. The 10⁶ product is DECIMAL(38)-guarded (covered ≈ total
    * tokens ≈ 10¹⁴ at 100 TB wraps BIGINT).
    */
  val q249_vocab_coverage: QueryDef = q(
    "q249_vocab_coverage",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wc AS (SELECT w, COUNT(*) AS cnt FROM tok WHERE w <> '' GROUP BY w),
      |top AS (SELECT w, cnt,
      |          row_number() OVER (ORDER BY cnt DESC, w) AS rk FROM wc),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM wc),
      |cov AS (SELECT
      |  CAST(SUM(CASE WHEN rk <= 100 THEN cnt ELSE 0 END) AS BIGINT) AS c100,
      |  CAST(SUM(CASE WHEN rk <= 1000 THEN cnt ELSE 0 END) AS BIGINT) AS c1000,
      |  CAST(SUM(CASE WHEN rk <= 10000 THEN cnt ELSE 0 END) AS BIGINT) AS c10000
      |  FROM top)
      |SELECT n_vocab, covered, total,
      |  CAST(CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * covered) / total) AS BIGINT) AS BIGINT)
      |    AS coverage_ppm
      |FROM (SELECT CAST(unnest(list_value(100, 1000, 10000)) AS BIGINT) AS n_vocab,
      |             unnest(list_value(c100, c1000, c10000)) AS covered FROM cov), tot
      |ORDER BY n_vocab""".stripMargin,
    "Vocabulary coverage curve at N in {100, 1000, 10000}: distributed " +
      "TopK vocab, bounded rank window, exact floor-ppm coverage") {
    (s, d) =>
      val tok = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val wc = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
      val top = wc.orderBy(col("cnt").desc, col("w")).limit(10000)
      val wr = Window.orderBy(col("cnt").desc, col("w"))
      val tot = wc.agg(sum("cnt").cast(LongType).as("total"))
      top.withColumn("rk", row_number().over(wr))
        .agg(
          sum(when(col("rk") <= 100, col("cnt")).otherwise(0L))
            .cast(LongType).as("c100"),
          sum(when(col("rk") <= 1000, col("cnt")).otherwise(0L))
            .cast(LongType).as("c1000"),
          sum(when(col("rk") <= 10000, col("cnt")).otherwise(0L))
            .cast(LongType).as("c10000"))
        .crossJoin(broadcast(tot))
        .select(expr("stack(3, 100L, c100, 1000L, c1000, 10000L, c10000) " +
          "AS (n_vocab, covered)"), col("total"))
        .select(col("n_vocab"), col("covered"), col("total"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * covered) div total " +
            "AS BIGINT)").as("coverage_ppm"))
        .orderBy("n_vocab")
  }

  /** Exact PHRASE search over a positional inverted index — the boolean
    * retrieval primitive the ranked family (q183 BM25, q237 RRF) lacks:
    * "these tokens, adjacent, in this order". The engine plan IS the
    * inverted-index plan a search system runs at 100 TB: one positional
    * posting list (doc_id, pos, term) built in a single codegen pass,
    * one broadcast join against the tiny phrase-terms table, and a
    * two-level hash agg — a posting matches phrase occurrence `anchor =
    * pos − offset` iff all `len` offsets land (count of distinct
    * offsets per (phrase, doc, anchor) = phrase length). No self-join
    * of the posting list per phrase word, no per-phrase rescan;
    * OVERLAPPING occurrences count (token-adjacency semantics, which a
    * non-overlapping regex scan would undercount). The oracle rebuilds
    * the same adjacency join from generate_subscripts positions.
    */
  val q275_phrase_search: QueryDef = {
    val phrases = Seq("fast table", "table value", "value table part")
    val phraseRows = phrases.flatMap(p =>
      p.split(' ').zipWithIndex.map { case (t, i) => (p, i.toLong, t) })
    val oracleSql = {
      val phraseSel = phrases.map(p => s"('$p')").mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    generate_subscripts(string_split(text, ' '), 1) AS pos,
         |    unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |ph(phrase) AS (VALUES $phraseSel),
         |pt AS (
         |  SELECT phrase,
         |    generate_subscripts(string_split(phrase, ' '), 1) - 1 AS off,
         |    unnest(string_split(phrase, ' ')) AS term,
         |    len(string_split(phrase, ' ')) AS plen
         |  FROM ph),
         |m AS (
         |  SELECT pt.phrase, t.doc_id, t.pos - pt.off AS anchor,
         |    count(DISTINCT pt.off) AS nmatch, any_value(pt.plen) AS plen
         |  FROM toks t JOIN pt ON pt.term = t.w
         |  GROUP BY 1, 2, 3),
         |hit AS (SELECT phrase, doc_id FROM m WHERE nmatch = plen)
         |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM hit GROUP BY 1 ORDER BY phrase""".stripMargin
    }
    q("q275_phrase_search", oracleSql,
      "Positional inverted-index phrase search: broadcast phrase-term " +
        "join + anchor hash agg, overlapping token-adjacency counts, " +
        "no posting-list self-join") { (s, d) =>
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        // 1-based positions to match generate_subscripts; the +0L offset
        // subtraction below is position-shift-invariant anyway
        .select(col("doc_id"), (col("pos") + 1).cast(LongType).as("pos"),
          col("col").as("w"))
      val pt = phraseRows.toDF("phrase", "off", "term")
      val plens = phrases.map(p => p -> p.split(' ').length.toLong).toMap
      val plenCol = phrases.foldLeft(lit(-1L)) { (acc, p) =>
        when(col("phrase") === p, lit(plens(p))).otherwise(acc)
      }
      toks.join(broadcast(pt), col("w") === col("term"))
        .groupBy(col("phrase"), col("doc_id"),
          (col("pos") - col("off")).as("anchor"))
        .agg(countDistinct("off").as("nmatch"))
        .filter(col("nmatch") === plenCol)
        .groupBy("phrase")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct("doc_id").as("n_docs"))
        .orderBy("phrase")
    }
  }

  /** Persisted inverted-index lifecycle — [[TextIndex]]: build the
    * positional phrase index ONCE as a term-bucket-partitioned stored
    * artifact (the shared [[CorpusBuilds.documentsPhraseIndex]] build),
    * apply a doc insert+delete CDC batch — remove doc_id ≡ 3 (mod 7),
    * upsert doc_id ≡ 0 (mod 5) with " fast table value" appended —
    * rewriting ONLY touched term-bucket partitions (dynamic partition
    * overwrite; untouched-bucket mtimes pinned in OpsSpec), then serve
    * q275's phrase search FROM the standing post-update index. The
    * oracle rebuilds phrase search from scratch over the modified
    * document set, so a maintenance bug — stale removed postings,
    * duplicated upserts, a dropped bucket — is a value mismatch, not
    * just a row-count drift.
    */
  val q298_text_index_update: QueryDef = {
    val phrases = Seq("fast table", "table value", "value table part")
    val phraseSel = phrases.map(p => s"('$p')").mkString(", ")
    val oracleSql =
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 7 <> 3 AND doc_id % 5 <> 0
         |  UNION ALL
         |  SELECT doc_id, text || ' fast table value' AS text
         |  FROM documents WHERE doc_id % 5 = 0),
         |toks AS (
         |  SELECT doc_id,
         |    generate_subscripts(string_split(text, ' '), 1) AS pos,
         |    unnest(string_split(text, ' ')) AS w
         |  FROM docs),
         |ph(phrase) AS (VALUES $phraseSel),
         |pt AS (
         |  SELECT phrase,
         |    generate_subscripts(string_split(phrase, ' '), 1) - 1 AS off,
         |    unnest(string_split(phrase, ' ')) AS term,
         |    len(string_split(phrase, ' ')) AS plen
         |  FROM ph),
         |m AS (
         |  SELECT pt.phrase, t.doc_id, t.pos - pt.off AS anchor,
         |    count(DISTINCT pt.off) AS nmatch, any_value(pt.plen) AS plen
         |  FROM toks t JOIN pt ON pt.term = t.w
         |  GROUP BY 1, 2, 3),
         |hit AS (SELECT phrase, doc_id FROM m WHERE nmatch = plen)
         |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM hit GROUP BY 1 ORDER BY phrase""".stripMargin
    q("q298_text_index_update", oracleSql,
      "Persisted inverted text index + CDC maintenance: delta batch " +
        "rewrites only touched term-bucket partitions, phrase search " +
        "served from the standing index equals a from-scratch rebuild") {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val dir = CorpusBuilds.documentsPhraseIndex(s, d)
        val removed = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
        val added = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"),
            concat(col("text"), lit(" fast table value")).as("text"))
        TextIndex.updatePhraseIndex(s, dir, added, removed,
          "doc_id", "text")
        TextIndex.phraseSearch(s, dir, phrases)
          .select(col("phrase"),
            col("n_occurrences").cast(LongType).as("n_occurrences"),
            col("n_docs").cast(LongType).as("n_docs"))
    }
  }

  /** RANKED retrieval served FROM the standing inverted index — the
    * BM25 read path beside q298's boolean phrase search, completing the
    * index's query surface: tf/df come from ONLY the query terms'
    * bucket partitions (the same static pruning PlanAssertionSpec pins),
    * the per-doc length and corpus stats from the doc-count-sized
    * doclen sidecar, and the scoring is q183's exact-rational BM25
    * (k1 = 6/5, b = 3/4 cleared of denominators, floor-ppm per term).
    * The oracle replays the full computation from the raw corpus with
    * the index's own tokenization (split-on-space), so a stale posting,
    * wrong df, or drifted doclen is a value mismatch.
    */
  val q304_index_bm25: QueryDef = q(
    "q304_index_bm25",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |dl AS MATERIALIZED (
      |  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
      |tot AS (SELECT count(*) AS n_docs, sum(dl) AS a_tokens FROM dl),
      |terms(w) AS (VALUES ('fast'), ('table'), ('value')),
      |tf AS MATERIALIZED (
      |  SELECT t.doc_id, t.w, count(*) AS tf
      |  FROM toks t JOIN terms USING (w) GROUP BY t.doc_id, t.w),
      |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      |sc AS (
      |  SELECT tf.doc_id, sum(
      |    CAST(floor((CAST(1000000 AS DECIMAL(38,0)) *
      |       (2 * (SELECT n_docs FROM tot) - 2 * dfx.df + 1) * 22 *
      |       (SELECT a_tokens FROM tot) * tf.tf) /
      |    ((CAST(2 AS DECIMAL(38,0)) * dfx.df + 1) *
      |       (CAST(10 AS DECIMAL(38,0)) * (SELECT a_tokens FROM tot) * tf.tf +
      |        3 * (SELECT a_tokens FROM tot) +
      |        CAST(9 AS DECIMAL(38,0)) * dl.dl * (SELECT n_docs FROM tot)))) AS BIGINT)) AS score
      |  FROM tf
      |  JOIN dfx ON dfx.w = tf.w
      |  JOIN dl ON dl.doc_id = tf.doc_id
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, CAST(score AS BIGINT) AS score_ppm
      |FROM sc ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin,
    "BM25 top-20 served from the standing inverted index: bucket-pruned " +
      "tf/df, doclen sidecar stats, exact-rational floor-ppm scoring") {
    (s, d) =>
      val dir = CorpusBuilds.documentsPhraseIndexServe(s, d)
      TextIndex.bm25TopKFromIndex(s, dir, Seq("fast", "table", "value"),
        k = 20)
        .select(col("doc_id").cast(LongType).as("doc_id"), col("score_ppm"))
  }

  /** BM25 served from the POST-CDC index — q298's maintenance composed
    * with q304's ranked read path: apply q298's exact delta (idempotent,
    * so the shared standing index converges to the same state whichever
    * of q298/q306 runs first in a session) and rank from the updated
    * postings + doclen sidecar. The oracle recomputes BM25 from scratch
    * over the MODIFIED corpus, so a stale doclen row (the bug class the
    * sidecar's partition-local rewrite could hide), a surviving removed
    * posting, or a missed upsert shifts a score and hash-fails. The
    * upserted docs gain " fast table value", so the delta visibly
    * reshuffles the top-20 — the update cannot pass vacuously.
    */
  val q306_index_bm25_cdc: QueryDef = q(
    "q306_index_bm25_cdc",
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE doc_id % 7 <> 3 AND doc_id % 5 <> 0
      |  UNION ALL
      |  SELECT doc_id, text || ' fast table value' AS text
      |  FROM documents WHERE doc_id % 5 = 0),
      |toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM docs),
      |dl AS MATERIALIZED (
      |  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
      |tot AS (SELECT count(*) AS n_docs, sum(dl) AS a_tokens FROM dl),
      |terms(w) AS (VALUES ('fast'), ('table'), ('value')),
      |tf AS MATERIALIZED (
      |  SELECT t.doc_id, t.w, count(*) AS tf
      |  FROM toks t JOIN terms USING (w) GROUP BY t.doc_id, t.w),
      |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      |sc AS (
      |  SELECT tf.doc_id, sum(
      |    CAST(floor((CAST(1000000 AS DECIMAL(38,0)) *
      |       (2 * (SELECT n_docs FROM tot) - 2 * dfx.df + 1) * 22 *
      |       (SELECT a_tokens FROM tot) * tf.tf) /
      |    ((CAST(2 AS DECIMAL(38,0)) * dfx.df + 1) *
      |       (CAST(10 AS DECIMAL(38,0)) * (SELECT a_tokens FROM tot) * tf.tf +
      |        3 * (SELECT a_tokens FROM tot) +
      |        CAST(9 AS DECIMAL(38,0)) * dl.dl * (SELECT n_docs FROM tot)))) AS BIGINT)) AS score
      |  FROM tf
      |  JOIN dfx ON dfx.w = tf.w
      |  JOIN dl ON dl.doc_id = tf.doc_id
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, CAST(score AS BIGINT) AS score_ppm
      |FROM sc ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin,
    "BM25 from the CDC-updated standing index: q298's delta + q304's " +
      "read path, scored against a from-scratch oracle over the " +
      "modified corpus — stale doclen or surviving postings hash-fail") {
    (s, d) =>
      val docs = Tables.documents(s, d)
      val dir = CorpusBuilds.documentsPhraseIndex(s, d)
      val removed = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
      val added = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" fast table value")).as("text"))
      TextIndex.updatePhraseIndex(s, dir, added, removed,
        "doc_id", "text")
      TextIndex.bm25TopKFromIndex(s, dir, Seq("fast", "table", "value"),
        k = 20)
        .select(col("doc_id").cast(LongType).as("doc_id"), col("score_ppm"))
  }

  def defs: Seq[QueryDef] = Seq(
    q275_phrase_search, q298_text_index_update, q304_index_bm25,
    q306_index_bm25_cdc,
    q248_kn_bigram, q249_vocab_coverage,
    q183_bm25_scoring, q195_rake_keywords, q213_dataset_card,
    q229_sparse_cosine_pairs, q237_rank_fusion,
    q13_word_topk, q25_token_stats, q26_quality_score, q27_lang_guess,
    q36_doc_fingerprint, q34_binary_meta, q51_frame_meta,
    q56_repetition_metrics, q57_clean_redact, q85_lm_quality,
    q112_bpeish_tokens, q115_gopher_rules, q118_bpe_pair_counts,
    q125_nfc_normalize, q128_bpe_train, q132_bpe_encode, q166_word_pmi)
}
