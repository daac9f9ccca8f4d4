package graft.ops

import graft.QueryDef
import graft.relational.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
      |  CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
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
      |    CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |    CAST(length(regexp_extract_all(text, '[.,!?]')) AS BIGINT) AS n_punct,
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
      |    length(regexp_extract_all(text, '\b(the|and|of)\b')) AS c_en,
      |    length(regexp_extract_all(text, '\b(der|und|das)\b')) AS c_de,
      |    length(regexp_extract_all(text, '\b(el|la|los)\b')) AS c_es,
      |    length(regexp_extract_all(text, '\b(le|et|les)\b')) AS c_fr
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
      |CROSS JOIN generate_series(1, 65536) AS t(j)
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
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
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
      |CROSS JOIN generate_series(1, 65536) AS t(j)
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

  def defs: Seq[QueryDef] = Seq(
    q13_word_topk, q25_token_stats, q26_quality_score, q27_lang_guess,
    q36_doc_fingerprint, q34_binary_meta, q51_frame_meta)
}
