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
}
