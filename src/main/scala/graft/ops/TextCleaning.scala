package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-cleaning column functions for LLM training-data pipelines
  * (north-star text ops, Gopher/C4-style): HTML stripping, URL/email
  * redaction, whitespace normalization, and the repetition / diversity
  * signals used for quality filtering at corpus scale.
  *
  * Everything is a composition of built-in codegen'd expressions — no
  * UDFs — so a full cleaning chain stays inside one WholeStageCodegen
  * stage over the scan: the per-document pass is embarrassingly parallel
  * and shuffles nothing. All regexes are RE2-compatible (no lookaround,
  * no backrefs) so the DuckDB oracles run the *same* patterns.
  */
object TextCleaning {

  /** Common HTML entities worth unescaping after tag removal. */
  private val Entities =
    Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")

  /** Drop `<...>` tags (replaced by a space so `a<br>b` keeps its word
    * boundary), then unescape the common entities.
    */
  def htmlStrip(text: Column): Column =
    Entities.foldLeft(regexp_replace(text, "<[^>]+>", " ")) {
      case (c, (from, to)) => regexp_replace(c, from, to)
    }

  private val UrlPattern = "https?://[^\\s]+"
  private val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Replace URLs with a redaction token (PII/dedup-noise hygiene).
    * The default token is bracketed, NOT angle-bracketed: `<URL>` would be
    * eaten by [[htmlStrip]] on a second pass, and re-cleaning already-
    * cleaned text is routine in multi-stage pipelines — [[cleanChain]] is
    * idempotent by construction (property-tested).
    */
  def urlRedact(text: Column, token: String = "[URL]"): Column =
    regexp_replace(text, UrlPattern, token)

  /** Replace email addresses with a redaction token. */
  def emailRedact(text: Column, token: String = "[EMAIL]"): Column =
    regexp_replace(text, EmailPattern, token)

  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(UrlPattern), lit(0))).cast(LongType)

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast(LongType)

  // International (+prefix) or separator-formed US-style numbers. Both
  // RE2-safe (no lookaround); deliberately conservative — bare digit runs
  // are NOT matched, because corpus text is full of quantities and years
  // that a greedy phone pattern would destroy.
  private val PhonePattern =
    "\\+\\d{7,15}|\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  private val Ipv4Pattern = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Replace phone numbers with a redaction token. */
  def phoneRedact(text: Column, token: String = "[PHONE]"): Column =
    regexp_replace(text, PhonePattern, token)

  /** Replace IPv4 addresses with a redaction token. */
  def ipRedact(text: Column, token: String = "[IP]"): Column =
    regexp_replace(text, Ipv4Pattern, token)

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast(LongType)

  def ipCount(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast(LongType)

  /** Full PII redaction pass: URLs, emails, phones, IPv4s. IP before
    * phone: an IPv4's dotted groups could otherwise partially match the
    * US-style phone alternative.
    */
  def redactPii(text: Column): Column =
    phoneRedact(ipRedact(emailRedact(urlRedact(text))))

  /** Collapse whitespace runs to single spaces and trim. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** The standard cleaning chain: strip tags, redact URLs and emails,
    * normalize whitespace. Idempotent on its own output — the bracketed
    * redaction tokens survive a re-run — EXCEPT when the input carries
    * entity-encoded tags (`&lt;b&gt;`): unescape mints a literal tag that
    * a second pass strips. That is the cost of strip-before-unescape,
    * chosen because the reverse order would delete user text that merely
    * *mentions* markup on the first pass.
    */
  def cleanChain(text: Column): Column =
    normalizeWhitespace(emailRedact(urlRedact(htmlStrip(text))))

  /** Fraction of characters in non-alphanumeric, non-space symbols —
    * high values flag markup/boilerplate (Gopher-style symbol ratio).
    */
  def symbolFraction(text: Column): Column = {
    val denom = greatest(length(text), lit(1)).cast(DoubleType)
    size(regexp_extract_all(text, lit("[^\\p{L}\\p{N}\\s]"), lit(0)))
      .cast(DoubleType) / denom
  }

  /** Mean whitespace-token length (Gopher uses 3–10 as the sane band).
    * Computed as non-space chars / token count — two codegen'd regex
    * passes, no array lambda (HOF `aggregate` is interpreted and loses to
    * this by an order of magnitude; see BASELINE.md round-1 notes).
    */
  def meanWordLength(text: Column): Column = {
    val n = greatest(
      size(regexp_extract_all(text, lit("\\S+"), lit(0))), lit(1)).cast(DoubleType)
    length(regexp_replace(text, "\\s+", "")).cast(DoubleType) / n
  }

  /** Type-token ratio: distinct words / words — the cheap lexical-
    * diversity signal (low = repetitive boilerplate). Array form, for
    * single-pass scalar use; the oracled q56 computes the identical value
    * via explode+agg, which is the faster shape when the query already
    * explodes words (see PROJECT memory: interpreted array lambdas lose
    * to exploded codegen pipelines).
    */
  def typeTokenRatio(text: Column): Column = {
    val words = split(text, " ")
    size(array_distinct(words)).cast(DoubleType) /
      greatest(size(words), lit(1)).cast(DoubleType)
  }
}
