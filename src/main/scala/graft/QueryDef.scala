package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark pipeline over the testdata
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Oracle-parity rules (see SURVEY.md §5 / the driver contract):
  *  - column names must match exactly between `fn` output and `oracle`;
  *  - double aggregates are computed in DECIMAL (exact) and cast to DOUBLE
  *    at the end, so Spark's parallel partial aggregation and DuckDB's
  *    sequential sum produce bit-identical values;
  *  - every query is deterministically ordered (explicit ORDER BY with a
  *    unique tiebreaker) on both sides;
  *  - integer-ish outputs are BIGINT on both sides (DuckDB sum(int) is
  *    HUGEINT and Spark row_number is INT — both get explicit casts);
  *  - integer division: the DataFrame side uses Spark's `div` (truncate
  *    toward zero); SQL-portable oracles spell floor division as
  *    CAST(floor(a / b) AS BIGINT) — identical IEEE semantics in both
  *    engines, exact while the NUMERATOR stays below 2^53 — or, where
  *    numerators can outgrow that (q279's determinants, q311's MM
  *    updates), the exact idiom round((a − a%b)/b) whose exactness
  *    depends only on the QUOTIENT (< ~2^51): subtraction and modulo
  *    stay exact in DECIMAL(38,0), the divided numerator is exactly
  *    divisible, and round() absorbs the double conversion's ulp noise.
  *    All idioms agree with `//`/`div` ONLY for non-negative operands —
  *    true everywhere we divide (epoch seconds ≥ 0, counts, ppm
  *    numerators); sign-normalizing CASEs guard the signed sites
  *    (q190/q253/q279/q297/q300).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** Full inventory, SURVEY.md §2 coverage + north-star extensions.
    * Oracle texts pass through [[SqlIdioms.portable]] so the published
    * SQL runs identically in DuckDB and Spark (see SqlIdioms for the
    * exact value-preserving rewrite).
    */
  def all: Seq[QueryDef] =
    raw.map(q => q.copy(oracle = q.oracle.map(SqlIdioms.portable)))

  private def raw: Seq[QueryDef] =
    relational.RelationalQueries.defs ++
      relational.AdvancedQueries.defs ++
      events.EventQueries.defs ++
      ops.TextQueries.defs ++
      ops.DedupQueries.defs ++
      ops.SimilarityQueries.defs ++
      ops.SamplingQueries.defs ++
      ops.FeaturizeQueries.defs ++
      ops.CurationQueries.defs ++
      ops.MultimodalQueries.defs ++
      sources.FormatQueries.defs ++
      streaming.StreamQueries.defs

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
