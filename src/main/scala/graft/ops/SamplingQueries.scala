package graft.ops

import graft.QueryDef
import graft.relational.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-parity queries for the deterministic sampling operators
  * ([[Sampling]]). The split must be a pure function of the key —
  * identical across runs, partitionings, and engines — which is exactly
  * what the oracle check proves: DuckDB rebuilds the same md5-derived
  * assignment and the hashes must match.
  */
object SamplingQueries {

  /** DuckDB mirror of [[Sampling.unitHash]] over doc_id. */
  private val unitHashSql =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0"

  val q53_stable_split: QueryDef = QueryDef(
    "q53_stable_split",
    (s, d) =>
      Sampling.stableSplit(Tables.documents(s, d), "doc_id")
        .groupBy("split")
        .agg(count(lit(1)).as("n"), min("doc_id").as("first_id"))
        .orderBy("split"),
    Some(s"""WITH assigned AS (
      |  SELECT doc_id,
      |    CASE WHEN $unitHashSql < 0.8 THEN 'train'
      |         WHEN $unitHashSql < 0.9 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents)
      |SELECT split, COUNT(*) AS n, MIN(doc_id) AS first_id
      |FROM assigned GROUP BY split ORDER BY split""".stripMargin),
    "Deterministic hash-based train/val/test split (stable across runs, " +
      "partitionings, and engines — md5 assignment shared with the oracle)")

  def defs: Seq[QueryDef] = Seq(q53_stable_split)
}
