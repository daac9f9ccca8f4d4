package graft.sources

import graft.QueryDef
import graft.relational.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-gated source/sink format queries: promote [[Io]]'s CSV/JSONL
  * paths from spec-only coverage to a CORRECTNESS row, the way q63 did
  * for the image codecs — the engine's own write→read round trip must
  * preserve the corpus EXACTLY, pinned by a per-language digest the
  * DuckDB oracle computes from the original parquet.
  */
object FormatQueries {

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** documents → JSONL sink → JSONL source → CSV sink → CSV source →
    * digest. Any column the chain drops, re-types, null-corrupts, or
    * truncates changes (n, sum_chars, n_nulls, sum_ids, n_sources) for
    * its language and hash-fails against the parquet-direct oracle.
    * JSONL and CSV are the two interchange formats every corpus pipeline
    * still ingests from; both reads use the explicit schema ([[Io]]'s
    * contract — schema inference is a full extra pass at 100 TB).
    */
  val q148_format_roundtrip: QueryDef = QueryDef(
    "q148_format_roundtrip",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_fmt_").toString
      Io.writeJsonLines(Tables.documents(s, d), s"$dir/jsonl")
      Io.writeCsv(Io.readJsonLines(s, s"$dir/jsonl", docsSchema), s"$dir/csv")
      Io.readCsv(s, s"$dir/csv", docsSchema)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).cast(LongType).as("sum_chars"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_nulls"),
          sum("doc_id").cast(LongType).as("sum_ids"),
          countDistinct("source").as("n_sources"))
        .orderBy("lang")
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
      |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    "Format round trip: parquet -> JSONL -> CSV -> digest; the oracle " +
      "digests the original parquet, so any corruption hash-fails")

  def defs: Seq[QueryDef] = Seq(q148_format_roundtrip)
}
