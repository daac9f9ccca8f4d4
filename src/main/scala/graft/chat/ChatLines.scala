package graft.chat

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chat-file ingestion: `spark.read.text` plus a *stable per-file line
  * number* — the one physically-subtle piece of the whole chat pipeline
  * (SURVEY.md §4): every downstream operator (lag, first-match group name,
  * qualifying limit) is order-sensitive, and Spark guarantees no row order
  * without explicit work.
  *
  * `monotonically_increasing_id` is NOT stable under repartitioning, so we
  * use `rdd.zipWithIndex` immediately after the scan (text splits preserve
  * intra-file order: partitions are (file, block-offset)-ordered), then
  * `row_number` over (file, global index) to get dense per-file numbers.
  * One narrow pass + one window; at 100 TB the window partitions by file,
  * so parallelism scales with file count and no global sort ever happens.
  *
  * Reference behavior: line-by-line UTF-8 iteration, lenient decoding
  * (`errors="replace"` — Hadoop's text reader substitutes U+FFFD the same
  * way); see /root/reference/backend/main.py:281-282,357-360.
  */
object ChatLines {

  /** file: String, line_no: Long (0-based, per file), value: String */
  def read(spark: SparkSession, path: String): DataFrame =
    withLineNumbers(
      spark.read.text(path).withColumn("file", input_file_name()))

  /** Adds a stable 0-based `line_no` per `file` to a (file, value) frame. */
  def withLineNumbers(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField("_gidx", LongType, nullable = false))
    val indexed = spark.createDataFrame(
      df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
    val w = Window.partitionBy("file").orderBy("_gidx")
    indexed
      .withColumn("line_no", row_number().over(w).cast(LongType) - 1)
      .drop("_gidx")
  }
}
