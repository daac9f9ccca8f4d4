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

  /** Byte-exact variant of [[read]]: whole-file binary scan decoded with a
    * CPython-faithful UTF-8 `errors="replace"` decoder
    * ([[decodeReplace]]) and universal-newline line splitting — the exact
    * semantics of the reference's `open(path, encoding="utf-8",
    * errors="replace")` iteration (/root/reference/backend/main.py:357-360).
    * Hadoop's text reader is *close* (it also substitutes U+FFFD) but not
    * byte-identical on malformed sequences; use this path when replacement-
    * character parity matters. Tradeoff: `binaryFile` reads are per-file
    * tasks (not block-splittable), so parallelism scales with file count —
    * the right shape for chat exports, which are many small files.
    */
  def readExact(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val b = if (bytes == null) Array.emptyByteArray else bytes
        splitLinesUniversal(decodeReplace(b)).zipWithIndex.map {
          case (line, i) => (line, file, i.toLong)
        }
      }
      .toDF("value", "file", "line_no")
  }

  /** UTF-8 decode with CPython's `errors="replace"` semantics: each
    * *maximal subpart* of an ill-formed sequence collapses to one U+FFFD
    * (the Unicode-recommended policy CPython ≥3.3 implements) — so a
    * truncated `E2 82` is ONE replacement char while `C0 AF` is TWO.
    * Structurally valid prefixes are consumed together; an invalid starter
    * or an out-of-range second byte consumes exactly the bytes read so far.
    * Validation table matches CPython's: C2-DF, E0(A0-BF), E1-EC, ED(80-9F,
    * excludes surrogates), EE-EF, F0(90-BF), F1-F3, F4(80-8F, caps at
    * U+10FFFF).
    */
  private[chat] def decodeReplace(bytes: Array[Byte]): String = {
    val n = bytes.length
    val sb = new java.lang.StringBuilder(n)
    def b(j: Int) = bytes(j) & 0xff
    var i = 0
    while (i < n) {
      val b0 = b(i)
      if (b0 < 0x80) { sb.append(b0.toChar); i += 1 }
      else if (b0 < 0xc2) { sb.append('�'); i += 1 } // 80-C1 never starts
      else if (b0 < 0xe0) { // 2-byte
        if (i + 1 < n && (b(i + 1) & 0xc0) == 0x80) {
          sb.appendCodePoint(((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f)); i += 2
        } else { sb.append('�'); i += 1 }
      } else if (b0 < 0xf0) { // 3-byte; second-byte range depends on starter
        val lo = if (b0 == 0xe0) 0xa0 else 0x80
        val hi = if (b0 == 0xed) 0x9f else 0xbf
        if (i + 1 >= n || b(i + 1) < lo || b(i + 1) > hi) { sb.append('�'); i += 1 }
        else if (i + 2 >= n || (b(i + 2) & 0xc0) != 0x80) { sb.append('�'); i += 2 }
        else {
          sb.appendCodePoint(
            ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f))
          i += 3
        }
      } else if (b0 < 0xf5) { // 4-byte
        val lo = if (b0 == 0xf0) 0x90 else 0x80
        val hi = if (b0 == 0xf4) 0x8f else 0xbf
        if (i + 1 >= n || b(i + 1) < lo || b(i + 1) > hi) { sb.append('�'); i += 1 }
        else if (i + 2 >= n || (b(i + 2) & 0xc0) != 0x80) { sb.append('�'); i += 2 }
        else if (i + 3 >= n || (b(i + 3) & 0xc0) != 0x80) { sb.append('�'); i += 3 }
        else {
          sb.appendCodePoint(((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
            ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f))
          i += 4
        }
      } else { sb.append('�'); i += 1 } // F5-FF
    }
    sb.toString
  }

  /** Python universal-newline line split: terminators are `\n`, `\r\n`,
    * and lone `\r`; terminators are not returned; an unterminated final
    * line is, an empty one after a trailing terminator is not.
    */
  private[chat] def splitLinesUniversal(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n') { out += sb.toString; sb.setLength(0); i += 1 }
      else if (c == '\r') {
        out += sb.toString; sb.setLength(0)
        i += (if (i + 1 < s.length && s.charAt(i + 1) == '\n') 2 else 1)
      } else { sb.append(c); i += 1 }
    }
    if (sb.length > 0) out += sb.toString
    out.toSeq
  }

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
