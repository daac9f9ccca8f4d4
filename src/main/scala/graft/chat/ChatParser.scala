package graft.chat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** The reference's two parse dialects, kept distinct because they differ
  * semantically (SURVEY.md §7.2 step 3):
  *
  *  - '''analyze dialect''' (split-based, normalizing) — used by the
  *    network analysis: /root/reference/backend/main.py:289-312;
  *  - '''upload dialect''' (regex, raw sender, group-name state machine) —
  *    used by the MySQL ingest: /root/reference/backend/main.py:347,366-378.
  *
  * Everything is built-in codegen'd expressions — the whole parse is one
  * WholeStageCodegen stage fused with the scan.
  */
object ChatParser {

  /** F1: skip lines containing the Hebrew "media omitted" markers.
    * "הושמטה" contains "הושמט", so one contains() covers both
    * (backend/main.py:289-290).
    */
  def notMediaOmitted(value: Column): Column = !value.contains("הושמט")

  /** F2: cheap format predicate (backend/main.py:293). */
  def looksLikeMessage(value: Column): Column =
    value.startsWith("[") && value.contains("]") && value.contains(": ")

  /** P4: sender normalization chain, exact order (backend/main.py:310):
    * text before FIRST colon → strip '~' from both ends → remove every
    * U+0020 space (only that char) → trim remaining whitespace
    * ((?U) makes \s unicode-aware like Python's str.strip()).
    */
  def normalizeSender(messagePart: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(element_at(split(messagePart, ":"), 1), "^~+|~+$", ""),
        " ", ""),
      "(?U)^\\s+|\\s+$", "")

  /** Analyze dialect: expects columns (file, line_no, value); keeps rows
    * that survive F1+F2, parses P1–P4, drops invalid dates (F4) and empty
    * senders (F6). Output: file, line_no, date_time, message_date, sender,
    * message.
    */
  def analyzeDialect(lines: DataFrame): DataFrame = {
    val parts = split(col("value"), "\\] ", 2) // P1: first "] " only
    lines
      .filter(notMediaOmitted(col("value")) && looksLikeMessage(col("value")))
      .withColumn("date_part", element_at(parts, 1))
      .withColumn("message_part", element_at(parts, 2))
      // P2: strip [ ] chars from both ends, take text before first comma
      .withColumn("date_str",
        element_at(split(regexp_replace(col("date_part"), "^[\\[\\]]+|[\\[\\]]+$", ""), ","), 1))
      // P3/F4: d.M.yyyy accepts 1–2 digit day/month like strptime %d.%m.%Y;
      // try_to_timestamp → null on malformed regardless of ANSI mode
      .withColumn("message_date",
        try_to_timestamp(col("date_str"), lit("d.M.yyyy")).cast(DateType))
      .withColumn("sender", normalizeSender(col("message_part")))
      // message = text after the FIRST colon (the reference's analyze loop
      // never materializes it; defined here for WordFrequency parity)
      .withColumn("message", regexp_replace(col("message_part"), "^[^:]*:\\s*", ""))
      .filter(col("message_date").isNotNull && length(col("sender")) > 0)
      .select("file", "line_no", "date_part", "date_str", "message_date", "sender", "message")
      .withColumnRenamed("date_part", "date_time")
  }

  private val MessagePattern = "^\\[([^\\]]+)\\]\\s*([^:]+):\\s*(.+)"

  /** Upload dialect (F3/P5 + J3/F7): regex-matched rows only, raw
    * (unnormalized) sender; the first matched line's sender becomes
    * `group_name` for the whole file, that line is dropped, and so is any
    * later line whose sender equals the group name
    * (backend/main.py:363-378). Output: file, group_name, date_time,
    * sender, message.
    */
  def uploadDialect(lines: DataFrame): DataFrame = {
    val wFile = Window.partitionBy("file").orderBy("line_no")
    lines
      // the reference strips each line BEFORE matching (main.py:366
      // line.strip()): leading whitespace must not defeat the ^\[ anchor,
      // and captured groups come from the stripped line. (?U)\s matches
      // unicode whitespace like Python's str.strip().
      .withColumn("value", regexp_replace(col("value"), "(?U)^\\s+|\\s+$", ""))
      .filter(col("value").rlike(MessagePattern))
      .withColumn("date_time", regexp_extract(col("value"), MessagePattern, 1))
      .withColumn("sender", regexp_extract(col("value"), MessagePattern, 2))
      .withColumn("message", regexp_extract(col("value"), MessagePattern, 3))
      .withColumn("group_name", first("sender").over(wFile))
      .withColumn("_rn", row_number().over(wFile))
      .filter(col("_rn") > 1 && col("sender") =!= col("group_name"))
      .select("file", "group_name", "date_time", "sender", "message")
  }
}
