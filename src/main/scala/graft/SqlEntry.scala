package graft

import org.apache.spark.sql.SparkSession

/** SQL-text entry point: registers the engine's tables as temp views so
  * flagship queries run from plain SQL (`spark.sql(...)` or a spark-sql
  * shell pointed at this library). The DataFrame API stays the primary
  * surface; this makes the same plans reachable from SQL text — the
  * Catalyst parser/analyzer path — which RegistrySpec pins as
  * digest-equivalent to the DataFrame forms for a flagship set.
  *
  * `events` is registered through [[relational.Tables.normalizeEventTs]]
  * so SQL sees the same (ts TIMESTAMP, ts_ns, ts_sec) column contract the
  * DataFrame queries use, whichever physical type the parquet shipped.
  */
object SqlEntry {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit = {
    // String literals keep backslashes literally (the ANSI/DuckDB/Hive-1.x
    // behavior): without this, Spark's default C-style unescaping silently
    // strips the backslash from regex literals ('\S+' becomes 'S+'), so a
    // regex-bearing query would PARSE on both engines and return different
    // rows. One semantic dialect for every SQL-entry string.
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    tableNames.foreach { n =>
      relational.Tables.t(spark, dir, n).createOrReplaceTempView(n)
    }
    relational.Tables.events(spark, dir).createOrReplaceTempView("events")
    // DuckDB-dialect compat: `epoch(ts)` (double seconds). A SQL scalar
    // function, not a UDF — the body inlines during analysis, so it stays
    // inside whole-stage codegen. unix_micros is exact; the double holds
    // micro counts < 2^53 exactly (fine past year 2200).
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION epoch(t TIMESTAMP)
      |RETURNS DOUBLE
      |RETURN CAST(unix_micros(t) AS DOUBLE) / 1000000.0""".stripMargin)
    // `epoch_us(ts)` — DuckDB's exact micros accessor, = unix_micros.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION epoch_us(t TIMESTAMP)
      |RETURNS BIGINT
      |RETURN unix_micros(t)""".stripMargin)
    // `strftime(ts, fmt)` — DuckDB's C-style formatter, translated to
    // java.time patterns for the directives the oracles use (%Y %m %d
    // %H %M %S). Formats outside that subset raise instead of silently
    // diverging: java.time treats bare letters as pattern directives
    // where DuckDB treats them as literals, so passing an untranslated
    // format through would format a DIFFERENT field, not error. Same
    // inlined-SQL-function mechanics as epoch().
    // `len(arr)` — DuckDB's list length (= length(list)); Spark's builtin
    // `len` is a string-length alias that rejects arrays, so rebind the
    // name session-locally to size()+BIGINT (DuckDB's result type). Pure
    // catalyst expressions — stays inside whole-stage codegen.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "len",
      exprs => org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Size(exprs.head),
        org.apache.spark.sql.types.LongType),
      "scala_udf")
    // `xor(a, b)` — DuckDB's bitwise-xor function (its `^` is POWER);
    // Spark's `^` is bitwise xor.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |xor(a BIGINT, b BIGINT) RETURNS BIGINT
      |RETURN a ^ b""".stripMargin)
    // `strlen(s)` — DuckDB's byte length of a VARCHAR; Spark's
    // octet_length counts the same UTF-8 bytes.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |strlen(s STRING) RETURNS BIGINT
      |RETURN CAST(octet_length(s) AS BIGINT)""".stripMargin)
    // `sha256(s)` — DuckDB's hex-string SHA-256 over the UTF-8 bytes;
    // sha2(s, 256) emits the same lowercase hex in Spark.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |sha256(s STRING) RETURNS STRING
      |RETURN sha2(s, 256)""".stripMargin)
    // `string_split(s, sep)` — DuckDB's literal-separator split; Spark's
    // split() takes a regex, so the separator is \Q..\E-quoted. Both
    // engines keep empty fields between adjacent separators.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |string_split(s STRING, sep STRING) RETURNS ARRAY<STRING>
      |RETURN split(s, concat('\Q', sep, '\E'))""".stripMargin)
    // `regexp_matches(s, p)` — DuckDB's partial-match regex predicate;
    // Spark's RLIKE has identical partial-match semantics.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |regexp_matches(s STRING, p STRING) RETURNS BOOLEAN
      |RETURN s RLIKE p""".stripMargin)
    // `json_extract_string(j, p)` — DuckDB's string-typed JSON path
    // accessor; get_json_object shares the '$.field' path dialect and
    // the NULL-on-missing contract.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |json_extract_string(j STRING, p STRING) RETURNS STRING
      |RETURN get_json_object(j, p)""".stripMargin)
    // `nfc_normalize(s)` — DuckDB builtin; bound to the library's native
    // codegen expression (functions/NfcNormalize.scala), not a UDF, so
    // SQL text hits the same compiled kernel as the DataFrame path.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => functions.NfcNormalize(exprs.head),
      "scala_udf")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |strftime(t TIMESTAMP, f STRING) RETURNS STRING
      |RETURN CASE
      |  WHEN f NOT RLIKE '^([-:/ .]|%[YmdHMS])*$' THEN
      |    raise_error(concat('strftime shim supports only %Y %m %d %H ',
      |      '%M %S with -:/. separators, got: ', f))
      |  ELSE date_format(t,
      |    replace(replace(replace(replace(replace(replace(f,
      |      '%Y', 'yyyy'), '%m', 'MM'), '%d', 'dd'),
      |      '%H', 'HH'), '%M', 'mm'), '%S', 'ss'))
      |END""".stripMargin)
  }
}
