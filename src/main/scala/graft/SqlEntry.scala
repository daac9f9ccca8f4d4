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
