package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst pushes filters and prunes
  * columns into the scan (`PushedFilters`/`ReadSchema` in explain).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** The `events` table's `ts` column has shipped in two physical types
    * across testdata generations: INT64 TIMESTAMP(NANOS) (read as a plain
    * long via the legacy nanosAsLong flag set in Sessions.configure) and
    * plain TIMESTAMP micros (pandas default, surfaced as TIMESTAMP_NTZ).
    * Normalize either to the canonical column contract:
    *   - `ts_ns`  — epoch nanos BIGINT, the exact ordering key (matches
    *     DuckDB's `ORDER BY ts` bit-for-bit in both generations);
    *   - `ts_sec` — floor-to-second epoch, used for any *output* so both
    *     engines agree regardless of sub-second precision;
    *   - `ts`     — TimestampType (UTC session) for humans/windows.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType =>
      raw
        .withColumnRenamed("ts", "ts_ns")
        // `div` = exact integer division: `/` is double math, and double(ts_ns)
        // loses up to ~128 ns near 2^60, enough to truncate a near-boundary
        // nanosecond into the wrong second vs DuckDB's exact floor(epoch(ts)).
        // Spark `div` truncates toward zero; DuckDB `//` floors — identical
        // ONLY because ts_ns ≥ 0 (post-1970 data). Pre-epoch timestamps
        // would diverge by one at every div site downstream (day buckets,
        // window starts) — see the QueryDef parity-rules note.
        .withColumn("ts_sec", expr("ts_ns div 1000000000"))
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    case TimestampType | TimestampNTZType =>
      // NTZ→TS cast interprets the wall clock in the session timezone; every
      // graft session pins UTC, so the cast is the identity on the instant
      // DuckDB's epoch(ts) computes. unix_micros × 1000 keeps ts_ns a
      // BIGINT with the same ordering as DuckDB's `ORDER BY ts`.
      raw
        .withColumn("ts", col("ts").cast(TimestampType))
        .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
        .withColumn("ts_sec", expr("ts_ns div 1000000000"))
    case other =>
      throw new IllegalStateException(s"events.ts: unsupported type $other")
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(t(s, d, "events"))
}

/** Decimal-bridged arithmetic shared by Spark queries and their DuckDB
  * oracles: compute in exact DECIMAL, emit DOUBLE. A binary double is never
  * exactly on a decimal rounding half-boundary at scale 2 (that would need a
  * 10^-3 component), so double→decimal casts agree across engines.
  */
object Sql {
  val dec2t: DecimalType = DecimalType(18, 2)
  def dec2(c: Column): Column = c.cast(dec2t)
  /** sum(decimal(x)) as double — deterministic across partitionings. */
  def sumDec2(c: Column): Column = sum(dec2(c)).cast(DoubleType)
  def one: Column = lit(1).cast(dec2t)
}
