package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the `events.ts` normalization contract across BOTH testdata
  * generations the driver has shipped: INT64 TIMESTAMP(NANOS) (read as a
  * plain long under nanosAsLong) and plain TIMESTAMP micros / NTZ (pandas
  * default since the 2026-08-13 regen — the round-8 breakage: every
  * events-family query threw DATATYPE_MISMATCH because the loader assumed
  * the long generation). Same instants in, identical canonical columns out.
  */
class TablesSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // three instants incl. a sub-second boundary straddler
  private val micros = Seq(0L, 1700000000123456L, 1700000000999999L)

  private def longGen = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType)))
    spark.createDataFrame(
      micros.zipWithIndex.map { case (us, i) => Row(i.toLong, us * 1000L) }
        .asJava, schema)
  }

  private def tsGen(dt: DataType) = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", dt)))
    val rows = micros.zipWithIndex.map { case (us, i) =>
      val v: Any = dt match {
        case TimestampType => java.sql.Timestamp.from(
          java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS))
        case TimestampNTZType => java.time.LocalDateTime.ofInstant(
          java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS),
          java.time.ZoneOffset.UTC)
      }
      Row(i.toLong, v)
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    Tables.normalizeEventTs(df)
      .select(col("event_id"), col("ts_ns"), col("ts_sec"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("long-nanos and timestamp generations normalize identically") {
    val fromLong = canon(longGen)
    val fromTs = canon(tsGen(TimestampType))
    val fromNtz = canon(tsGen(TimestampNTZType))
    assert(fromTs === fromLong)
    assert(fromNtz === fromLong)
    // spot-check the derived values themselves
    assert(fromLong.map(_._2) === micros.map(_ * 1000L))
    assert(fromLong.map(_._3) === micros.map(_ / 1000000L))
  }

  test("normalized ts column is TimestampType in every generation") {
    for (df <- Seq(longGen, tsGen(TimestampType), tsGen(TimestampNTZType)))
      assert(Tables.normalizeEventTs(df).schema("ts").dataType === TimestampType)
  }
}
