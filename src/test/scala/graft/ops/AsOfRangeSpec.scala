package graft.ops

import graft.SparkSpec

class AsOfRangeSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks latest prior-or-equal right row per key") {
    val quotes = Seq( // (sym, ts, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "ts", "px")
    val trades = Seq( // (sym, ts, qty)
      ("A", 25L, 100L), // matches quote @20
      ("A", 20L, 200L), // equal ts → inclusive match @20
      ("A", 5L, 300L),  // no prior quote → dropped
      ("B", 99L, 400L)  // matches @15
    ).toDF("sym", "ts", "qty")
    val got = AsOf.joinAsOf(trades, quotes, "sym", "ts", "ts", Seq("px"))
      .select("sym", "ts", "qty", "asof_px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(
      ("A", 25L, 100L, 2.0),
      ("A", 20L, 200L, 2.0),
      ("B", 99L, 400L, 9.0)))
  }

  test("native as-of operator equals the composite form (incl. on real events)") {
    org.apache.spark.sql.GraftRegistrar.register(spark)
    // small case with known answer (long keys for the native path)
    val quotes = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0), (2L, 15L, 9.0))
      .toDF("sym", "ts", "px")
    val trades = Seq((1L, 25L, 100L), (1L, 20L, 200L), (1L, 5L, 300L), (2L, 99L, 400L))
      .toDF("sym", "ts", "qty")
    val native = AsOf.joinAsOfNative(trades, quotes, "sym", "ts", "ts", Seq("px"))
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "custom strategy did not plan AsOfJoinExec")
    val n = native.select("sym", "ts", "qty", "asof_px").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(n == Set((1L, 25L, 100L, 2.0), (1L, 20L, 200L, 2.0), (2L, 99L, 400L, 9.0)))

    // differential vs composite on the real events table
    val ev = graft.relational.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter($"event_type" === "purchase")
      .select("event_id", "user_id", "ts_ns")
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id", $"ts_ns")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "asof_c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = norm(AsOf.joinAsOfNative(p, c, "user_id", "ts_ns", "ts_ns", Seq("c_id")))
    val b = norm(AsOf.joinAsOf(p, c, "user_id", "ts_ns", "ts_ns", Seq("c_id")))
    assert(a == b && a.nonEmpty)
  }

  test("bucketized interval join equals the naive range predicate") {
    val ev = Seq(
      (1L, 0L, 10L), (1L, 30L, 11L), (1L, 60L, 12L), (1L, 61L, 13L),
      (1L, 200L, 14L), (2L, 55L, 20L), (2L, 100L, 21L)
    ).toDF("k", "sec", "id")
    val got = RangeJoin.timeWindowPairs(ev, "k", "sec", "id", windowSec = 60)
      .select("id_a", "id_b", "gap_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive reference computed in memory
    val rows = ev.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      a <- rows; b <- rows
      if a._1 == b._1 && b._2 > a._2 && b._2 <= a._2 + 60
    } yield (a._3, b._3, b._2 - a._2)).toSet
    assert(got == want)
    assert(want.contains((10L, 12L, 60L)) && !want.contains((10L, 13L, 61L)))
  }
}
