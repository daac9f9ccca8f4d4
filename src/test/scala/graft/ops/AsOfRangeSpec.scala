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
