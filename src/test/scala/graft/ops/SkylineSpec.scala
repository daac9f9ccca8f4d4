package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sky(rows: Seq[(Long, Long, Long)], parts: Int): Set[(Long, Long, Long)] =
    Skyline.skyline2d(
        rows.toDF("id", "x", "y").repartition(parts), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("skyline2d: dominance, tie semantics, equal-point duplicates") {
    // (1,10) and (5,20) are the frontier; (2,10) is dominated by (1,10)
    // (same y, higher x), (5,15) by (5,20) (same x, lower y), (9,19)
    // strictly dominated
    val rows = Seq(
      (1L, 1L, 10L), (2L, 2L, 10L), (3L, 5L, 20L),
      (4L, 5L, 15L), (5L, 9L, 19L))
    val want = Set((1L, 1L, 10L), (3L, 5L, 20L))
    assert(sky(rows, 1) == want)
    // equal-point duplicates: neither dominates the other — BOTH kept
    val dup = rows ++ Seq((6L, 1L, 10L))
    assert(sky(dup, 1) == want + ((6L, 1L, 10L)))
  }

  test("skyline2d: result invariant to input partitioning") {
    // pseudo-random fixture, brute-force oracle
    val rows = (1L to 500L).map { i =>
      val x = (i * 2654435761L) % 97
      val y = (i * 40503L) % 89
      (i, x, y)
    }
    val brute = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.toSet
    assert(brute.nonEmpty && brute.size < rows.size)
    for (p <- Seq(1, 3, 32)) assert(sky(rows, p) == brute, s"parts=$p")
  }
}
