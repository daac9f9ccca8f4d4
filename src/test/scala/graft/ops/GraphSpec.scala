package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleStats: canonicalization + exact counts on known graphs") {
    // triangle 1-2-3 plus pendant 3-4; reversed duplicate and self-loop
    // must be canonicalized away
    val messy = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 3L), (3L, 4L))
      .toDF("s", "t")
    val r = Graph.triangleStats(messy, "s", "t").first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 4L, 1L)))

    // K4: 4 triangles, 6 edges
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("s", "t")
    val r4 = Graph.triangleStats(k4, "s", "t").first()
    assert((r4.getLong(0), r4.getLong(1), r4.getLong(2)) == ((4L, 6L, 4L)))

    // star (no triangles): hub 0 to 1..5
    val star = (1L to 5L).map(i => (0L, i)).toDF("s", "t")
    val rs = Graph.triangleStats(star, "s", "t").first()
    assert((rs.getLong(0), rs.getLong(1), rs.getLong(2)) == ((6L, 5L, 0L)))
  }
}
