package graft.functions

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def topIds(data: Seq[(String, Double, Long)], k: Int,
      parts: Int): Map[String, Seq[Long]] =
    data.toDS().repartition(parts)
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(TopKAggregator(k).toColumn.name("topk"))
      .collect()
      .map { case (g, buf) => g -> buf.items.map(_._2) }.toMap

  test("top-k aggregator: ordering, ties, small groups, partition invariance") {
    val data = Seq(
      ("a", 3.0, 1L), ("a", 5.0, 2L), ("a", 5.0, 3L), ("a", 1.0, 4L),
      ("a", 4.0, 5L),
      ("b", 2.0, 6L)) // group smaller than k
    val got = topIds(data, k = 3, parts = 1)
    // value desc, ties by smaller id: 5.0@2, 5.0@3, 4.0@5
    assert(got("a") == Seq(2L, 3L, 5L))
    assert(got("b") == Seq(6L)) // under-full group returns what exists
    // merge path must agree with the single-partition path exactly
    (2 to 7).foreach { p => assert(topIds(data, 3, p) == got, s"parts=$p") }
  }
}
