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

  test("top-k aggregator: NaN sorts greatest and stays partition-invariant") {
    val data = Seq(
      ("a", Double.NaN, 1L), ("a", 9.0, 2L), ("a", Double.NaN, 3L),
      ("a", 5.0, 4L), ("a", 7.0, 5L))
    // NaN greatest (SQL DESC order), NaN ties by id: 1, 3, then 9.0@2
    val want = Seq(1L, 3L, 2L)
    (1 to 7).foreach { p => assert(topIds(data, 3, p)("a") == want, s"parts=$p") }
  }
}
