package graft.functions

import graft.SparkSpec

/** Pins for [[KllSketch]]: per-partition build + associative merge must
  * estimate quantiles of the union within the documented rank error,
  * regardless of how rows are split across partitions.
  */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("partition sketches merge to accurate union quantiles") {
    val n = 20000
    // two disjoint value ranges in separate partitions: a merge that
    // dropped or double-counted a shard shifts the median drastically
    val vals = (0 until n).map(_.toDouble).toDS().repartition(7)
    val merged = KllSketch.merge(
      KllSketch.partitionSketches(vals, 800).collect().toSeq, 800)
    assert(merged.getN == n.toLong, "merge must preserve the stream length")
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.getQuantile(q)
      val trueRank = vals.filter(_ <= est).count().toDouble / n
      assert(math.abs(trueRank - q) <= 0.02,
        s"q=$q est=$est trueRank=$trueRank")
    }
  }
}
