package graft.functions

import graft.SparkSpec

/** Pins for [[KllSketch]]: per-partition build + associative merge must
  * estimate quantiles of the union within the documented rank error,
  * regardless of how rows are split across partitions.
  */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("KllAggregator: buffer survives shuffle boundaries (byte-form java serialization) and matches the union") {
    val n = 20000
    import org.apache.spark.sql.functions._
    val kll = udaf(KllAggregator(800),
      org.apache.spark.sql.Encoders.scalaDouble)
    // 7 partitions force partial sketches + a merge across the exchange,
    // so the KllState writeObject/readObject path actually runs
    val bytes = (0 until n).map(_.toDouble).toDF("v").repartition(7)
      .agg(kll(col("v")).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val merged = KllSketch.fromBytes(bytes)
    assert(merged.getN == n.toLong)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.getQuantile(q)
      assert(math.abs(est / n - q) <= 0.02, s"q=$q est=$est")
    }
  }

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
