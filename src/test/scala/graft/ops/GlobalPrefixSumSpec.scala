package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GlobalPrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("withRunningSum equals the sequential prefix sum on any partitioning") {
    val rows = (1L to 500L).map { i =>
      (i, (i * 2654435761L) % 1000, (i % 7) - 3) // (id, order key, value)
    }
    val expected = rows.sortBy(r => (r._2, r._1))
      .scanLeft(0L)(_ + _._3).drop(1)
    val want = rows.sortBy(r => (r._2, r._1)).map(_._1)
      .zip(expected).toMap
    for (p <- Seq(1, 3, 32)) {
      val got = GlobalPrefixSum.withRunningSum(
          rows.toDF("id", "k", "v").repartition(p),
          Seq("k", "id"), "v", "run")
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == want, s"parts=$p")
    }
  }

  test("boundary offsets: constant +1 values give the global row index") {
    val df = spark.range(1, 10001).select(col("id"), lit(1L).as("v"))
    val got = GlobalPrefixSum.withRunningSum(df, Seq("id"), "v", "run")
      .filter(col("id") % 997 === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, run) => assert(run == id, s"id=$id") }
  }
}
