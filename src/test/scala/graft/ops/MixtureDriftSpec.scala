package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the round-10 curation additions: [[Drift.tokenDrift]],
  * [[Sampling.epochMixture]], [[Featurize.hashedLinearScore]] — each on a
  * hand-computable toy so the exact integer contract is pinned
  * independently of the DuckDB oracle (q136/q138/q139).
  */
class MixtureDriftSpec extends SparkSpec {
  import spark.implicits._

  test("tokenDrift: exact floor-ppm shift on a toy vocabulary") {
    // old = "a a b" (a: 2/3, b: 1/3), new = "a b b" (mirrored)
    val old = Seq((1L, "a a b")).toDF("id", "text")
    val neu = Seq((1L, "a b b")).toDF("id", "text")
    val got = Drift.tokenDrift(old, neu, "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      "a" -> ((666666L, 333333L, 333333L)),
      "b" -> ((333333L, 666666L, 333333L))))

    // token present on one side only → 0 ppm on the other, drift = own ppm
    val neu2 = Seq((1L, "c c c")).toDF("id", "text")
    val got2 = Drift.tokenDrift(old, neu2, "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got2("c") == ((0L, 1000000L, 1000000L)))
    assert(got2("a") == ((666666L, 0L, 666666L)))
  }

  test("epochMixture: exact targets, weights, and repetition factors") {
    // stratum s1: 100 tokens (isq 10), s2: 400 tokens (isq 20)
    // budget 500, isq_sum 30 → targets 166/333, epochs 1.66x / 0.8325x
    val df = Seq.tabulate(10)(i => ("s1", "w " * 9 + "w")) ++
      Seq.tabulate(10)(i => ("s2", "w " * 39 + "w"))
    val got = Sampling.epochMixture(df.toDF("source", "text"), "source",
        TextAnalysis.tokenCount(col("text")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("s1") == ((100L, 333333L, 166L, 1660000L)))
    assert(got("s2") == ((400L, 666666L, 333L, 832500L)))
    // conservation: reallocated budget never exceeds the corpus budget
    assert(got.values.map(_._3).sum <= 500L)
  }

  test("hashedLinearScore: exact md5 weights, keep gate, determinism") {
    def weight(salt: String, w: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + w).getBytes("UTF-8"))
      val hex = d.take(2).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 16 - 8
    }
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha")).toDF("id", "text")
    val got = Featurize.hashedLinearScore(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val s1 = weight("qw", "alpha") + weight("qw", "beta") + weight("qw", "gamma")
    val s2 = 2 * weight("qw", "alpha")
    assert(got(1L) == ((3L, s1, if (s1 > 0) 1L else 0L)))
    assert(got(2L) == ((2L, s2, if (s2 > 0) 1L else 0L)))
  }
}
