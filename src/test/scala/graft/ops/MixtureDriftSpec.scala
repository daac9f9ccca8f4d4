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

  test("epochMixture: zero-token stratum yields zero ratios, never null/error") {
    // a stratum whose docs all have zero whitespace tokens (round-10
    // ADVICE degenerate input): its epochs_ppm must pin to 0 — Spark's
    // div-by-zero null and DuckDB's division error would otherwise
    // diverge
    val df = Seq(("s1", "w w w w"), ("empty", ""), ("empty", ""))
    val got = Sampling.epochMixture(df.toDF("source", "text"), "source",
        TextAnalysis.tokenCount(col("text")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("empty") == ((0L, 0L, 0L, 0L)))
    assert(got("s1")._1 == 4L)
    // fully-empty input: isq_sum = 0 must also stay defined
    val allEmpty = Sampling.epochMixture(
        Seq(("z", "")).toDF("source", "text"), "source",
        TextAnalysis.tokenCount(col("text")))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(allEmpty.toSeq == Seq((0L, 0L, 0L, 0L)))
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

  test("perceptronTrain: distributed epochs equal a sequential reference") {
    // 20 synthetic docs, word vocab {w0..w9}, doc i repeats word (i % 10)
    // (i % 7 + 1) times plus filler "pad" tokens — label threshold 4
    val docs = (0L until 20L).map { i =>
      val main = Seq.fill((i % 7 + 1).toInt)(s"w${i % 10}")
      val pad = Seq.fill((i % 3).toInt)("pad")
      (i, (main ++ pad).mkString(" "))
    }
    val nF = 8
    def bucket(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % nF
    }
    // sequential batch perceptron, bias at bucket -1, eta = 1, 3 epochs
    val feats = docs.map { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val cnts = toks.groupBy(bucket).map { case (b, g) => b -> g.length.toLong }
      val y = if (toks.length >= 4) 1L else -1L
      (cnts + (-1L -> 1L), y)
    }
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to 3) {
      val miscl = feats.filter { case (c, y) =>
        y * c.map { case (b, n) => n * w(b) }.sum <= 0L
      }
      val grad = miscl.flatMap { case (c, y) => c.map { case (b, n) => b -> y * n } }
        .groupBy(_._1).map { case (b, g) => b -> g.map(_._2).sum }
      w = grad.foldLeft(w) { case (m, (b, g)) => m.updated(b, m(b) + g) }
    }
    val want = (-1L until nF.toLong).map(b => b -> w(b)).toMap
    val got = Featurize.perceptronTrain(docs.toDF("doc_id", "text"),
        "doc_id", "text", numFeatures = nF, epochs = 3, minTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.values.exists(_ != 0L), "training must move some weight")
    // partition layout must not change the model (integer sums + exact sets)
    val got7 = Featurize.perceptronTrain(
        docs.toDF("doc_id", "text").repartition(7),
        "doc_id", "text", numFeatures = nF, epochs = 3, minTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got7 == want)
  }
}
