package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a b c"),
    (2L, "a b"),
    (3L, "c  c c"),   // double space: empty token must be dropped
    (4L, "solo"),     // one token: no bigrams, never scored
    (5L, "")          // empty doc
  ).toDF("doc_id", "text")

  test("bigramRows: zip form, empty tokens dropped, short docs contribute nothing") {
    val got = LanguageModel.bigramRows(docs, "doc_id", "text")
      .orderBy("doc_id", "w1", "w2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, "a", "b"), (1L, "a", "b"), (1L, "b", "a"), (1L, "b", "c"),
      (2L, "a", "b"),
      (3L, "c", "c"), (3L, "c", "c")))
  }

  test("bigramLm: conditional probabilities sum to 1 per context") {
    val lm = LanguageModel.bigramLm(docs, "doc_id", "text")
    val sums = lm.groupBy("w1").agg(sum("p").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums.keySet == Set("a", "b", "c"))
    sums.values.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
    // spot value: c("a","b") = 3, c("a",·) = 3 → p = 1.0
    val pab = lm.filter($"w1" === "a" && $"w2" === "b").head.getDouble(2)
    assert(pab == 1.0)
  }

  test("scoreAvgCondProb: self-scored docs, unseen transitions count as zero") {
    val lm = LanguageModel.bigramLm(docs, "doc_id", "text")
    val scores = LanguageModel.scoreAvgCondProb(docs, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 2 "a b": one bigram with p("b"|"a") = 1 → exactly 1e6 ppm
    assert(scores(2L) == (1L, 1000000L))
    // docs 4 (one token) and 5 (empty) are unscored
    assert(!scores.contains(4L) && !scores.contains(5L))
    // held-out doc with an unseen transition: p("b","b") is not in the LM
    val held = Seq((9L, "a b b")).toDF("doc_id", "text")
    val h = LanguageModel.scoreAvgCondProb(held, "doc_id", "text", lm)
      .head
    // bigrams: (a,b) p=1.0 seen, (b,b) unseen → 0 → mean 0.5
    assert(h.getLong(1) == 2L && h.getLong(2) == 500000L)
  }

  test("semanticDedup (ANN path) matches exact-pair components when recall is 1") {
    // three tight clusters on axis directions — identical sign buckets
    // within a cluster, different across, so LSH recall is exactly 1
    def jig(i: Int): Float = (i % 3) * 1e-3f
    val vecs = (0 until 30).map { i =>
      val base = Array.fill(4)(0.0f); base(i / 10) = 1.0f
      (i.toLong, base.map(_ + jig(i)))
    }.toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.999, dim = 4)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // every cluster resolves to its minimum id as keeper
    got.foreach { case (id, canon, keep) =>
      assert(canon == (id / 10) * 10)
      assert(keep == (if (id % 10 == 0) 1L else 0L))
    }
  }
}
