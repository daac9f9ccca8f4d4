package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of [[TextAnalysis.bpeTrain]]/[[TextAnalysis.bpeEncode]]
  * against an independent in-memory reference trainer: for random corpora
  * over a tiny alphabet (maximizing pair ties, symbol runs, and
  * second-order merges) the distributed trainer must reproduce the exact
  * merge sequence — top pair per round under the (count DESC, a, b)
  * order, textbook greedy left-to-right merging, early stop when no
  * pairs remain — plus the per-round vocab/token accounting and the
  * per-document encode counts. Fixed seeds keep CI deterministic.
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  private val genCorpus: Gen[List[String]] = for {
    n <- Gen.choose(1, 8)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      toks <- Gen.listOfN(len, for {
        wl <- Gen.choose(1, 5)
        cs <- Gen.listOfN(wl, Gen.oneOf("a", "b", "c"))
      } yield cs.mkString)
    } yield toks.mkString(" "))
  } yield docs

  /** Greedy left-to-right single-pass merge — the spec the engine's
    * array fold and the oracle's list_reduce both implement.
    */
  private def greedyMerge(syms: Vector[String], a: String,
      b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b)
        acc.init :+ (acc.last + x)
      else acc :+ x
    }

  /** Reference trainer: plain Scala, no Spark. Returns the per-round
    * (a, b, pairCnt, nSymbols, nTokens) tuples and the final per-word
    * segmentation.
    */
  private def reference(corpus: Seq[String], nMerges: Int)
      : (Seq[(String, String, Long, Long, Long)], Map[String, Vector[String]]) = {
    val wf = corpus.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    var segs = wf.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val rounds = Seq.newBuilder[(String, String, Long, Long, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      r += 1
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + wf(w)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        segs = segs.map { case (w, syms) => w -> greedyMerge(syms, a, b) }
        val nSym = segs.values.flatten.toSet.size.toLong
        val nTok = segs.map { case (w, syms) => wf(w) * syms.length }.sum
        rounds += ((a, b, cnt, nSym, nTok))
      }
    }
    (rounds.result(), segs)
  }

  test("bpeTrain + bpeEncode match the reference trainer on random corpora") {
    for (seedNo <- 0 until 6) {
      val corpus = genCorpus(Gen.Parameters.default, Seed(seedNo.toLong)).get
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      for (nMerges <- Seq(1, 3, 6)) {
        val (wantRounds, wantSegs) = reference(corpus, nMerges)
        val gotRounds = TextAnalysis.bpeTrain(df, "text", nMerges)
          .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3),
            r.getLong(4), r.getLong(5))).toSeq
        assert(gotRounds == wantRounds,
          s"seed=$seedNo nMerges=$nMerges corpus=$corpus")
        val wantEnc = docs.map { case (id, t) =>
          val ws = t.split(" ", -1).filter(_.nonEmpty)
          id -> (ws.length.toLong, ws.map(_.length.toLong).sum,
            ws.map(w => wantSegs(w).length.toLong).sum)
        }.filter(_._2._1 > 0).toMap
        val gotEnc = TextAnalysis.bpeEncode(df, "doc_id", "text", nMerges)
          .collect().map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        assert(gotEnc == wantEnc, s"seed=$seedNo nMerges=$nMerges encode")
      }
    }
  }

  test("bpeTrain is invariant to input partitioning") {
    val corpus = genCorpus(Gen.Parameters.default, Seed(42L)).get
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = TextAnalysis.bpeTrain(df.repartition(1), "text", 4)
      .collect().map(_.toSeq).toSeq
    val b = TextAnalysis.bpeTrain(df.repartition(7), "text", 4)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
