package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks for the round-5 curation operators, each against
  * an independent brute-force reference on random inputs (fixed seeds —
  * deterministic CI).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val genVocab: Gen[List[String]] = for {
    n <- Gen.choose(2, 40)
    ws <- Gen.listOfN(n, Gen.choose(1, 6).flatMap(l =>
      Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
  } yield ws

  test("editDistance1Pairs equals brute-force edit-distance-1 pairs (blocking completeness)") {
    // small alphabet forces dense collisions — the hardest case for
    // blocking SOUNDNESS; completeness is the SymSpell theorem under test
    for (seedNo <- 0 until 10) {
      val vocab = genVocab(Gen.Parameters.default, Seed(seedNo.toLong))
        .getOrElse(Nil).distinct
      val expected = (for {
        a <- vocab; b <- vocab if a < b && lev(a, b) <= 1
      } yield (a, b)).toSet
      val got = Dedup.editDistance1Pairs(vocab.toDF("w"), "w")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == expected,
        s"seed=$seedNo vocab=$vocab missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("repeatedWindows: window count formula and repetition bounds on random corpora") {
    val genDocs: Gen[List[String]] = for {
      n <- Gen.choose(1, 20)
      docs <- Gen.listOfN(n, Gen.choose(0, 20).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf("x", "y", "z")).map(_.mkString(" "))))
    } yield docs
    for (seedNo <- 0 until 6) {
      val docs = genDocs(Gen.Parameters.default, Seed(100L + seedNo))
        .getOrElse(Nil).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.repeatedWindows(docs.toDF("doc_id", "text"), "doc_id", "text", w = 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      docs.foreach { case (id, text) =>
        val n = text.split(" ").count(_.nonEmpty)
        val (nw, nr) = got(id)
        assert(nw == math.max(0, n - 2), s"doc $id '$text': windows $nw")
        assert(nr >= 0 && nr <= nw, s"doc $id: repeated $nr of $nw")
      }
      // duplicating the whole corpus makes EVERY window repeated
      val doubled = (docs ++ docs.map { case (id, t) => (id + 1000L, t) })
        .toDF("doc_id", "text")
      val all = Dedup.repeatedWindows(doubled, "doc_id", "text", w = 3)
        .collect()
      all.foreach { r =>
        assert(r.getLong(2) == r.getLong(1),
          s"doc ${r.getLong(0)}: corpus duplicated but only ${r.getLong(2)}/${r.getLong(1)} windows repeated")
      }
    }
  }

  test("removeRepeatedWindows: brute-force parity on random corpora") {
    def bruteClean(corpus: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String)] = {
      val toks = corpus.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toVector }.toMap
      val winCount = scala.collection.mutable.Map.empty[String, Int]
      for ((_, ts) <- toks; win <- ts.sliding(w) if win.length == w)
        winCount(win.mkString(" ")) = winCount.getOrElse(win.mkString(" "), 0) + 1
      toks.map { case (id, ts) =>
        val covered = ts.indices.filter { s =>
          s + w <= ts.length && winCount(ts.slice(s, s + w).mkString(" ")) > 1
        }.flatMap(s => s until s + w).toSet
        val kept = ts.indices.filterNot(covered).map(ts)
        id -> ((ts.length.toLong, (ts.length - kept.length).toLong,
          kept.mkString(" ")))
      }
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val genDocs: Gen[List[String]] = for {
      n <- Gen.choose(1, 15)
      docs <- Gen.listOfN(n, Gen.choose(0, 14).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf("x", "y", "z")).map(_.mkString(" "))))
    } yield docs
    for (seedNo <- 0 until 5) {
      val docs = genDocs(Gen.Parameters.default, Seed(500L + seedNo))
        .getOrElse(Nil).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = bruteClean(docs, w = 3)
      val got = Dedup.removeRepeatedWindows(
          docs.toDF("doc_id", "text"), "doc_id", "text", w = 3)
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got.keySet == expected.keySet)
      for ((id, (n, removed, cleaned)) <- expected) {
        assert(got(id) == ((n, removed, md5hex(cleaned))),
          s"seed=$seedNo doc $id: got ${got(id)}, want ($n, $removed, md5('$cleaned'))")
      }
    }
  }

  test("containmentPairs (uncapped) equals brute-force one-sided Jaccard") {
    def shingles(t: String): Set[String] = {
      val toks = t.split("\\s+").filter(_.nonEmpty)
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val genDocs: Gen[List[String]] = for {
      n <- Gen.choose(2, 15)
      docs <- Gen.listOfN(n, Gen.choose(1, 12).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf("p", "q", "r", "s")).map(_.mkString(" "))))
    } yield docs
    for (seedNo <- 0 until 8) {
      val docs = genDocs(Gen.Parameters.default, Seed(500L + seedNo))
        .getOrElse(Nil).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingles(ta); sb = shingles(tb)
        shared = (sa intersect sb).size if shared > 0
        c = shared.toDouble / math.min(sa.size, sb.size) if c >= 0.5
      } yield (ia, ib, c)).toSet
      val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", threshold = 0.5, maxDocFreq = Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"seed=$seedNo missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("LM scores are bounded and perfect self-transitions score exactly 1e6 ppm") {
    val docs = (0 until 30).map(i => (i.toLong, s"w$i w$i w$i w$i")).toDF("doc_id", "text")
    val lm = LanguageModel.bigramLm(docs, "doc_id", "text")
    // each doc's only bigram (w_i, w_i) is that context's only transition:
    // p = 1 exactly, so every score is exactly 1e6
    val scores = LanguageModel.scoreAvgCondProb(docs, "doc_id", "text", lm)
      .collect().map(_.getLong(2))
    assert(scores.length == 30 && scores.forall(_ == 1000000L))
  }
}
