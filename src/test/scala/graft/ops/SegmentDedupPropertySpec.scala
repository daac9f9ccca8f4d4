package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of [[Dedup.segmentDedup]] against an independent
  * in-memory reference implementation: for random corpora over a tiny
  * vocabulary (maximizing cross-doc segment collisions) the operator
  * must reproduce the exact keep-first semantics — every over-cap
  * segment survives only in its keeper doc, everything else is
  * preserved verbatim in order — and be invariant to input
  * partitioning. Fixed seeds keep CI deterministic.
  */
class SegmentDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genCorpus: Gen[List[String]] = for {
    n <- Gen.choose(1, 40)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 30)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield toks.mkString(" "))
  } yield docs

  /** Reference implementation: plain Scala, no Spark. */
  private def reference(docs: Seq[(Long, String)], width: Int,
      maxDocFreq: Int): Map[Long, (Long, Long, String)] = {
    val segs = docs.map { case (id, text) =>
      id -> text.split(" ", -1).grouped(width).map(_.mkString(" ")).toVector
    }.toMap
    val docFreq = segs.toSeq.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.sorted }
    val kept = segs.map { case (id, ss) =>
      id -> ss.filter { s =>
        val owners = docFreq(s)
        owners.size <= maxDocFreq || owners.head == id
      }
    }
    docs.map { case (id, _) =>
      id -> (segs(id).size.toLong, kept(id).size.toLong, kept(id).mkString(" "))
    }.toMap
  }

  test("segmentDedup matches the reference on random corpora") {
    for (seedNo <- 0 until 6) {
      val docs = genCorpus(Gen.Parameters.default, Seed(seedNo.toLong)).get
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      for (width <- Seq(1, 2, 3); maxDf <- Seq(1, 2)) {
        val want = reference(docs, width, maxDf)
        val got = Dedup
          .segmentDedup(docs.toDF("doc_id", "text").repartition(5),
            "doc_id", "text", width, maxDf)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
          .toMap
        assert(got == want, s"seed=$seedNo width=$width maxDf=$maxDf")
      }
    }
  }
}
