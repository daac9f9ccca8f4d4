package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation pipeline: the operators of this library
  * composed the way a real training-data build runs them, on the
  * sf0.001 documents table —
  *
  *   clean → quality filter → exact dedup → near-dedup (components)
  *         → decontaminate vs eval → stable split → mixture reweight
  *         → sequence packing → featurize
  *
  * Each stage's row-flow invariants are asserted, which is what actually
  * breaks when operators stop composing (schema drift, dropped keys,
  * duplicate resurrection).
  */
class PipelineIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("the full curation pipeline composes on real data") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n0 = raw.count()
    assert(n0 > 0)

    // 1. clean + quality signals
    val cleaned = raw.select(
      $"doc_id", $"lang",
      TextCleaning.cleanChain($"text").as("text"),
      TextAnalysis.tokenCount($"text").as("n_tokens"),
      TextAnalysis.qualityScore($"text").as("quality"))
    assert(cleaned.filter($"text".isNull).count() == 0)

    // 2. quality filter (keep docs scoring >= 1 of 3)
    val quality = cleaned.filter($"quality" >= 1)
    val n2 = quality.count()
    assert(n2 > 0 && n2 <= n0)

    // 3. exact dedup: keep the lowest doc_id per identical text
    val exact = Dedup.exact(quality, Seq("text"), "doc_id")
    val n3 = exact.count()
    assert(n3 <= n2)
    assert(exact.select("text").distinct().count() == n3) // no dup content left

    // 4. near-dedup: star-edge components, keep canonical ids
    val edges = Dedup.minhashStarEdges(exact, "doc_id", "text")
    val resolved = Dedup.canonicalize(exact.select("doc_id"), "doc_id", edges)
    val keep = exact.join(
      resolved.filter($"is_keep" === 1L).select("doc_id"), Seq("doc_id"))
    val n4 = keep.count()
    assert(n4 <= n3 && n4 > 0)

    // 5. decontaminate against a held-out eval set (here: doc_id % 7 == 0)
    val evalSet = keep.filter($"doc_id" % 7 === 0)
    val trainCand = keep.filter($"doc_id" % 7 =!= 0)
    val contaminated = Contamination
      .ngramOverlap(evalSet, trainCand, "doc_id", "text", n = 13)
      .filter($"n_hit" > 0).select($"id".as("doc_id"))
    val train = trainCand.join(contaminated, Seq("doc_id"), "left_anti")
    val n5 = train.count()
    assert(n5 <= n4)

    // 6. stable split + per-language mixture reweighting
    val split = Sampling.stableSplit(train, "doc_id")
    assert(split.select("split").distinct().count() <= 3)
    val mixed = Sampling.stratifiedSample(
      split.filter($"split" === "train"), "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.8, "es" -> 0.6, "fr" -> 0.4, "zh" -> 0.2))
    val n6 = mixed.count()
    assert(n6 > 0)

    // 7. sequence packing into 512-token bins
    val packed = Packing.packGreedy(
      mixed.select($"doc_id", $"n_tokens"), "doc_id", "n_tokens", 512L)
    assert(packed.count() == n6) // every surviving doc packed exactly once
    assert(Packing.binAudit(packed, "n_tokens", 512L)
      .filter($"within_cap" === 0L).count() == 0)

    // 8. featurize the final corpus; vectors exist for every kept doc
    val tf = Featurize.hashingTf(mixed, "doc_id", "text", numFeatures = 512)
    assert(tf.select("id").distinct().count() == n6)

    // the funnel only ever narrows, and monotonically
    assert(Seq(n0, n2, n3, n4).zip(Seq(n2, n3, n4, n5)).forall { case (a, b) => b <= a })
  }

  test("round-4 tail stages compose: segment dedup then epoch shuffle") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n0 = raw.count()

    // corpus-level line dedup BEFORE doc-level near-dedup, the CCNet
    // order: boilerplate segments must not glue unrelated docs together
    val segDeduped = Dedup.segmentDedup(raw, "doc_id", "text", width = 4)
    assert(segDeduped.count() == n0) // doc set preserved, content trimmed
    assert(segDeduped.filter($"n_kept" > $"n_segments").count() == 0)
    val trimmed = segDeduped.filter($"n_kept" > 0)
      .select($"id".as("doc_id"), $"text_dedup".as("text"))

    // exact dedup still composes on the rebuilt text
    val exact = Dedup.exact(trimmed, Seq("text"), "doc_id")
    assert(exact.count() <= trimmed.count())

    // deterministic epoch shuffle is a permutation of whatever survived
    val shuffled = Sampling.shuffleShards(exact, "doc_id", "ep0", 4)
    assert(shuffled.count() == exact.count())
    assert(shuffled.select("id").distinct().count() == exact.count())
    // epoch 2 is a different permutation of the same ids
    val ep2 = Sampling.shuffleShards(exact, "doc_id", "ep1", 4)
    assert(ep2.select("id").distinct().count() == exact.count())
    val order1 = shuffled.orderBy("shard", "pos").select("id")
      .collect().map(_.getLong(0)).toSeq
    val order2 = ep2.orderBy("shard", "pos").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(order1.toSet == order2.toSet && order1 != order2)
  }
}
