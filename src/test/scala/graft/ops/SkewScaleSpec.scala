package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Skew-guard proofs on a deliberately pathological corpus (VERDICT round 4
  * #3): one boilerplate cluster orders of magnitude larger than the cap,
  * one celebrity graph node. The claims pinned here are the 100 TB safety
  * claims in the scaladocs:
  *
  *   - an over-cap LSH bucket emits O(f) star pairs, never O(f²) cliques;
  *   - the degradation is OBSERVABLE (`rows_over_cap` metric fires);
  *   - no cluster member is silently lost (all reach the representative);
  *   - degree-oriented triangle counting stays exact under a celebrity
  *     node whose naive wedge space would be ~degree² = 10⁸.
  */
class SkewScaleSpec extends SparkSpec {

  import spark.implicits._

  /** Collect `rows_over_cap` observations whose metric name starts with
    * `prefix`, registered around one action. observe() metrics arrive on
    * the async listener bus, so the read polls with a deadline.
    */
  private def observedOverCap(prefix: String)(action: => Unit): Long = {
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith(prefix)) seen.put(name, row.getLong(0))
        }
      override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      action
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      seen.values().toArray(Array.empty[java.lang.Long]).map(_.longValue).sum
    } finally spark.listenerManager.unregister(listener)
  }

  // 2000 members of one boilerplate cluster (identical text — the worst
  // case: every band maps the whole cluster into ONE bucket) + 300
  // distinct documents.
  private val clusterSize = 2000
  private lazy val pathological = (
    (0 until clusterSize).map(i =>
      (i.toLong, "subscribe to our newsletter for updates terms privacy all rights reserved")) ++
    // every word carries i: no shared shingles between distinct docs, so
    // none of their LSH bands can legitimately collide
    (0 until 300).map(i =>
      (10000L + i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"))
  ).toDF("doc_id", "text")

  test("minhashCandidates: over-cap cluster degrades to linear star pairs and fires the metric") {
    var pairs: Array[(Long, Long)] = Array.empty
    val overCap = observedOverCap("graft.lsh.bucket_cap.") {
      pairs = Dedup.minhashCandidates(
          pathological, "doc_id", "text", numHashes = 32, bands = 8, maxBucketSize = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    // observable degradation: every cluster row sat in an over-cap bucket
    assert(overCap >= clusterSize,
      s"rows_over_cap must fire for the boilerplate cluster, got $overCap")
    // linear, not quadratic: the cluster contributes ≤ (f-1) star pairs
    // per band (deduped to f-1 when buckets coincide); uncapped it would
    // be f(f-1)/2 ≈ 2,000,000 pairs
    assert(pairs.length < 8 * clusterSize,
      s"pair space must stay O(f), got ${pairs.length}")
    // no member silently lost: every cluster doc appears in some pair
    // with the representative (min id = 0)
    val flagged = pairs.collect { case (a, b) if a == 0L => b }.toSet
    assert((1L until clusterSize.toLong).forall(flagged),
      "star degradation must still flag every member against the representative")
    // distinct docs must not be dragged into the cluster
    assert(!pairs.exists { case (a, b) => a < 10000L ^ b < 10000L },
      "no candidate pair may span the cluster and the distinct docs")
  }

  test("crossDocSpanDedup: 2000-member boilerplate cluster costs O(members), every copy fully excised") {
    // The q267 kernel has no pair join anywhere: the 2000-doc identical
    // cluster contributes 2000 gram rows per window position (semi-join
    // + k-fold explode, linear), never 2000² pairs. Every cluster doc is
    // fully removed (all its 8-grams occur in 1999 other docs); every
    // distinct doc is untouched (its i-suffixed words occur nowhere
    // else).
    val out = Dedup.crossDocSpanDedup(pathological, "doc_id", "text", 8)
    val clusterRows = out.filter(col("id") < 10000L)
      .agg(sum("n_removed"), sum("n_kept"), sum("n_spans"))
      .collect().head
    val nTok = 11L // words in the boilerplate body
    assert(clusterRows.getLong(0) == clusterSize * nTok)
    assert(clusterRows.getLong(1) == 0L)
    assert(clusterRows.getLong(2) == clusterSize.toLong) // one span each
    val distinctTouched = out.filter(col("id") >= 10000L)
      .filter(col("n_removed") > 0L).count()
    assert(distinctTouched == 0L)
  }

  test("Bipartite.projectCapped: a 20k-item bot user contributes <= k^2 pairs, normal pairs stay exact, metric fires") {
    // One bot touching 20000 items (uncapped: ~2*10^8 pairs from this
    // user alone) + 50 normal users each touching items {0,1,2}. The
    // capped projection keeps the bot's 64 rarest items (its items are
    // unique to it, frequency 1, so any 64 of them — the id tiebreak
    // makes it deterministic), bounding its pairs at 64*63/2, while the
    // (0,1),(0,2),(1,2) counts from normal users stay exactly 50 (+1
    // when the bot's kept set includes those items — it doesn't: items
    // 0..2 have frequency 51, far above its frequency-1 own items).
    val bot = (0 until 20000).map(i => (999L, 100000L + i))
    val normal = for (u <- 0 until 50; it <- 0 to 2) yield (u.toLong, it.toLong)
    val inc = (bot ++ normal).toDF("user_id", "item_id")
    var pairs: Array[(Long, Long, Long)] = Array.empty
    val overCap = observedOverCap("graft.bipartite.cap.") {
      pairs = Bipartite.projectCapped(inc, "user_id", "item_id", 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    assert(overCap == 20000L - 64L, s"metric saw $overCap dropped rows")
    val botPairs = pairs.count(p => p._1 >= 100000L)
    assert(botPairs == 64L * 63 / 2, s"bot contributed $botPairs pairs")
    val normalPairs = pairs.filter(p => p._1 < 100000L).toSet
    assert(normalPairs == Set((0L, 1L, 50L), (0L, 2L, 50L), (1L, 2L, 50L)))
  }

  test("minhashStarEdges: components over star edges equal components over cliques, at O(f) cost") {
    val edges = Dedup.minhashStarEdges(
      pathological, "doc_id", "text", numHashes = 32, bands = 8)
    val n = edges.count()
    assert(n == clusterSize - 1, s"star edges must be exactly f-1, got $n")
  }

  test("capped pair generators carry no Window node: hot-bucket caps are groupBy+join, never count-over-window") {
    // A count().over(Window.partitionBy(bucket)) materializes every row of
    // a bucket in ONE task before the cap filter drops it — a 10⁸-row
    // boilerplate bucket becomes a straggler even though its rows are
    // discarded. The map-side-combinable groupBy + join-back shape has no
    // such single-task stage (and an SMJ partition is AQE-splittable where
    // a Window partition never is). Pin: no WindowExec in any capped
    // generator's physical plan.
    val emb = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(8)(d => (i * 7 + d).toFloat / 10f))).toDF("vec_id", "embedding")
    val fps = (0 until 50).map(i => (i.toLong, (i * 2654435761L) & 0xffffffffL)).toDF("id", "fp")
    val plans = Map(
      "minhashCandidates" -> Dedup.minhashCandidates(
        pathological, "doc_id", "text", numHashes = 32, bands = 8, maxBucketSize = 64),
      "minhashStarEdges" -> Dedup.minhashStarEdges(
        pathological, "doc_id", "text", numHashes = 32, bands = 8),
      "ngramJaccardPairs" -> Dedup.ngramJaccardPairs(
        pathological, "doc_id", "text", threshold = 0.5, maxDocFreq = 64),
      "bandedHammingPairs" -> Dedup.bandedHammingPairs(
        fps, "id", "fp", nBands = 4, bandBits = 8, maxHamming = 3, maxBucketSize = 64),
      "annNearDupPairs" -> Similarity.annNearDupPairs(
        emb, "vec_id", "embedding", threshold = 0.9, dim = 8, maxBucketSize = 64)
    ).map { case (k, df) => k -> df.queryExecution.executedPlan.toString }
    // the one legitimate Window is shingleRows' per-DOCUMENT n-gram lead
    // (partition key = doc id, bounded by document length); what must
    // never appear is a Window partitioned by the BUCKET keys (band/
    // bucket/bv/sh) — that is the hot-key straggler shape
    val bucketKey = "(?i)\\b(band|bucket|bv|sh)#".r
    val offenders = plans.collect {
      case (k, p) if p.linesIterator.exists { l =>
            val t = l.dropWhile(c => !c.isLetter)
            t.startsWith("Window [") && {
              val groups = "\\[[^\\]]*\\]".r.findAllIn(t).toSeq
              // 3 groups = (functions, partition, order): flag if the
              // partition spec is over a bucket key
              groups.length == 3 && bucketKey.findFirstIn(groups(1)).isDefined
            }
          } => k
    }
    assert(offenders.isEmpty,
      s"capped generators must have no bucket-partitioned Window, found in: ${offenders.mkString(", ")}")
  }

  test("annNearDupPairs: opt-in cap degrades an embedding boilerplate cluster to star pairs") {
    // 1500 near-identical embeddings (same LSH sign pattern) + 200 spread
    val dim = 8
    val cluster = (0 until 1500).map { i =>
      (i.toLong, Array.tabulate(dim)(d => 1.0f + (i % 7) * 1e-4f + d * 0.01f))
    }
    val rest = (0 until 200).map { i =>
      (10000L + i, Array.tabulate(dim)(d => if (d == i % dim) -1.0f else ((i * 31 + d * 17) % 13 - 6) * 0.3f))
    }
    val vecs = (cluster ++ rest).toDF("vec_id", "embedding")
    var nPairs = 0L
    val overCap = observedOverCap("graft.ann.bucket_cap.") {
      nPairs = Similarity.annNearDupPairs(
          vecs, "vec_id", "embedding", threshold = 0.99, dim = dim,
          maxBucketSize = 64)
        .count()
    }
    assert(overCap >= 1500, s"ann cap metric must fire, got $overCap")
    assert(nPairs < 4 * 1500, s"ann pair space must stay O(f), got $nPairs")
    assert(nPairs >= 1499, "every cluster member must surface against the representative")
  }

  test("dual-root star: an unrelated min-id vector in the hot bucket cannot sink the cluster") {
    // the round-11 regression shape: 2000 identical embeddings + ONE
    // unrelated vector that lands in the same sign bucket with the
    // SMALLEST id. Single-root star pairs would all verify against the
    // outlier (cosine < threshold) and the cluster would vanish from dup
    // flagging; the dual-root star must keep every member flagged via
    // the second root (a genuine member).
    val dim = 4
    val cluster = (0 until 2000).map(i =>
      (1000L + i, Array(1.0f, 0.5f, 0.25f, 0.125f)))
    // same sign pattern under every hyperplane as the cluster? cheapest
    // guarantee: a positive multiple of the cluster vector plus a large
    // orthogonal-ish component that keeps all plane dots the same sign is
    // hard to construct blind — instead use a SCALED cluster vector with
    // one coordinate nudged so cosine < 0.95 but signs (hence bucket)
    // unchanged
    val outlier = Seq((1L, Array(1.0f, 0.02f, 0.02f, 0.9f)))
    val vecs = (cluster ++ outlier).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.95, dim = dim, planes = 4, maxBucketSize = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val sameBucket = Similarity.annBuckets(vecs, "embedding", dim, 4)
      .select("bucket").distinct().count()
    assume(sameBucket == 1L, "fixture must place outlier in the cluster bucket")
    // every cluster member flagged, canonical = the true min MEMBER id
    assert((1001L to 2999L).forall(i => out(i) == ((1000L, 0L))),
      "cluster members must stay flagged through the second root")
    assert(out(1000L) == ((1000L, 1L)))
    assert(out(1L) == ((1L, 1L)), "the outlier must stay a singleton keeper")
  }

  test("removeRepeatedWindows: cover stays linear under a massively repeated window") {
    // the pathological case for a substring remover: ONE hot 3-token
    // window repeated in thousands of docs. The cover expansion is w rows
    // per repeated START — linear in starts — so doubling the hot mass
    // must not super-linearly grow the output, and every hot doc must be
    // cut to the same residue.
    def corpus(n: Int) = (
      (0 until n).map(i => (i.toLong, s"head$i one two three tail$i")) ++
      Seq((900000L, "solo document with no repeats at all here"))
    ).toDF("doc_id", "text")
    for (n <- Seq(1000, 2000)) {
      val out = Dedup.removeRepeatedWindows(corpus(n), "doc_id", "text", w = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // rows stay one-per-doc (linear), and the hot window "one two three"
      // is cut from every repeated doc; head/tail tokens are covered only
      // where a repeated window spans them (headN one two / two three
      // tailN are unique per doc, so exactly tokens 1..3 go)
      assert(out.size == n + 1)
      (0 until n).foreach { i =>
        assert(out(i.toLong) == ((5L, 3L)), s"doc $i: ${out(i.toLong)}")
      }
      assert(out(900000L) == ((8L, 0L)), "unique doc must be untouched")
    }
  }

  test("importanceDigest: boilerplate cluster concentrating bucket mass stays one row per doc") {
    // the cluster puts ~87% of corpus token mass into the handful of
    // buckets its boilerplate words hash to — the pathological case for
    // the two unigram models. The scorer must stay linear: exactly one
    // output row per doc, identical docs identically scored, and the
    // score a pure function of the text (partitioning-invariant).
    val target = pathological.filter(col("doc_id") % 7 === 0)
    val out = Featurize.importanceDigest(pathological, target, "doc_id", "text")
    val rows = out.collect()
    assert(rows.length == clusterSize + 300, s"one row per doc, got ${rows.length}")
    val clusterScores = rows.filter(_.getLong(0) < clusterSize)
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(clusterScores.size == 1,
      s"identical boilerplate docs must score identically, got $clusterScores")
    val a = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Featurize.importanceDigest(
        pathological.repartition(13), target.repartition(3), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b, "scores must be partitioning-invariant")
  }

  test("temporalEvolution: exact per-day counts under a celebrity day") {
    // a 1000-edge star landing on one day: per-day rollups are hash aggs
    // over the day-edge frame, so the hot day is just 1000 rows — and
    // every count on it must still be exact.
    val ordinary = Seq(
      (1L, 1L, 2L), (1L, 1L, 2L), (1L, 2L, 3L), // day 1: 2 edges, 3 inter
      (2L, 1L, 2L), (2L, 3L, 4L) // day 2: (1,2) carried, (3,4) new
    )
    val celeb = (0 until 1000).map(i => (3L, -1L, i.toLong))
    val pairs = (ordinary ++ celeb).toDF("day", "a", "b")
    val out = Graph.temporalEvolution(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) == ((2L, 3L, 2L, 3L)), s"day 1: ${out(1L)}")
    assert(out(2L) == ((2L, 2L, 1L, 4L)), s"day 2: ${out(2L)}")
    assert(out(3L) == ((1000L, 1000L, 1000L, 1001L)), s"celebrity day: ${out(3L)}")
  }

  test("linkPrediction: the adaptive hub cap excludes a celebrity center " +
      "from the wedge join") {
    // a 200-leaf star grafted onto a small clique: uncapped, the hub
    // centers ~200²/2 = 19900 leaf-pair wedges; with the √(Σdeg) cap
    // (√420 ≈ 20) the hub (degree 200) is excluded from the CENTER role,
    // so no leaf pair may appear among the candidates (leaves share ONLY
    // the hub). The clique's low-degree wedges must still rank — the cap
    // degrades hub recall, never ordinary-node recall (the failure mode
    // that killed the 2×-mean cap: grafted leaves dragging the mean
    // below every ordinary degree).
    val clique = for {
      i <- 0L until 5L; j <- (i + 1) until 5L
    } yield (i, j)
    val star = (0 until 200).map(i => (-1L, 100L + i))
    val we = (clique ++ star).map { case (a, b) =>
      (math.min(a, b), math.max(a, b))
    }.toDF("a", "b")
    val got = Graph.linkPrediction(we, 1000).collect()
    val leafPairs = got.count(r => r.getLong(0) >= 100L && r.getLong(1) >= 100L)
    assert(leafPairs == 0,
      s"celebrity-centered wedges leaked: $leafPairs leaf pairs ranked")
    // wedge mass is bounded: candidates can only be clique-vertex pairs
    // (all existing — anti-joined away) or hub-leaf/hub-clique non-edges
    // via low-degree centers; the top-k list stays tiny, not star-sized
    assert(got.length < 300, s"candidate set exploded: ${got.length}")
  }

  test("sparse cosine pairs: a shingle past the df cap generates no " +
      "pairs; discriminative shingles still pair (q229's twin)") {
    import spark.implicits._
    // 100 docs share the boilerplate body (its shingles have df=100 > 64
    // → dropped from the index); docs 1 and 2 instead share a rare body
    // (shingle df=2 → kept). The ONLY surviving pair must be (1,2) — if
    // the cap leaked, the boilerplate shingles alone would generate
    // 100·99/2 = 4950 pairs.
    val docs = ((1L to 102L).map(i =>
        (i, "en", if (i <= 2) "alpha beta gamma delta"
        else "subscribe to our newsletter today")): Seq[(Long, String, String)])
      .toDF("doc_id", "lang", "text")
    val sh = DedupQueries.shingles(docs).select("doc_id", "sh")
    val dfx = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 64))
    val wt = sh.join(dfx, Seq("sh"))
    val pairs = wt.select(col("sh"), col("doc_id").as("a"))
      .join(wt.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
      .filter(col("b") > col("a"))
      .select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)),
      s"df cap leaked: ${pairs.length} pairs generated")
  }

  test("localClustering: exact cc under a celebrity hub — the hub and " +
      "its leaves read 0, the clique stays 10^6 (q230's twin)") {
    import spark.implicits._
    // a 5-clique (every vertex cc = 1) + a 200-leaf star on a separate
    // hub: leaves have deg 1 (cc 0 by the deg≥2 guard), the hub closes
    // no triangles (cc 0). Degree orientation means the hub CENTERS no
    // wedges — correctness must not depend on it doing so.
    val clique = for { i <- 0L until 5L; j <- (i + 1) until 5L } yield (i, j)
    val star = (0 until 200).map(i => (-1L, 100L + i.toLong))
    val cc = Graph.localClustering(
        (clique ++ star).toDF("source", "target"), "source", "target")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    (0L until 5L).foreach(v =>
      assert(cc(v) == 1000000L, s"clique vertex $v: ${cc(v)}"))
    assert(cc(-1L) == 0L, s"hub cc: ${cc(-1L)}")
    assert(cc(100L) == 0L, s"leaf cc: ${cc(100L)}")
  }

  test("conversion-latency deciles: a hot value bin (10^4 identical " +
      "latencies) stays one histogram row with exact bounds (q228's twin)") {
    import spark.implicits._
    // 10 users per latency 10,20,…,100, plus 10^4 users all at latency
    // 50 — the hot bin. Expected deciles replayed by a plain-Scala
    // reference of the SAME floor-ppm rule (gpct >= k·10^5).
    val shaped = (1 to 10).flatMap(b => (1 to 10).map(u =>
      (b * 1000L + u, b * 10L)))
    val hot = (1 to 10000).map(u => (100000L + u, 50L))
    val lats = shaped ++ hot
    val ev = lats.flatMap { case (u, l) =>
      Seq((u, "view", 1000L), (u, "purchase", 1000L + l))
    }.toDF("user_id", "event_type", "ts_sec")
    // reference: cumulative counts over the sorted value domain
    val total = lats.size.toLong
    val hist = lats.groupBy(_._2).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val cums = hist.scanLeft((0L, 0L)) { case ((_, c), (v, n)) => (v, c + n) }.drop(1)
    def upper(k: Int): Long = cums
      .find { case (_, c) => (BigInt(1000000) * c / total) >= k * 100000L }
      .get._1
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val lat = ev
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts_sec"))).over(w))
      .withColumn("tp", min(when(col("event_type") === "purchase" &&
        col("ts_sec") > col("t1"), col("ts_sec"))).over(w))
      .groupBy("user_id").agg((first("tp") - first("t1")).as("lat"))
      .filter(col("lat").isNotNull)
    val gv = lat.groupBy(col("lat").as("val")).agg(count(lit(1)).as("c"))
    val gt = gv.agg(sum("c").as("gn"))
    val gp = gv.crossJoin(broadcast(gt))
      .withColumn("gcum",
        sum("c").over(org.apache.spark.sql.expressions.Window.orderBy("val")))
      .select(col("val"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * gcum) div gn AS BIGINT)")
          .as("gpct"))
    val ks = spark.range(1, 11).select(col("id").as("k"))
    val got = broadcast(ks).join(gp, col("gpct") >= col("k") * 100000)
      .groupBy("k").agg(min("val").as("upper_latency_s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 10).foreach(k =>
      assert(got(k.toLong) == upper(k), s"decile $k: ${got(k.toLong)} != ${upper(k)}"))
    // the histogram itself is value-domain-sized: 10 distinct latencies
    assert(gv.count() == 10L)
  }

  test("quality rebalance: a bin holding ~all docs is capped per-bin, deterministically") {
    // 99% of docs share one text → one LM score → ONE perplexity bin;
    // the hash-ranked cap must hold there while tiny bins keep all their
    // docs, and the kept set must not move under repartitioning.
    val corpus = (
      (0 until 1000).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog")) ++
      (0 until 10).map(i => (5000L + i, s"rare$i words$i that$i score$i differently$i here$i"))
    ).toDF("doc_id", "text")
    def keptOf(docs: org.apache.spark.sql.DataFrame) = {
      val lm = LanguageModel.bigramLm(docs, "doc_id", "text")
      val bucketed = LanguageModel.scoreAvgCondProb(docs, "doc_id", "text", lm)
        .select(col("doc_id"), expr("avg_p_ppm div 100000").as("bucket"))
      Sampling.groupCap(bucketed, "doc_id", "bucket", k = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
    }
    val kept = keptOf(corpus)
    val perBin = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perBin.values.forall(_ <= 30), s"cap must hold per bin: $perBin")
    val hotBin = kept.filter(_._1 < 1000L).map(_._2).distinct
    assert(hotBin.length == 1, "identical docs must land in one bin")
    assert(perBin(hotBin.head) == 30, "hot bin must be capped at exactly k")
    assert(kept.count(_._1 >= 5000L) == 10, "tiny bins keep all their docs")
    assert(keptOf(corpus.repartition(17)).toSet == kept.toSet,
      "kept set must be partitioning-invariant")
  }

  test("urlDedup: a celebrity canonical group keeps exactly one doc, loses none") {
    // 2000 docs all canonicalizing to ONE page (distinct utm_* stripped,
    // www/case/port/slash normalized) — the group-agg's hottest key
    val urls = ((0 until 2000).map(i =>
      (i.toLong, s"https://WWW.Spam-Hub.com:443/landing/?utm_source=s$i")) ++
      (0 until 100).map(i => (10000L + i, s"https://site$i.com/p/$i")))
      .toDF("id", "url")
    val out = Dedup.urlDedup(urls, "id", "url").collect()
    assert(out.length == 2100) // one row per input doc, none lost
    val cluster = out.filter(_.getLong(0) < 10000L)
    assert(cluster.forall(_.getString(1) == "spam-hub.com/landing"))
    assert(cluster.forall(_.getLong(2) == 0L)) // keeper = min id
    assert(cluster.count(_.getLong(3) == 1L) == 1)
    assert(out.filter(_.getLong(0) >= 10000L).forall(_.getLong(3) == 1L))
  }

  test("gopherRules: shuffle-free plan, one row per doc on the pathological corpus") {
    val out = TextAnalysis.gopherRules(pathological, "doc_id", "text")
    // the 100 TB claim: the entire gate is one per-row pass — no Exchange
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "gopherRules must not shuffle")
    val rows = out.collect()
    assert(rows.length == clusterSize + 300)
    // the 11-word boilerplate fails the word-count rule, every copy alike
    assert(rows.filter(_.getLong(0) < 10000L).forall(_.getAs[Long]("keep") == 0L))
  }

  test("bpePairCounts: replication multiplies counts; vocabulary stage constant") {
    val docs = (0 until 50).map(i => (i.toLong, s"alpha$i beta$i"))
      .toDF("doc_id", "text")
    def counts(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bpePairCounts(df, "text", topK = 1000)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val one = counts(docs)
    val three = counts(docs.unionAll(docs).unionAll(docs))
    // weighting is exact: 3× the corpus = 3× every pair count, same vocab
    assert(three == one.map { case (p, c) => p -> 3 * c })
  }

  test("kCore: exact onion layers under a celebrity star") {
    // 10⁴-leaf star + one K4: at k=2 the leaves peel in round 1 (degree
    // 1), the hub follows in round 2 (its degree COLLAPSES 10⁴ → 0 when
    // the leaves go — the maximally skewed degree update), and the K4 is
    // the surviving 2-core. Cost shape: each round's degree agg is
    // map-side combined, so the hot hub pays its edge count once.
    val star = (1 to 10000).map(i => (0L, 100L + i.toLong))
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val edges = (star ++ k4).toDF("a", "b")
    val out = Graph.kCore(edges, k = 2, maxRounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 10005, "one row per node, none lost")
    assert((1 to 10000).forall(i => out(100L + i) == 1L), "leaves peel round 1")
    assert(out(0L) == 2L, s"hub must peel in round 2, got ${out(0L)}")
    assert((1L to 4L).forall(out(_) == 0L), "K4 is the surviving 2-core")
  }

  test("blocklistFilter: hot host stays one row per doc, longest entry wins") {
    // 2000 docs under one blocked host (one suffix key carries the whole
    // cluster into the join) + 100 distinct unblocked hosts. Both
    // spam-hub.com and its subdomain are listed: docs under the subdomain
    // must report the MORE SPECIFIC entry, the rest the parent.
    val urls = ((0 until 2000).map(i =>
      (i.toLong, s"https://${if (i % 2 == 0) "ads." else ""}spam-hub.com/l/$i")) ++
      (0 until 100).map(i => (10000L + i, s"https://site$i.org/p/$i")))
      .toDF("id", "url")
    val bl = Seq("spam-hub.com", "ads.spam-hub.com").toDF("blocked")
    val out = Sampling.blocklistFilter(urls, "id", "url", bl).collect()
    assert(out.length == 2100, "one row per input doc, none lost")
    val cluster = out.filter(_.getLong(0) < 10000L)
    assert(cluster.forall(_.getAs[Long]("is_blocked") == 1L))
    assert(cluster.forall(r => r.getAs[String]("blocked_by") ==
      (if (r.getLong(0) % 2 == 0) "ads.spam-hub.com" else "spam-hub.com")),
      "most specific matching entry must win")
    assert(out.filter(_.getLong(0) >= 10000L).forall(_.getAs[Long]("is_blocked") == 0L))
  }

  test("selectRepresentatives: one giant component resolves without a window sort") {
    // 5000-doc component (the boilerplate-cluster shape) + 100 singletons.
    // The keeper must be the unique max-quality doc; the plan must contain
    // NO Window node — the struct-min hash aggregate is the whole point
    // (a per-cluster window would sort the hot component in one partition).
    val n = 5000
    val canon = ((0 until n).map(i => (i.toLong, 0L)) ++
      (0 until 100).map(i => (100000L + i, 100000L + i)))
      .toDF("doc_id", "canonical_id")
    // quality 0..4 cycling; doc 4 is the smallest id holding the max (4)
    val scored = ((0 until n).map(i => (i.toLong, (i % 5).toLong)) ++
      (0 until 100).map(i => (100000L + i, 1L))).toDF("doc_id", "quality")
    val out = Dedup.selectRepresentatives(canon, scored, "doc_id", "quality")
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "representative argmax must be an aggregate, not a window sort")
    val rows = out.collect()
    assert(rows.length == n + 100, "one row per input doc")
    val cluster = rows.filter(_.getLong(1) == 0L)
    assert(cluster.forall(_.getAs[Long]("rep_id") == 4L),
      "max quality wins, min id breaks the tie")
    assert(cluster.count(_.getAs[Long]("is_rep") == 1L) == 1)
    assert(rows.filter(_.getLong(1) != 0L)
      .forall(r => r.getAs[Long]("rep_id") == r.getLong(0)))
  }

  test("event funnel: exact counts under a celebrity user with 10⁴ events") {
    import org.apache.spark.sql.expressions.Window
    // celebrity: 10⁴ events; first view at t=1000, first later click at
    // t=1001, first later purchase at t=1002 (the rest is bulk noise).
    // Two normal users pin the non-celebrity path: u1 full funnel with
    // known latencies, u2 view-only.
    val celeb = (0 until 10000).map { i =>
      val tp = i % 3 match {
        case 0 => "view"; case 1 => "click"; case _ => "purchase"
      }
      (-1L, tp, 1000L + i.toLong)
    }
    val normal = Seq(
      (1L, "view", 100L), (1L, "click", 160L), (1L, "purchase", 220L),
      (2L, "view", 50L))
    val ev = (celeb ++ normal).toDF("user_id", "event_type", "ts_sec")
    val w = Window.partitionBy("user_id")
    val perUser = ev
      .withColumn("t1", min(when(col("event_type") === "view", col("ts_sec"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts_sec") > col("t1"), col("ts_sec"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts_sec") > col("t2"), col("ts_sec"))).over(w))
      .groupBy("user_id")
      .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> ((opt(1), opt(2), opt(3)))
      }.toMap
    assert(perUser(-1L) == ((Some(1000L), Some(1001L), Some(1002L))),
      "celebrity funnel anchors must be the chained firsts")
    assert(perUser(1L) == ((Some(100L), Some(160L), Some(220L))))
    assert(perUser(2L) == ((Some(50L), None, None)),
      "view-only user must not convert")
  }

  test("cohort retention: exact cells under one hot cohort day") {
    // 5000 users all first-active on day 0, returning day 2; 3 users on
    // day 1. Cells must count exactly, output stays days² regardless.
    val hot = (0 until 5000).flatMap(i =>
      Seq((i.toLong, 0L), (i.toLong, 2L)))
    val cold = Seq((100000L, 1L), (100001L, 1L), (100002L, 1L))
    val days = (hot ++ cold).toDF("user_id", "day")
    val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    val cells = days.distinct().join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells == Map((0L, 0L) -> 5000L, (0L, 2L) -> 5000L, (1L, 0L) -> 3L))
  }

  test("giant hamming cluster: exact-collapse pre-step keeps every member via its group rep") {
    // the documented bandedHammingPairs contract for giant EXACT clusters:
    // collapse identical fingerprints first (hash agg), run the banded
    // pairs on the collapsed frame (buckets now small), resolve
    // components, then expand — every member of the 5000-row cluster must
    // land in its group rep's component at O(groups) pair cost.
    val cluster = (0 until 5000).map(i => (i.toLong, 0x5a5aL))
    val near = Seq((90000L, 0x5a5bL)) // Hamming 1 from the cluster fp
    val far = Seq((90001L, 0x1234L))
    val fps = (cluster ++ near ++ far).toDF("id", "fp")
    val groups = fps.groupBy("fp").agg(min("id").as("gid"), count(lit(1)).as("n"))
    val pairs = Dedup.bandedHammingPairs(
      groups.select(col("gid").as("id"), col("fp")), "id", "fp",
      nBands = 4, bandBits = 4, maxHamming = 3)
    val canon = Dedup.canonicalize(
      groups.select(col("gid").as("id")), "id", pairs)
    val full = fps.join(groups, Seq("fp"))
      .join(canon.select(col("id").as("gid"), col("canonical_id")), Seq("gid"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("canonical_id")).toMap
    // every cluster member (incl. the Hamming-1 neighbor) resolves to
    // component 0; the far fingerprint stays its own singleton
    assert((0L until 5000L).forall(full(_) == 0L))
    assert(full(90000L) == 0L, "hamming-1 neighbor must join the component")
    assert(full(90001L) == 90001L)
  }

  test("triangleStats: exact under a celebrity node (10⁴-leaf star + known triangles)") {
    val leaves = 10000
    val star = (1 to leaves).map(i => (0L, i.toLong))
    // 50 triangles THROUGH the celebrity: leaf pairs (2k-1, 2k) connected
    val through = (1 to 50).map(k => ((2 * k - 1).toLong, (2 * k).toLong))
    // 30 triangles fully outside the star
    val outside = (1 to 30).flatMap { k =>
      val base = 100000L + k * 10
      Seq((base, base + 1), (base + 1, base + 2), (base, base + 2))
    }
    val edges = (star ++ through ++ outside).toDF("src", "dst")
    val row = Graph.triangleStats(edges, "src", "dst").collect().head
    assert(row.getAs[Long]("n_triangles") == 80L,
      s"expected 50 celebrity + 30 outside triangles, got ${row.getAs[Long]("n_triangles")}")
    assert(row.getAs[Long]("n_edges") == (leaves + 50 + 90).toLong)
  }

  test("bucketized interval join (q187's rewrite) equals the naive inequality join, boundaries included") {
    // pseudo-random touches/purchases per user, including exact-boundary
    // gaps (t == p - win) that the bucket replicas must still catch
    val win = 259200L
    val touches = (1L to 400L).map { i =>
      (i % 7, 1704067200L + (i * 104729L) % (win * 4), i)
    }.toDF("user_id", "t_sec", "tid")
    val purchases = (1L to 60L).map { i =>
      // every 5th purchase sits exactly `win` after some touch's second
      val base = 1704067200L + (i * 15485863L) % (win * 4)
      val sec = if (i % 5 == 0) 1704067200L + ((i * 104729L) % (win * 4)) + win
                else base
      (i % 7, sec, 1000L + i)
    }.toDF("user_id", "p_sec", "pid")
    val naive = purchases.join(touches, Seq("user_id"))
      .filter(col("t_sec") < col("p_sec") &&
        col("t_sec") >= col("p_sec") - win)
      .select("pid", "tid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    val bucketed = purchases
      .withColumn("bk", expr(s"p_sec div $win"))
      .join(
        touches.select(col("user_id"), col("t_sec"), col("tid"),
          explode(array(expr(s"t_sec div $win"),
            expr(s"t_sec div $win") + 1)).as("bk")),
        Seq("user_id", "bk"))
      .filter(col("t_sec") < col("p_sec") &&
        col("t_sec") >= col("p_sec") - win)
      .select("pid", "tid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive,
      s"missing=${(naive -- bucketed).take(5)} extra=${(bucketed -- naive).take(5)}")
  }

  test("rolling-distinct cover explode (q185's rewrite) equals the naive range join") {
    val ad = (1L to 300L).map(i => ((i * 31L) % 40, 19700L + (i * 7L) % 25))
      .toDF("user_id", "day").distinct()
    val days = ad.select("day").distinct()
    val naive = days.as("d").join(ad.as("a"),
        col("a.day").between(col("d.day") - 6, col("d.day")))
      .groupBy(col("d.day").as("day"))
      .agg(countDistinct(col("a.user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cover = ad.select(col("user_id"),
        explode(expr("sequence(day, day + 6)")).as("day"))
      .distinct()
      .join(days, Seq("day"), "left_semi")
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cover == naive)
  }

  test("annTopKMultiProbe with zero extra probes is exactly annTopK; extra probes never lose the base bucket") {
    // The q280 superset claim, pinned structurally: probes=0 must
    // reproduce the single-bucket ranking row-for-row, and a positive
    // probe budget must return a candidate RANKING that still contains
    // every single-bucket hit (the base bucket is always probed) — a
    // probe enumeration that replaced instead of extended the base
    // bucket fails here before any recall number moves.
    val e = graft.relational.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val single = Similarity.annTopK(e, q, "vec_id", "embedding", 10, 64, 4)
    val zero = Similarity.annTopKMultiProbe(e, q, "vec_id", "embedding",
      10, 64, 4, extraProbes = 0)
    assert(rows(zero) == rows(single))
    // with probes, every single-bucket candidate id still appears in
    // the multi candidate pool (ranks may shift as better ones enter)
    val multi = Similarity.annTopKMultiProbe(e, q, "vec_id", "embedding",
      1000, 64, 4, extraProbes = 4)
    val multiIds = multi.select("q_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val singleIds = single.select("q_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(singleIds.subsetOf(multiIds),
      s"lost ${(singleIds -- multiIds).take(5)}")
  }

  test("skyline3d equals the naive quadratic skyline, duplicates and ties included") {
    // Deterministic pseudo-random triples with deliberate structure: a
    // small value domain forces exact duplicates (must survive or die
    // TOGETHER) and 2-D ties (x equal, y equal, z differing — the
    // strict-inequality cases the frontier sweep gets wrong first).
    val rows = (0 until 2000).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      (h % 13, (h / 13) % 11, (h / 143) % 7, i.toLong)
    }
    val df = rows.toDF("x", "y", "z", "id")
    def dominated(s: (Long, Long, Long, Long)) = rows.exists(r =>
      r._1 <= s._1 && r._2 >= s._2 && r._3 >= s._3 &&
        (r._1 < s._1 || r._2 > s._2 || r._3 > s._3))
    val naive = rows.filterNot(dominated).map(_._4).toSet
    val sweep = Skyline.skyline3d(df, "x", "y", "z")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sweep == naive,
      s"missing=${(naive -- sweep).take(5)} extra=${(sweep -- naive).take(5)}")
    // and under a dominated-mass shape: one optimal point kills all but
    // its own duplicates
    val mass = ((0 until 10000).map(i => (5L, 1L, 1L, i.toLong)) ++
      Seq((0L, 99L, 99L, 100001L), (0L, 99L, 99L, 100002L)))
      .toDF("x", "y", "z", "id")
    val kept = Skyline.skyline3d(mass, "x", "y", "z")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(100001L, 100002L))
  }

  test("merkleBucketDiff: divergence concentrated in one hot bucket is found exactly; identical replicas diff empty") {
    // All diverging keys share bucket (k % 64 == 3): the digest pass
    // must flag exactly that bucket and the rescan must categorize
    // every key, while the other 63 buckets never mismatch. Digest =
    // the md5-to-long idiom over (k, v).
    val a = (0 until 20000).map(i => (i.toLong, i.toLong * 3)).toDF("k", "v")
    val dg = expr("CAST(conv(substring(md5(concat(CAST(k AS STRING), " +
      "':', CAST(v AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    // b: keys ≡3 mod 64 below 1000 get v+1 (modified); key 67 deleted;
    // key 99971 (≡3 mod 64) inserted
    val b = a.filter($"k" =!= 67L)
      .withColumn("v",
        when($"k" % 64 === 3 && $"k" < 1000, $"v" + 1).otherwise($"v"))
      .unionByName(Seq((99971L, 1L)).toDF("k", "v"))
    val diff = Audit.merkleBucketDiff(a, b, "k", dg, 64)
      .collect().map(r => (r.getLong(0), r.getString(4)))
    val expectModified = (0 until 1000).map(_.toLong)
      .filter(k => k % 64 == 3 && k != 67L).toSet
    assert(diff.filter(_._2 == "modified").map(_._1).toSet == expectModified)
    assert(diff.filter(_._2 == "only_a").map(_._1).toSet == Set(67L))
    assert(diff.filter(_._2 == "only_b").map(_._1).toSet == Set(99971L))
    assert(Audit.merkleBucketDiff(a, a, "k", dg, 64).count() == 0L)
  }

  test("ThetaAggregator: a hot key repeated 2*10^4 times is one distinct; below-k set algebra is exact") {
    // The q270 kernel under a hot-key segment: 2*10^4 duplicate rows of
    // one key cost 2*10^4 O(1) sketch updates (absorbed map-side — only
    // kilobyte partials shuffle) and contribute ONE retained hash.
    // Below nominal entries the sketch is in exact mode, so every
    // estimate — including intersection and difference, the ops HLL
    // cannot do — must be exactly right, not just within bounds.
    import graft.functions.{ThetaAggregator, ThetaSketch}
    val theta = udaf(ThetaAggregator(4096),
      org.apache.spark.sql.Encoders.scalaLong)
    // A = {1..3000} (hot key 777 inside it, massively duplicated);
    // B = {777} ∪ {2001..4000}
    val a = (Seq.fill(20000)(777L) ++ (1L to 3000L)).toDF("k")
    val b = (Seq.fill(20000)(777L) ++ (2001L to 4000L)).toDF("k")
    val skA = a.agg(theta(col("k"))).collect().head.getAs[Array[Byte]](0)
    val skB = b.agg(theta(col("k"))).collect().head.getAs[Array[Byte]](0)
    assert(ThetaSketch.fromBytes(skA).getEstimate == 3000.0)
    assert(ThetaSketch.fromBytes(skB).getEstimate == 2001.0)
    assert(ThetaSketch.union(Seq(skA, skB), 4096).getEstimate == 4000.0)
    // A∩B = {777} ∪ {2001..3000} = 1001; A∖B = {1..2000}∖{777} = 1999
    assert(ThetaSketch.intersect(skA, skB).getEstimate == 1001.0)
    assert(ThetaSketch.aNotB(skA, skB).getEstimate == 1999.0)
  }

  test("mergeJoinAggView: celebrity join key regrouped by CDC equals full recompute, zero-count group evicted") {
    // Tier-7 IVM under skew: ONE join key owns 2*10^4 B rows. The CDC
    // batch deletes that key's only A row (group g1) and re-inserts it
    // under group g3 — so the whole 2*10^4-row mass must move between
    // groups via the delta joins (ΔA⋈B, delta-sized probe on A's side)
    // without ever re-scanning the untouched g2 slice, and g1 must
    // leave the view entirely (n = 0 eviction). B-side CDC lands on the
    // same hot key (inserts) and on the cold key (deletes) so both
    // cross terms fire.
    val aBase = Seq((1L, "g1"), (2L, "g2")).toDF("k", "grp")
    val bBase = ((1 to 20000).map(i => (1L, i, "1.00")) ++
      (1 to 10).map(i => (2L, i, "2.50"))).toDF("k", "line", "v")
    val aDel = Seq((1L, "g1")).toDF("k", "grp")
    val aIns = Seq((1L, "g3")).toDF("k", "grp")
    val bDel = bBase.filter(col("k") === 2L && col("line") <= 5)
    val bIns = ((20001 to 20100).map(i => (1L, i, "3.00"))).toDF("k", "line", "v")
    def recompute(adf: org.apache.spark.sql.DataFrame,
        bdf: org.apache.spark.sql.DataFrame) =
      adf.join(bdf, Seq("k")).groupBy("grp")
        .agg(count(lit(1)).as("n"),
          sum(graft.relational.Sql.dec2(col("v"))).as("s"))
    val view = recompute(aBase, bBase)
    val merged = Incremental.mergeJoinAggView(view, aBase, bBase,
        aIns, aDel, bIns, bDel, "k", Seq("grp"), "v")
      .select(col("grp"), col("n"), col("s").cast("string"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val aFinal = Seq((1L, "g3"), (2L, "g2")).toDF("k", "grp")
    val bFinal = bBase.except(bDel).unionByName(bIns)
    val expect = recompute(aFinal, bFinal)
      .select(col("grp"), col("n"), col("s").cast("string"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(merged.toSeq == expect.toSeq)
    assert(!merged.exists(_._1 == "g1"), "zero-count group not evicted")
    assert(merged.exists(t => t._1 == "g3" && t._2 == 20100L))
  }

  test("mergeComponents: a chain delta merging 2*10^4 singleton components " +
    "into one; untouched standing labels pass through unchanged") {
    // Tier-8 IVM's skew surface IS a giant merging component: the delta's
    // label-pair graph here is a 2*10^4-node chain (every standing
    // component merges into one), the worst case for the pointer-jumping
    // bound. The standing labels of an unrelated component must arrive
    // untouched, and every chain node must resolve to the global min id.
    val nChain = 20000L
    val chainLabels = spark.range(nChain)
      .select(col("id").as("node"), col("id").as("label"))
    val untouched = spark.range(1000L)
      .select((col("id") + 5000000L).as("node"), lit(5000000L).as("label"))
    val labels = chainLabels.unionByName(untouched)
    val delta = spark.range(nChain - 1)
      .select(col("id").as("a"), (col("id") + 1L).as("b"))
    val out = Incremental.mergeComponents(labels, delta, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == nChain.toInt + 1000)
    assert((0L until nChain).forall(out(_) == 0L),
      "chain must collapse to the min node id")
    assert((0L until 1000L).forall(i => out(i + 5000000L) == 5000000L),
      "untouched component's labels must pass through")
  }

  test("priority sampling: one weight 10^6x the rest stays exact-integer " +
    "and heap-selected, top-k equals the full sort") {
    // q283's skew surface: one hot weight dominating the priority
    // domain. w = 4*10^6 is ~10^6x the 1..8 base weights yet still
    // inside the documented domain bound (w < 2^23 keeps w*2^40 inside
    // int64 — 4e6 * 2^40 ~ 4.4e18 < 9.2e18), so the arithmetic stays
    // exact BIGINT end-to-end; a float path would round 2^40-scale
    // products and reorder near-ties.
    val docs = spark.range(50000L)
      .select(col("id").as("doc_id"), (col("id") % 8L + 1L).as("w"))
      .unionByName(Seq((999999L, 4000000L)).toDF("doc_id", "w"))
    val pri = docs.select(col("doc_id"), col("w"),
      expr("""(w * CAST(1099511627776 AS BIGINT)) div
        |(CAST(conv(substring(md5(concat('wsamp:',
        |CAST(doc_id AS STRING))), 1, 10), 16, 10) AS BIGINT) + 1)"""
        .stripMargin.replace("\n", " ")).as("priority"))
    val top = pri.orderBy(col("priority").desc, col("doc_id")).limit(100)
    // the plan must be the k-row-heap TakeOrderedAndProject, never a
    // global sort of the corpus
    assert(top.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    assert(top.schema("priority").dataType ==
      org.apache.spark.sql.types.LongType, "float crept into the priority")
    val got = top.collect().map(r => (r.getLong(0), r.getLong(2)))
    val full = pri.collect().map(r => (r.getLong(0), r.getLong(2)))
      .sortBy { case (id, p) => (-p, id) }.take(100)
    assert(got.toSeq == full.toSeq, "heap top-k diverged from full sort")
    assert(got.exists(_._1 == 999999L), "hot-weight doc missing from sample")
  }

  test("modularityMerges: mutual-best positive-dQ matching is exact on a " +
    "hub graph — hand-computed merges, disjoint, hub cannot over-merge") {
    // two triangles {1,2,3},{4,5,6} bridged by 3-4; partition splits the
    // first triangle ({1,2} vs {3}); hub 100 connects to all six nodes.
    // m=13; community degrees: c1=6, c3=4, c4=10, c100=6. Integer dQ
    // tests (2*m*e12 - deg1*deg2): (c1,c3)=+28, (c3,c4)=-14, (c1,c100)=+16,
    // (c3,c100)=+2, (c4,c100)=+18 -> best picks c1<->c3 and c4<->c100 are
    // the two MUTUAL pairs; the hub's tempting +16/+2 edges lose to its
    // own best and stay unmerged. Disjointness = the matching property
    // that makes the refined-Q arithmetic exact in q301.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L),
      (5L, 6L), (100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L), (100L, 5L),
      (100L, 6L)).toDF("a", "b").withColumn("w", lit(1L))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 4L),
      (6L, 4L), (100L, 100L)).toDF("v", "lbl")
    val got = Graph.modularityMerges(e, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set((1L, 3L, 2L, 6L, 4L), (4L, 100L, 3L, 10L, 6L)),
      s"got $got")
    // without the hub: only (c1,c3) qualifies mutually; (c3,c4) has
    // dQ = 2*7*1 - 3*7 < 0 and must NOT merge
    val e0 = e.filter(col("a") =!= 100L && col("b") =!= 100L)
    val got0 = Graph.modularityMerges(e0,
        labels.filter(col("v") =!= 100L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got0 == Set((1L, 3L, 2L, 4L, 3L)), s"got $got0")
  }

  test("forget cascade: one customer owning 10^4 orders stays exact and " +
    "semi/anti-join shaped") {
    // q285's skew surface: the forget set hits a celebrity customer.
    // custkeys 1, 38, 75 are ≡1 (mod 37); 38 owns 10^4 orders, everyone
    // owns 5 cold orders, every order has 2 lineitems. The cascade must
    // count exactly and stay a semi/anti-join pipeline (the hot key
    // concentrates in one join partition — no pair blowup is possible
    // in a semi-join, which is the point being pinned).
    val cust = spark.range(1L, 101L).select(col("id").as("c_custkey"))
    val forget = cust.filter(col("c_custkey") % 37 === 1)
    val orders = spark.range(10000L)
      .select((col("id") + 1000000L).as("o_orderkey"), lit(38L).as("o_custkey"))
      .unionByName(spark.range(500L)
        .select(col("id").as("o_orderkey"), (col("id") % 100L + 1L).as("o_custkey")))
    val li = orders.select(col("o_orderkey").as("l_orderkey"))
      .unionByName(orders.select(col("o_orderkey").as("l_orderkey")))
    val m = graft.relational.RelationalQueries.forgetCascade(
        forget, cust, orders, li)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m(("customer", "deleted")) == 3L && m(("customer", "kept")) == 97L)
    assert(m(("orders", "deleted")) == 10015L, s"got $m")
    assert(m(("orders", "kept")) == 485L)
    assert(m(("lineitem", "deleted")) == 20030L)
    assert(m(("lineitem", "kept")) == 970L)
    assert(m(("customer", "orphans")) == 0L && m(("orders", "orphans")) == 0L
      && m(("lineitem", "orphans")) == 0L)
  }
}
