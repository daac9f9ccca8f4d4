package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"), // near-dup of 0
    (2L, "completely different content about spark query engines and shuffles"),
    (3L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (4L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per identical content") {
    val kept = Dedup.exact(docs, Seq("text"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 1L, 2L, 4L)) // 3 deduped against 0
  }

  test("crossDocSpanDedup: variable-length shared run excised from all copies, sub-k runs kept") {
    import spark.implicits._
    // A and B share a 12-token run (>= k=8): A's positions 4..15, B's
    // 2..13. C and D share only a 7-token run (< k): untouched.
    val shared = (5 to 16).map(i => s"a$i").mkString(" ")
    val sub = (1 to 7).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, (1 to 4).map(i => s"a$i").mkString(" ") + " " + shared +
        " " + (17 to 20).map(i => s"a$i").mkString(" ")), // 20 tokens
      (2L, "b1 b2 " + shared + " b3 b4"),                 // 16 tokens
      (3L, "c1 c2 " + sub + " c3"),
      (4L, "d1 " + sub + " d2 d3")
    ).toDF("doc_id", "text")
    val out = Dedup.crossDocSpanDedup(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((20L, 12L, 1L, 8L)))  // one maximal 12-token span
    assert(out(2L) == ((16L, 12L, 1L, 4L)))
    assert(out(3L) == ((10L, 0L, 0L, 10L)))  // 7-run below threshold
    assert(out(4L) == ((10L, 0L, 0L, 10L)))
  }

  test("minhash LSH finds the near-dup pair and Jaccard verifies it") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((0L, 1L)))
    assert(nd.contains((0L, 3L))) // exact dup also caught
    assert(!nd.exists { case (a, b) => a == 2L || b == 2L }) // unrelated doc clean
  }

  test("ngram Jaccard pairs: hot-shingle cap prunes boilerplate-only pairs") {
    // 20 docs sharing ONE boilerplate shingle + unique content each, plus a
    // genuine near-dup pair (0 and 100). Uncapped, the boilerplate shingle
    // alone contributes 20*19/2 = 190 candidate pairs; capped, it is
    // dropped and only the real near-dup survives.
    val boiler = "terms of service apply"
    val skewed = ((0 until 20).map { i =>
      (i.toLong, s"$boiler unique content number $i with extra words ${i * 7} ${i * 13}")
    } :+ (100L, "unique content number 0 with extra words 0 0 trailing")).toDF("doc_id", "text")

    val uncapped = Dedup.ngramJaccardPairs(skewed, "doc_id", "text",
      threshold = 0.0, maxDocFreq = Int.MaxValue)
    val capped = Dedup.ngramJaccardPairs(skewed, "doc_id", "text",
      threshold = 0.0, maxDocFreq = 10)
    val un = uncapped.count()
    val cp = capped.count()
    assert(un >= 190, s"uncapped should include all boilerplate pairs, got $un")
    assert(cp < un / 4, s"cap should prune the quadratic pair space: $cp vs $un")
    // the genuine near-dup pair is built from sub-cap shingles and survives
    assert(capped.filter($"id_a" === 0L && $"id_b" === 100L).count() == 1)
  }

  test("LSH bucket cap bounds pair fan-out; star edges keep full connectivity") {
    // one 200-doc exact-duplicate cluster (every band → one hot bucket)
    // plus a small genuine near-dup pair outside it
    val cluster = (0 until 200).map(i => (i.toLong, "identical boilerplate text repeated across the corpus many times"))
    val skewed = (cluster ++ Seq(
      (500L, "a genuinely small pair of similar documents about spark engines"),
      (501L, "a genuinely small pair of similar documents about spark engines today")
    )).toDF("doc_id", "text")

    // uncapped: the hot bucket alone is 200*199/2 = 19900 pairs
    val uncapped = Dedup.minhashCandidates(skewed, "doc_id", "text",
      maxBucketSize = Int.MaxValue).count()
    assert(uncapped >= 19900L, s"expected the quadratic blow-up, got $uncapped")

    // capped: the hot bucket degrades to DUAL-ROOT star pairs — every
    // cluster member still flagged (vs the bucket's two smallest ids, so
    // one unrelated min-id collision can't sink the cluster), O(2f) pairs,
    // not f²; the small genuine pair survives as a clique pair
    val capped = Dedup.minhashCandidates(skewed, "doc_id", "text", maxBucketSize = 64)
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPairs.contains((500L, 501L)))
    assert(cappedPairs.size <= 2L * 200L + 2L, s"cap did not linearize the hot bucket: ${cappedPairs.size}")
    // no document silently lost: every cluster member appears in a pair
    val flagged = cappedPairs.flatMap(p => Seq(p._1, p._2))
    assert((0L until 200L).forall(flagged.contains), "cap dropped cluster members")

    // star edges: LINEAR in cluster size (199 edges for the 200-doc cluster,
    // 1 for the pair — modulo cross-band duplicates removed by distinct)
    val star = Dedup.minhashStarEdges(skewed, "doc_id", "text")
    val starCount = star.count()
    assert(starCount <= 200L + 2L, s"star edges not linear: $starCount")

    // and components over star edges resolve the full cluster
    val labels = Dedup.connectedComponents(star, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 200L).forall(labels(_) == 0L))
    assert(labels(501L) == 500L)
  }

  test("nearDuplicates: maxBucketSize=Int.MaxValue restores exact pair recall") {
    // 10 exact-duplicate docs: capped at 4, over-cap buckets degrade to
    // DUAL-ROOT star pairs (vs the two smallest ids); uncapped emits the
    // full 45-pair clique. Dual-root star on ids 0..9 = (0,x) for x in
    // 1..9 plus (1,x) for x in 2..9 = 17 pairs.
    val cluster = (0 until 10).map(i =>
      (i.toLong, "same text body for every document in this tiny cluster")).toDF("doc_id", "text")
    val exactPairs = Dedup.nearDuplicates(cluster, "doc_id", "text",
      threshold = 0.5, maxBucketSize = Int.MaxValue).count()
    val starPairs = Dedup.nearDuplicates(cluster, "doc_id", "text",
      threshold = 0.5, maxBucketSize = 4).count()
    assert(exactPairs == 45L, s"uncapped should emit the full clique, got $exactPairs")
    assert(starPairs == 17L, s"capped should emit dual-root star pairs only, got $starPairs")
  }

  test("connected components resolve chains, stars, and unpaired docs") {
    // chain 1-2-3-4-9 (diameter 4, exercises >1 iteration), pair 5-6,
    // and 7 unpaired (absent from pairs entirely)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L))

    val docs = (1L to 9L).toDF("doc_id")
    val resolved = Dedup.canonicalize(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val canon = resolved.map(t => t._1 -> t._2).toMap
    assert(canon(7L) == 7L) // unpaired doc is its own canonical
    assert(canon(8L) == 8L)
    assert(resolved.filter(_._3 == 1L).map(_._1).sorted.toSeq ==
      Seq(1L, 5L, 7L, 8L)) // one keeper per cluster + all unpaired
  }

  test("simhash: identical texts equal, near-dups close, unrelated far") {
    val sh = docs.withColumn("sh", Dedup.simhash64("text"))
      .select("doc_id", "sh").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    val near = java.lang.Long.bitCount(sh(0L) ^ sh(1L))
    val far = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    assert(near < far, s"near=$near far=$far")
    // hammingDistance column matches JVM bitCount
    val hd = docs.filter($"doc_id" === 1L)
      .withColumn("sh", Dedup.simhash64("text"))
      .select(Dedup.hammingDistance($"sh", lit(sh(0L)))).first().getInt(0)
    assert(hd == near)
  }

  test("simhash64 is parser-mode independent (escapedStringLiterals)") {
    // the SQL entry flips spark.sql.parser.escapedStringLiterals session-
    // wide; the fingerprint expression must tokenize identically under
    // both parser modes (regression: a '\\s+' literal degenerated to a
    // non-splitting regex under the flipped mode — whole-text votes)
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha")).toDF("doc_id", "text")
    def fps() = df.select($"doc_id", Dedup.simhash64("text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = fps()
    val old = spark.conf.getOption("spark.sql.parser.escapedStringLiterals")
    try {
      spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
      assert(fps() == base, "fingerprints changed under the flipped parser")
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.parser.escapedStringLiterals", v)
      case None => spark.conf.unset("spark.sql.parser.escapedStringLiterals")
    }
    // and the tokenizer actually splits: a multi-token text must not
    // fingerprint like a single token (the degenerate whole-text mode
    // would give "alpha beta gamma" the hash of one token)
    assert(base(1L) != base(2L), "multi-token text must differ from one token")
  }

  test("brute-force cosine topK is exact and ANN agrees within its bucket") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Array(0.8f, 0.2f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    val top = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 2)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(top == Seq((1L, 1), (4L, 2))) // nearest by cosine
    val ann = Similarity.annTopK(vecs, q, "vec_id", "embedding", k = 2, dim = 4, planes = 4)
      .collect().map(_.getLong(1)).toSet
    assert(ann.subsetOf(Set(1L, 4L, 2L))) // candidates only from q's bucket

    val pairs = Similarity.annNearDupPairs(vecs, "vec_id", "embedding", threshold = 0.97, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // the two nearly-identical vectors
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }) // opposite vector excluded
  }

  test("ANN near-dup bucket cap linearizes identical-embedding clusters") {
    // 120 identical embeddings (one hot bucket) + a separate genuine pair:
    // the skew shape an embedding near-dup corpus always contains
    val cluster = (0 until 120).map(i => (i.toLong, Array(1.0f, 0.0f, 0.0f, 0.0f)))
    val vecs = (cluster ++ Seq(
      (500L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (501L, Array(0.0f, 0.99f, 0.14f, 0.0f))
    )).toDF("vec_id", "embedding")
    val uncapped = Similarity.annNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, dim = 4, maxBucketSize = Int.MaxValue).count()
    assert(uncapped >= 120L * 119 / 2, s"expected the quadratic clique, got $uncapped")
    val capped = Similarity.annNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, dim = 4, maxBucketSize = 32)
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size <= 2L * 120L + 1L, s"cap did not linearize the hot bucket: ${pairs.size}")
    // every cluster member still flagged against the representative
    val flagged = pairs.flatMap(p => Seq(p._1, p._2))
    assert((0L until 120L).forall(flagged.contains), "cap dropped cluster members")
    // the small genuine pair is untouched by the cap
    assert(pairs.contains((500L, 501L)))
  }

  test("semanticDedup (scale path) recalls injected copies into their seed's component") {
    // the q160 shape, miniature: seeds + scaled copies (identical
    // direction -> same sign bucket, guaranteed) + one unrelated vector
    val seeds = Seq(
      (0L, Array(1.0f, 0.2f, -0.3f, 0.5f)),
      (1L, Array(-0.4f, 0.9f, 0.1f, -0.2f)),
      (2L, Array(0.3f, -0.7f, 0.6f, 0.1f)))
    val copies = seeds.map { case (id, v) => (id + 100L, v.map(_ * 2.0f)) }
    val lone = Seq((50L, Array(-1.0f, -0.2f, 0.3f, -0.5f)))
    val vecs = (seeds ++ copies ++ lone).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.99, dim = 4, planes = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every scaled copy: non-keep, canonical = its seed
    for ((id, _) <- seeds) {
      assert(out(id + 100L) == (id, 0L), s"copy of $id: ${out(id + 100L)}")
      assert(out(id) == (id, 1L), s"seed $id must be its own keeper")
    }
    // the unrelated vector is a singleton keeper
    assert(out(50L) == (50L, 1L))
  }

  test("ANN paths run the native dot product, not the interpreted lambda") {
    // A session that never loaded GraftExtensions: the operators must
    // self-register, or the ~10x-slower ArrayAggregate lambda path runs.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    for (df <- Seq(
        Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 1),
        Similarity.annTopK(vecs, q, "vec_id", "embedding", k = 1, dim = 4),
        Similarity.annNearDupPairs(vecs, "vec_id", "embedding", 0.5, dim = 4))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_dot"), s"native dot missing from plan:\n$plan")
      assert(!plan.contains("aggregate("),
        s"interpreted ArrayAggregate survived optimization:\n$plan")
    }
  }

  test("IVF: clustered vectors land in one list; probe-1 search finds true neighbors") {
    // three well-separated clusters around axis directions
    def jig(i: Int): Float = (i % 3) * 0.01f
    val vecs = (0 until 30).map { i =>
      val c = i / 10 // cluster
      val base = Array.fill(4)(0.0f)
      base(c) = 1.0f
      (i.toLong, base.map(_ + jig(i)))
    }.toDF("vec_id", "embedding")

    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding", k = 3, iters = 4)
    assert(cents.count() == 3)
    val assigned = Similarity.assignToNearest(vecs, cents, "vec_id", "embedding")
    // every vector of a cluster maps to the same list
    val lists = assigned.collect()
      .map(r => (r.getAs[Long]("vec_id") / 10, r.getAs[Long]("centroid_id")))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    assert(lists.values.forall(_.size == 1), s"clusters split across lists: $lists")

    val q = vecs.filter($"vec_id" === 0L)
    val ivf = Similarity.ivfTopK(vecs, q, "vec_id", "embedding",
      k = 3, nLists = 3, nprobe = 1, iters = 4)
      .collect().map(_.getLong(1)).toSet
    val brute = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .collect().map(_.getLong(1)).toSet
    assert(ivf == brute, s"ivf=$ivf brute=$brute") // neighbors are in-cluster
  }

  test("ivfCentroids: closed-form means on separated clusters, bit-deterministic") {
    // init = first k by id, so put one point of each cluster first: the
    // first Lloyd assignment is already perfect and the centroid means
    // are exact rationals the decimal-bridged mean must reproduce bit-for-bit
    val pts = Seq(
      (0L, Array(0f, 0f)), (1L, Array(10f, 10f)),
      (2L, Array(0f, 2f)), (3L, Array(2f, 0f)), (4L, Array(2f, 2f)),
      (5L, Array(10f, 12f)), (6L, Array(12f, 10f)), (7L, Array(12f, 12f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(pts, "vec_id", "embedding", k = 2, iters = 3)
      .collect()
      .map(r => r.getAs[Long]("centroid_id") -> r.getSeq[Double](1).toList)
      .toMap
    assert(cents == Map(0L -> List(1.0, 1.0), 1L -> List(11.0, 11.0)),
      s"got $cents")
    // determinism: an independent training run over a differently
    // partitioned copy of the same points must produce identical bits
    val again = Similarity.ivfCentroids(
        pts.repartition(7), "vec_id", "embedding", k = 2, iters = 3)
      .collect()
      .map(r => r.getAs[Long]("centroid_id") -> r.getSeq[Double](1).toList)
      .toMap
    assert(again == cents)
  }

  test("pqCodes: subspace-independent codes, closed-form on separated clusters") {
    // 4-dim vectors, m=2 → two 2-dim subspaces. Subspace clusters are
    // chosen independently: dims 1-2 cluster around (0,0)/(10,10) while
    // dims 3-4 cluster the OTHER way for some rows, so the per-subspace
    // codes must disagree — a whole-vector quantizer could not produce
    // this code table.
    val pts = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (1L, Array(10f, 10f, 10f, 10f)),
      (2L, Array(0f, 2f, 10f, 12f)),   // sub0 near cluster A, sub1 near B
      (3L, Array(10f, 12f, 0f, 2f)),   // sub0 near B, sub1 near A
      (4L, Array(2f, 2f, 2f, 2f)), (5L, Array(12f, 12f, 12f, 12f))
    ).toDF("vec_id", "embedding")
    val codes = Similarity.pqCodes(pts, "vec_id", "embedding", m = 2, k = 2, iters = 2)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("code_0"), r.getAs[Long]("code_1"))).toMap
    // init ids 0/1 seed codebooks [A,B] in both subspaces
    assert(codes(0L) == (0L, 0L) && codes(4L) == (0L, 0L))
    assert(codes(1L) == (1L, 1L) && codes(5L) == (1L, 1L))
    assert(codes(2L) == (0L, 1L), s"got ${codes(2L)}")
    assert(codes(3L) == (1L, 0L), s"got ${codes(3L)}")
    // deterministic across partitionings
    val again = Similarity.pqCodes(pts.repartition(5), "vec_id", "embedding",
        m = 2, k = 2, iters = 2)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("code_0"), r.getAs[Long]("code_1"))).toMap
    assert(again == codes)
  }

  test("ivfPqCodes: coarse routing + residual codes, deterministic") {
    import spark.implicits._
    // two well-separated coarse clusters; within each, residuals split
    // the SAME way in both subspaces (±1 around the cluster center), so
    // the residual codebooks must distinguish rows the coarse list can't
    val pts = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (1L, Array(2f, 2f, 2f, 2f)),
      (2L, Array(100f, 100f, 100f, 100f)), (3L, Array(102f, 102f, 102f, 102f)),
      (4L, Array(0f, 0f, 2f, 2f)), (5L, Array(102f, 102f, 100f, 100f))
    ).toDF("vec_id", "embedding")
    val coarse = Similarity.ivfCentroids(pts, "vec_id", "embedding", k = 2, iters = 2)
    val out = Similarity.ivfPqCodes(pts, "vec_id", "embedding", coarse,
        m = 2, k = 2, iters = 2)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> (r.getAs[Long]("list_id"),
        (r.getAs[Long]("code_0"), r.getAs[Long]("code_1")))).toMap
    // coarse routing: rows 0/1/4 in list of init-id 0, rows 2/3/5 the other
    assert(Set(0L, 1L, 4L).map(out(_)._1).size == 1)
    assert(Set(2L, 3L, 5L).map(out(_)._1).size == 1)
    assert(out(0L)._1 != out(2L)._1)
    // residual codes separate within-list structure: row 4 matches row 0
    // in subspace 0 but row 1 in subspace 1 (and 5 mirrors in list B)
    assert(out(4L)._2._1 == out(0L)._2._1 && out(4L)._2._2 == out(1L)._2._2,
      s"got $out")
    assert(out(5L)._2._1 == out(3L)._2._1 && out(5L)._2._2 == out(2L)._2._2,
      s"got $out")
    // deterministic across partitionings
    val again = Similarity.ivfPqCodes(pts.repartition(5), "vec_id",
        "embedding", coarse, m = 2, k = 2, iters = 2)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> (r.getAs[Long]("list_id"),
        (r.getAs[Long]("code_0"), r.getAs[Long]("code_1")))).toMap
    assert(again == out)
  }

  test("pqAdcTopK/pqSearch: compressed-domain ranking finds cluster-mates") {
    import spark.implicits._
    // two tight clusters per subspace; each point's true nearest neighbor
    // is its cluster-mate, which ADC must recover from codes alone
    val pts = Seq(
      (0L, Array(1f, 2f, 1f, 2f)), (1L, Array(2f, 1f, 2f, 1f)),
      (2L, Array(10f, 30f, 10f, 30f)), (3L, Array(11f, 31f, 11f, 31f))
    ).toDF("vec_id", "embedding")
    val adc = Similarity.pqAdcTopK(pts, pts, "vec_id", "embedding",
        k = 1, m = 2, kCent = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(adc == Map(0L -> 1L, 1L -> 0L, 2L -> 3L, 3L -> 2L), s"got $adc")
    // the re-ranked pipeline agrees with brute force on this fixture
    val exact = Similarity.bruteForceTopK(pts, pts, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = Similarity.pqSearch(pts, pts, "vec_id", "embedding",
        k = 1, shortlist = 3, m = 2, kCent = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rr == exact)
  }

  test("persisted IVF index: search runs zero training work") {
    def jig(i: Int): Float = (i % 3) * 0.01f
    val vecs = (0 until 30).map { i =>
      val c = i / 10
      val base = Array.fill(4)(0.0f)
      base(c) = 1.0f
      (i.toLong, base.map(_ + jig(i)))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString

    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", dir, nLists = 3, iters = 4)
    val fromIndex = Similarity.searchIvf(spark, dir, q, "vec_id", "embedding",
      k = 3, nprobe = 1)
    val inMemory = Similarity.ivfTopK(vecs, q, "vec_id", "embedding",
      k = 3, nLists = 3, nprobe = 1, iters = 4)
    assert(fromIndex.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ==
      inMemory.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)

    // training leaves a posexplode (element-wise centroid mean) in the plan;
    // a real index search must not contain it, and must read the index files
    val plan = fromIndex.queryExecution.optimizedPlan.toString
    assert(!plan.contains("posexplode"), s"Lloyd work in search plan:\n$plan")
    assert(fromIndex.queryExecution.sparkPlan.toString.contains("lists"),
      "search does not scan the persisted lists")

    // job-count: the search action itself should need only a handful of
    // jobs (scan+broadcast+rank), nowhere near one per Lloyd iteration
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Similarity.searchIvf(spark, dir, q, "vec_id", "embedding", k = 3, nprobe = 1)
      .collect()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // 4 Lloyd iterations alone cost ~15 jobs; search stays under 10
    assert(after - before <= 10, s"search ran ${after - before} jobs")
  }

  test("persisted IVF-PQ index: compressed-domain search recovers cluster " +
    "neighbors; cross-list ADC keeps the coarse term") {
    def jig(i: Int): Float = (i / 3 % 5) * 0.02f
    // 3 well-separated one-hot clusters of 10, INTERLEAVED (cluster =
    // i % 3) so the trainer's first-k-ids init spans all three and Lloyd
    // provably separates them; 8-dim so m=4 subspaces
    val vecs = (0 until 30).map { i =>
      val base = Array.fill(8)(0.0f)
      base(i % 3) = 1.0f
      (i.toLong, base.map(_ + jig(i)))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val coarse = Similarity.ivfCentroids(vecs, "vec_id", "embedding",
      k = 3, iters = 4)
    Similarity.buildIvfPqIndex(vecs, "vec_id", "embedding", coarse, dir,
      dim = 8, m = 4, kCent = 4, iters = 2)
    // nprobe=1: every returned neighbor must come from q's own cluster,
    // and with the exact re-rank the top-k must equal brute force
    val q = vecs.filter($"vec_id" === 0L || $"vec_id" === 25L)
    val got = Similarity.searchIvfPq(spark, dir, vecs, q, "vec_id",
      "embedding", k = 3, dim = 8, nprobe = 1, shortlist = 10, m = 4,
      kCent = 4)
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet == exact)
    // the index holds codes only — no raw vectors in the lists files
    val listCols = Similarity.readLists(spark, dir).columns.toSet
    assert(listCols == (0 until 4).map(j => s"code_$j").toSet + "id" + "list_id",
      s"lists should hold only ids + codes, got $listCols")
    // search runs zero Lloyd work (no posexplode = no centroid mean pass)
    val plan = got.queryExecution.optimizedPlan.toString
    assert(!plan.contains("posexplode"), s"training work in search plan:\n$plan")
  }

  test("IVF-PQ index update: upsert/delete rewrites ONLY touched list " +
    "partitions; idempotent re-apply") {
    def jig(i: Int): Float = (i / 3 % 5) * 0.02f
    val vecs = (0 until 30).map { i =>
      val base = Array.fill(8)(0.0f)
      base(i % 3) = 1.0f
      (i.toLong, base.map(_ + jig(i)))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_upd").toString
    val coarse = Similarity.ivfCentroids(vecs, "vec_id", "embedding",
      k = 3, iters = 4)
    Similarity.buildIvfPqIndex(vecs, "vec_id", "embedding", coarse, dir,
      dim = 8, m = 4, kCent = 4, iters = 2)
    def listState(): Map[String, Long] =
      Similarity.listPartitionPaths(spark, dir).toSeq.flatMap {
        case (pd, path) =>
          new java.io.File(path).listFiles()
            .filter(_.getName.endsWith(".parquet"))
            .map(f => s"$pd/${f.getName}" -> f.lastModified())
      }.toMap
    val before = listState()
    // delta entirely within cluster 0 (vec_ids ≡ 0 mod 3): remove 0,
    // upsert a replacement for 3 and a new vector 100 — only cluster 0's
    // list partition may be rewritten
    val c0 = Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val added = Seq((3L, c0.map(_ + 0.01f)), (100L, c0))
      .toDF("vec_id", "embedding")
    val removed = Seq(Tuple1(0L)).toDF("vec_id")
    Similarity.updateIvfPqIndex(spark, dir, added, removed,
      "vec_id", "embedding", dim = 8, m = 4)
    val afterIds = Similarity.readLists(spark, dir)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!afterIds.contains(0L) && afterIds.contains(100L)
      && afterIds.contains(3L))
    assert(afterIds.size == 30) // 30 - 1 removed + 1 new; 3 replaced in place
    // physical claim: partitions untouched by the delta keep their files
    val after = listState()
    val touchedDirs = after.keySet.filter(k => before.get(k) != after.get(k))
      .map(_.split("/")(0)) ++ before.keySet.diff(after.keySet).map(_.split("/")(0))
    assert(touchedDirs.size == 1,
      s"expected exactly one rewritten list partition, got $touchedDirs")
    // idempotence: re-applying the same delta leaves the same row set
    Similarity.updateIvfPqIndex(spark, dir, added, removed,
      "vec_id", "embedding", dim = 8, m = 4)
    val again = Similarity.readLists(spark, dir)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(again.size == 30 && again.toSet == afterIds,
      "re-applying the delta must not duplicate or drop rows")
  }

  test("text index update: upsert/delete rewrites ONLY touched bucket " +
    "partitions; search from the standing index; idempotent re-apply") {
    // tiny single-token docs so each doc's postings land in exactly one
    // term bucket — a delta touching terms {aa} must leave every other
    // bucket's files untouched (distinct terms chosen to spread buckets)
    val terms = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val base = terms.zipWithIndex.map { case (t, i) => (i.toLong, s"$t $t") }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtidx").toString
    TextIndex.buildPhraseIndex(base, "doc_id", "text", dir, nBuckets = 8)
    def bucketState(): Map[String, Long] =
      TextIndex.partitionPaths(spark, dir, "postings").toSeq
        .flatMap { case (pd, path) =>
          new java.io.File(path).listFiles()
            .filter(_.getName.endsWith(".parquet"))
            .map(f => s"$pd/${f.getName}" -> f.lastModified())
        }.toMap
    val before = bucketState()
    // the buckets "aa" and "bb" route to (delta terms); others must stay
    val deltaBuckets = Seq("aa", "bb").map(t =>
      Seq(Tuple1(t)).toDF("term")
        .select(pmod(hash(col("term")), lit(8)))
        .head().getInt(0)).toSet
    // delta: remove doc 1 (all-"bb" postings), upsert doc 0 with new
    // "aa"-only text, add doc 100 ("aa aa aa")
    val added = Seq((0L, "aa aa aa aa"), (100L, "aa aa aa"))
      .toDF("doc_id", "text")
    val removed = Seq(Tuple1(1L)).toDF("doc_id")
    TextIndex.updatePhraseIndex(spark, dir, added, removed,
      "doc_id", "text")
    // content: doc 1 gone, doc 0 replaced (4 aa-postings), doc 100 added
    val posts = TextIndex.readPostings(spark, dir)
    assert(posts.filter($"doc_id" === 1L).count() == 0, "removed doc stale")
    assert(posts.filter($"doc_id" === 0L).count() == 4, "upsert not applied")
    assert(posts.filter($"doc_id" === 100L).count() == 3, "insert missing")
    assert(posts.filter($"doc_id" === 2L).count() == 2, "untouched doc lost")
    // physical claim: only the delta terms' bucket partitions changed
    val after = bucketState()
    val touchedDirs = after.keySet.filter(k => before.get(k) != after.get(k))
      .map(_.split("/")(0)) ++
      before.keySet.diff(after.keySet).map(_.split("/")(0))
    val touchedBuckets = touchedDirs.map(_.stripPrefix("bucket=").toInt)
    assert(touchedBuckets == deltaBuckets,
      s"expected rewrites only in $deltaBuckets, got $touchedBuckets")
    // phrase search served from the standing index
    val hit = TextIndex.phraseSearch(spark, dir, Seq("aa aa"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // overlapping: doc 0 "aa aa aa aa" -> 3 anchors, doc 100 -> 2
    assert(hit.toSeq == Seq(("aa aa", 5L, 2L)), s"got ${hit.toSeq}")
    // the doclen sidecar tracks the same delta: doc 1 gone, doc 0
    // replaced at its new length, doc 100 added, others untouched
    val lens = TextIndex.readDocLengths(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dl")).toMap
    assert(lens == Map(0L -> 4L, 100L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 2L,
      5L -> 2L, 6L -> 2L, 7L -> 2L), s"doclen drifted: $lens")
    // BM25 served from the standing index sees the post-update state:
    // "aa" docs are 0 (tf 4) and 100 (tf 3); tf saturation keeps doc 100
    // (shorter, lower tf) ranked second; both outrank nothing else
    val bm = TextIndex.bm25TopKFromIndex(spark, dir, Seq("aa"), k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(bm == Seq(0L, 100L), s"index-served BM25 candidates: $bm")
    // idempotence: re-applying the same delta leaves identical content
    TextIndex.updatePhraseIndex(spark, dir, added, removed,
      "doc_id", "text")
    val again = TextIndex.readPostings(spark, dir)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == Map(0L -> 4L, 100L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 2L,
      5L -> 2L, 6L -> 2L, 7L -> 2L), s"re-apply drifted: $again")
    val lens2 = TextIndex.readDocLengths(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dl")).toMap
    assert(lens2 == lens, "doclen re-apply drifted")
  }

  test("text index update: a bucket emptied by deletes is physically " +
    "dropped — dynamic overwrite alone would leave ghost postings") {
    // dynamic partition overwrite only REPLACES partitions present in
    // the written frame; a touched bucket whose every posting was
    // deleted is not present, so without the explicit sweep the old
    // files would survive and phrase search would resurrect the doc
    val terms = (0 until 12).map(i => s"tok$i")
    val docs = terms.zipWithIndex
      .map { case (t, i) => (i.toLong, s"$t $t $t") }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("txtidx_ghost").toString
    TextIndex.buildPhraseIndex(docs, "doc_id", "text", dir, nBuckets = 16)
    val bucketOf = terms.map(t => t -> Seq(Tuple1(t)).toDF("term")
      .select(pmod(hash(col("term")), lit(16))).head().getInt(0)).toMap
    // a term ALONE in its bucket (deterministic under murmur3)
    val lone = terms.find(t =>
      bucketOf.values.count(_ == bucketOf(t)) == 1).get
    val loneDoc = terms.indexOf(lone).toLong
    val removed = Seq(Tuple1(loneDoc)).toDF("doc_id")
    TextIndex.updatePhraseIndex(spark, dir, docs.limit(0), removed,
      "doc_id", "text")
    assert(!TextIndex.partitionPaths(spark, dir, "postings")
      .contains(s"bucket=${bucketOf(lone)}"),
      "emptied bucket partition survived in the manifest")
    assert(TextIndex.readPostings(spark, dir)
      .filter($"term" === lone).count() == 0, "ghost postings readable")
    assert(TextIndex.readDocLengths(spark, dir)
      .filter($"doc_id" === loneDoc).count() == 0, "ghost doclen row")
    // the other 11 docs are untouched
    assert(TextIndex.readPostings(spark, dir).count() == 33)
  }

  test("stable split/sample are deterministic and partition-invariant") {
    val docs = spark.range(0, 1000).toDF("doc_id")
    val s1 = Sampling.stableSplit(docs, "doc_id")
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // roughly 80/10/10, and exactly reproducible
    assert(s1("train") > 700 && s1("train") < 900, s"skewed split: $s1")
    val s2 = Sampling.stableSplit(docs.repartition(7), "doc_id")
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2) // repartitioning must not move any row across splits

    val kept = Sampling.stableSample(docs, "doc_id", 0.25)
    assert(kept.count() == Sampling.stableSample(docs, "doc_id", 0.25).count())
    // a sample at a higher fraction contains the lower-fraction sample
    val k25 = kept.collect().map(_.getLong(0)).toSet
    val k50 = Sampling.stableSample(docs, "doc_id", 0.5).collect().map(_.getLong(0)).toSet
    assert(k25.subsetOf(k50))
  }

  test("repeatedWindows counts full-length tail windows (lead-after-filter regression)") {
    import spark.implicits._
    // the shared 8-token suffix is each doc's LAST window — the position
    // a filter-then-lead plan silently truncates
    val tail = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"alpha beta $tail"),
      (2L, s"gamma delta epsilon $tail"),
      (3L, "unrelated words only here nothing shared at all")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedWindows(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (3L, 1L), s"doc1: ${got(1L)}") // 10 toks → 3 windows, last repeated
    assert(got(2L) == (4L, 1L), s"doc2: ${got(2L)}")
    assert(got(3L) == (1L, 0L), s"doc3: ${got(3L)}")
  }

  test("groupCap keeps exactly k per stratum, deterministically") {
    val docs = spark.range(0, 900)
      .toDF("doc_id")
      .withColumn("src", (col("doc_id") % 3).cast("string"))
    val capped = Sampling.groupCap(docs, "doc_id", "src", k = 40)
    val byStratum = capped.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum.values.forall(_ == 40L), s"cap not exact: $byStratum")
    // a stratum smaller than k keeps everything
    val tiny = Sampling.groupCap(docs.filter(col("doc_id") < 10), "doc_id", "src", k = 40)
    assert(tiny.count() == 10)
    // partition-invariant kept set
    val a = capped.collect().map(_.getLong(0)).toSet
    val b = Sampling.groupCap(docs.repartition(13), "doc_id", "src", k = 40)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("topicSample caps each cluster, keeps small clusters whole, partition-invariant") {
    import spark.implicits._
    // two well-separated blobs on a 4-d axis pair so 2-means assignment is
    // unambiguous; blob A 60 docs, blob B 8 docs (below the cap)
    val docs = (0L until 68L).map { i =>
      val base = if (i < 60) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      (i, base.zipWithIndex.map { case (v, d) => v + (i % 5) * 0.01f * (d + 1) })
    }.toDF("id", "emb")
    val out = Sampling.topicSample(docs, "id", "emb",
      nClusters = 2, iters = 2, capPerCluster = 10)
    val per = out.groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), sum("kept").as("k"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toSeq.sorted
    assert(per == Seq(8L -> 8L, 60L -> 10L), s"got $per")
    // kept set is a pure function of ids — partition count must not move it
    val a = out.filter(col("kept") === 1L).select("id").as[Long].collect().toSet
    val b = Sampling.topicSample(docs.repartition(7), "id", "emb",
        nClusters = 2, iters = 2, capPerCluster = 10)
      .filter(col("kept") === 1L).select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("CorpusBuilds: LM and quantizer artifacts cached per (context, dataset, params)") {
    val d = "/root/testdata/sf0.001"
    val lm = CorpusBuilds.documentsBigramLm(spark, d)
    assert(lm eq CorpusBuilds.documentsBigramLm(spark, d),
      "second LM call must return the cached artifact")
    val c = CorpusBuilds.embeddingsCentroids(spark, d, 8, 3)
    assert(c eq CorpusBuilds.embeddingsCentroids(spark, d, 8, 3))
    assert(!(c eq CorpusBuilds.embeddingsCentroids(spark, d, 4, 3)),
      "different params must be a different cache entry")
    assert(c.count() == 8 && CorpusBuilds.embeddingsCentroids(spark, d, 4, 3).count() == 4)
  }

  test("domainOf: scheme/userinfo/port stripped, public-suffix split, host fallback") {
    import spark.implicits._
    val cases = Seq(
      ("https://www.Example.co.uk:8080/p?q=1", "www.example.co.uk", "example.co.uk"),
      ("http://user@blog.cdn.site-x.com.au/a", "blog.cdn.site-x.com.au", "site-x.com.au"),
      ("site-y.org/x", "site-y.org", "site-y.org"), // schemeless
      ("localhost", "localhost", "localhost"), // single label: host fallback
      ("https://a.b.c.net", "a.b.c.net", "c.net"), // deep subdomain, 1-level TLD
      ("HTTPS://X.COM", "x.com", "x.com"), // case folded
      ("ftp://h.io#f", "h.io", "h.io"), // fragment cut
      ("https://user:pw@www.site.com:443/", "www.site.com", "site.com"))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Featurize.hostOf(col("url")).as("h"),
        Featurize.domainOf(col("url")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == cases, s"got ${got.toSeq}")
  }

  test("isqrt exact at square boundaries; temperatureMix caps sublinearly, keeps small strata") {
    import spark.implicits._
    val ns = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 10L, 15L, 16L, 17L, 24L, 25L,
      26L, 99L, 100L, 101L, (1L << 31) - 1, 1L << 31, 999999999999L)
    ns.toDF("n").select(col("n"), Sampling.isqrt(col("n")).as("r"))
      .collect().foreach { row =>
        val (n, r) = (row.getLong(0), row.getLong(1))
        assert(r * r <= n && (r + 1) * (r + 1) > n, s"isqrt($n) = $r")
      }
    // 200-doc stratum: cap 10·⌊√200⌋ = 140; 50-doc stratum: 10·7 = 70 ≥ 50
    // keeps everything
    val docs = ((0 until 200).map(i => (i.toLong, "big")) ++
      (0 until 50).map(i => (1000L + i, "small"))).toDF("doc_id", "lang")
    val out = Sampling.temperatureMix(docs, "doc_id", "lang", base = 10)
    val per = out.groupBy("lang")
      .agg(sum("kept").as("k"), max("cap").as("c")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(per("big") == ((140L, 140L)), s"big: ${per("big")}")
    assert(per("small") == ((50L, 50L)), s"small: ${per("small")}")
    val a = out.filter(col("kept") === 1L).select("doc_id").as[Long].collect().toSet
    val b = Sampling.temperatureMix(docs.repartition(7), "doc_id", "lang", 10)
      .filter(col("kept") === 1L).select("doc_id").as[Long].collect().toSet
    assert(a == b, "kept set must be partitioning-invariant")
  }

  test("domainCuration groups by registrable domain, not raw host") {
    import spark.implicits._
    // same registrable domain under three hosts; a second domain whose
    // text leaks into the first (cross-domain dup)
    val docs = Seq(
      (0L, "one two three four five six", "https://www.acme.co.uk/a"),
      (1L, "one two three four five six", "https://blog.acme.co.uk/b"),
      (2L, "seven eight nine ten eleven twelve", "acme.co.uk:80/c"),
      (3L, "one two three four five six", "http://other.com/z"),
      (4L, "a b c d e f", "http://other.com/y")
    ).toDF("doc_id", "text", "url")
    val out = Sampling.domainCuration(docs, "doc_id", "text", "url",
      maxDupPpm = 300000, minAvgTokens = 5)
      .orderBy("domain").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("acme.co.uk", "other.com"))
    val acme = out(0)
    // 3 docs over 2 distinct texts → dup_ppm = 1000000*1/3 = 333333 → drop
    assert(acme.getLong(1) == 3L && acme.getLong(2) == 2L)
    assert(acme.getLong(3) == 333333L && acme.getLong(6) == 0L)
    // the shared text appears in both domains → 2 leaked docs in acme, 1 in other
    assert(acme.getLong(5) == 2L)
    val other = out(1)
    assert(other.getLong(5) == 1L && other.getLong(6) == 1L)
  }

  test("int8 quantization round-trips within 1/127 of scale; recall@k harness") {
    val vecs = Seq(
      (0L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (1L, Array(0.1f, 0.2f, -0.3f, 0.4f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // all-zero: scale 0 must not divide
    ).toDF("vec_id", "embedding")
    val qz = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Byte](2))).toMap
    assert(qz(0L)._1 == 1.0 && qz(0L)._2 == Seq[Byte](127, -63, 32, 0))
    assert(qz(2L)._1 == 0.0 && qz(2L)._2 == Seq[Byte](0, 0, 0, 0))
    // dequantized error bounded by half a quantization step
    val (s1, q1) = qz(1L)
    val orig = Seq(0.1f, 0.2f, -0.3f, 0.4f)
    q1.zip(orig).foreach { case (q, x) =>
      assert(math.abs(q * s1 / 127.0 - x) <= s1 / 127.0 / 2 + 1e-7) }

    // recall@k: IVF probe-1 on well-separated clusters is exact → recall 1.0
    def jig(i: Int): Float = (i % 3) * 0.01f
    val cvecs = (0 until 30).map { i =>
      val c = i / 10
      val base = Array.fill(4)(0.0f)
      base(c) = 1.0f
      (i.toLong, base.map(_ + jig(i)))
    }.toDF("vec_id", "embedding")
    val q = cvecs.filter($"vec_id" === 0L)
    val exact = Similarity.bruteForceTopK(cvecs, q, "vec_id", "embedding", 3)
    val approx = Similarity.ivfTopK(cvecs, q, "vec_id", "embedding",
      k = 3, nLists = 3, nprobe = 1, iters = 4)
    val rec = Similarity.recallAtK(exact, approx, 3).collect()
    assert(rec.length == 1 && rec.head.getDouble(1) == 1.0)

    // |exact| < k: a 3-vector corpus has only 2 neighbors per query, so a
    // perfect approximation must still reach recall 1.0 (denominator is
    // the available exact count, not the constant k)
    val tiny = cvecs.filter($"vec_id" < 3)
    val tinyExact = Similarity.bruteForceTopK(tiny, q, "vec_id", "embedding", 10)
    val recTiny = Similarity.recallAtK(tinyExact, tinyExact, 10).collect()
    assert(recTiny.length == 1 && recTiny.head.getDouble(1) == 1.0,
      s"recall should be 1.0 when approx == exact and |exact| < k: ${recTiny.toSeq}")
  }

  test("text analysis column functions") {
    val r = docs.select(
      TextAnalysis.tokenCount($"text").as("nt"),
      TextAnalysis.bpeishTokenCount($"text").as("nb"),
      TextAnalysis.languageGuess($"text").as("lg"),
      TextAnalysis.qualityScore($"text").as("q"),
      TextAnalysis.fingerprint($"text").as("fp"))
      .filter($"nt" === 12).first()
    assert(r.getAs[Long]("nb") >= 12)
    assert(r.getAs[String]("lg") == "en")
    assert(r.getAs[Long]("q") >= 2)
    // fingerprint deterministic across evaluations
    val fps = docs.select(TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(_.getLong(0)).toSeq
    val fps2 = docs.select(TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(_.getLong(0)).toSeq
    assert(fps == fps2)
    assert(fps(0) == fps(3)) // identical docs → identical fingerprint
  }

  test("bpe-ish tokenizer splits contractions, numbers, and punctuation runs") {
    val toks = Seq(("it's 42 degrees... really?!"))
      .toDF("text")
      .select(TextAnalysis.bpeishTokens($"text").as("t"))
      .first().getSeq[String](0)
    assert(toks == Seq("it", "'s", " 42", " degrees", "...", " really", "?!"))
  }

  test("bulk codegen forms equal their per-row expression twins") {
    // the per-row HOF forms are the reference semantics; the exploded
    // frame forms are the corpus-scale implementations — they must agree
    // null text must not make docs VANISH from the bulk outputs, and the
    // values must match whatever the per-row twins compute for it
    val sample = docs.union(Seq((100L, "x"), (101L, ""),
      (102L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val perRowSim = asMap(sample.select($"doc_id",
      Dedup.simhash64("text").as("simhash")).collect())
    val bulkSim = asMap(Dedup.simhashFrame(sample, "doc_id", "text").collect())
    assert(perRowSim == bulkSim)
    assert(bulkSim.contains(102L)) // null-text doc present, not dropped

    val perRowFp = asMap(sample.select($"doc_id",
      TextAnalysis.fingerprint($"text").as("fingerprint")).collect())
    val bulkFp = asMap(TextAnalysis.fingerprintFrame(sample, "doc_id", "text").collect())
    assert(perRowFp == bulkFp)
    assert(bulkFp.contains(102L))
  }

  test("multimodal: real ImageIO decode reports true dimensions and bands") {
    implicit val s = spark
    def png(w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      img.setRGB(0, 0, 0xff8040)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rgb = png(17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gray = png(5, 7, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val media = Seq(
      (0L, "image", rgb),
      (1L, "image", gray),
      (2L, "image", Array[Byte](1, 2, 3)), // corrupt: must not fail the batch
      (3L, "video", rgb) // non-image kind stays on the stub path
    ).toDF("media_id", "kind", "content")
    val d = Multimodal.decode(media).collect().map(m => m.media_id -> m).toMap
    assert(d(0L).width == 17 && d(0L).height == 9 && d(0L).n_channels == 3)
    assert(d(1L).width == 5 && d(1L).height == 7 && d(1L).n_channels == 1)
    assert(d(2L).width == 0 && d(2L).height == 0 && d(2L).n_channels == 0)
    assert(d(3L).width > 0) // stub dimensions, not ImageIO's
    assert(d(0L).checksum != d(1L).checksum)
  }

  test("multimodal: real image resize re-encodes at target dims; non-image passes through") {
    implicit val s = spark
    val media = Seq(
      (0L, "image", Multimodal.pngBytes(13, 7, seed = 42L)),
      (1L, "image", Array[Byte](9, 9, 9)), // undecodable: byte-identical out
      (2L, "audio", Array[Byte](1, 2, 3, 4))
    ).toDF("media_id", "kind", "content")
    val out = Multimodal.resizeImage(media, 5, 4)
    assert(out.columns.toSeq == Seq("media_id", "kind", "content", "meta"))
    val rows = out.select("media_id", "content")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // the resized payload decodes to exactly the target raster
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rows(0L)))
    assert(back.getWidth == 5 && back.getHeight == 4 &&
      back.getRaster.getNumBands == 3)
    assert(rows(1L).toSeq == Seq[Byte](9, 9, 9)) // corrupt image untouched
    assert(rows(2L).toSeq == Seq[Byte](1, 2, 3, 4)) // non-image untouched
    // meta reflects the NEW content
    val meta = out.filter($"media_id" === 0L)
      .select($"meta.n_bytes").collect().head.getLong(0)
    assert(meta == rows(0L).length.toLong)
  }

  test("multimodal: raster feature extraction sums the exact decoded pixels") {
    implicit val s = spark
    // 2x1 image with hand-set pixels: (0xFF8040, 0x010203)
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8040); img.setRGB(1, 0, 0x010203)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      (0L, "image", bos.toByteArray),
      (1L, "image", Array[Byte](3, 1, 4)) // undecodable
    ).toDF("media_id", "kind", "content")
    val f = Multimodal.imageFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(0L).width == 2 && f(0L).height == 1)
    assert(f(0L).sum_r == 0xff + 0x01 && f(0L).sum_g == 0x80 + 0x02 &&
      f(0L).sum_b == 0x40 + 0x03)
    assert(f(1L) == Multimodal.ImageFeatures(1L, 0, 0, 0L, 0L, 0L))
  }

  test("multimodal: dHash is identical under uniform brightness shift, differs across images") {
    implicit val s = spark
    def png(f: (Int, Int) => Int, w: Int = 18, h: Int = 16): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    // slope chosen so no cell reaches 255 even shifted — a clamped pair
    // would zero a difference bit and break the shift-invariance claim
    def gradient(shift: Int)(x: Int, y: Int): Int = {
      val g = math.min(255, x * 6 + y * 3 + shift); (g << 16) | (g << 8) | g
    }
    val media = Seq(
      (0L, "image", png(gradient(0))),
      (1L, "image", png(gradient(10))),          // brightness-shifted copy
      (2L, "image", png((x, y) => (x * 7919 + y * 104729) % 0xffffff)),
      (3L, "image", Array[Byte](9, 9))           // undecodable
    ).toDF("media_id", "kind", "content")
    val h = Multimodal.imageDHash(media).collect().map(x => x.media_id -> x).toMap
    // dHash depends on gradient DIRECTION, not absolute level: the
    // uniformly shifted copy hashes identically (the near-dup property)
    assert(h(0L).dhash_hi == h(1L).dhash_hi && h(0L).dhash_lo == h(1L).dhash_lo)
    // a structurally different image hashes differently
    assert((h(0L).dhash_hi, h(0L).dhash_lo) != (h(2L).dhash_hi, h(2L).dhash_lo))
    // monotone-increasing gradient rows → every difference bit set
    assert(h(0L).dhash_hi == 0xffffffffL && h(0L).dhash_lo == 0xffffffffL)
    assert(h(3L) == Multimodal.ImageDHash(3L, 0, 0, 0L, 0L))
  }

  test("multimodal: real WAV decode recovers format; fuzzed bytes report zeros") {
    implicit val s = spark
    val media = Seq(
      (0L, "audio", Multimodal.wavBytes(12000, 2, 164, seed = 7L)),
      (1L, "audio", Multimodal.wavBytes(8000, 1, 64, seed = 8L)),
      (2L, "audio", Array[Byte](82, 73, 70, 70, 0, 0)) // truncated RIFF
    ).toDF("media_id", "kind", "content")
    val d = Multimodal.decodeAudio(media).collect().map(a => a.media_id -> a).toMap
    assert(d(0L).sample_rate == 12000L && d(0L).n_channels == 2L && d(0L).n_frames == 164L)
    assert(d(1L).sample_rate == 8000L && d(1L).n_channels == 1L && d(1L).n_frames == 64L)
    assert(d(2L).sample_rate == 0L && d(2L).n_channels == 0L && d(2L).n_frames == 0L)
  }

  test("multimodal: multi-frame GIF decode recovers every sampled frame's pixels") {
    implicit val s = spark
    val media = Seq(
      (0L, "video", Multimodal.gifBytes(9, 8, 5, seed = 3L)),
      (1L, "video", Multimodal.gifBytes(8, 8, 1, seed = 4L)),
      (2L, "video", Array[Byte](71, 73, 70, 56, 57)) // truncated GIF header
    ).toDF("media_id", "kind", "content")
    // stride 2 over 5 frames -> frames 0, 2, 4; single frame -> frame 0
    val d = Multimodal.decodeVideoFrames(media, frameStride = 2).collect()
      .groupBy(_.media_id)
    assert(d(0L).map(_.frame_no).sorted.toSeq == Seq(0, 2, 4))
    assert(d(0L).forall(f => f.width == 9 && f.height == 8))
    assert(!d.contains(2L), "undecodable payload must yield zero rows")
    // channel sums replay the palette closed form: idx = (((3*31+f)*31+y)*31+x)%256
    for (f <- d(0L)) {
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until 8; x <- 0 until 9) {
        val i = (((3L * 31 + f.frame_no) * 31 + y) * 31 + x) % 256
        er += i; eg += (i * 2) % 256; eb += 255 - i
      }
      assert((f.sum_r, f.sum_g, f.sum_b) == ((er, eg, eb)), s"frame ${f.frame_no}")
    }
    assert(d(1L).map(_.frame_no).toSeq == Seq(0))
  }

  test("multimodal: MJPEG-in-AVI decode recovers exact solid-gray frames") {
    implicit val s = spark
    val good = Multimodal.aviMjpegBytes(20, 14, 5, seed = 11L)
    val media = Seq(
      (0L, "video", good),
      (1L, "video", Multimodal.aviMjpegBytes(16, 12, 1, seed = 300L)),
      (2L, "video", good.take(good.length / 3)), // torn mid-container
      (3L, "video", Array[Byte](82, 73, 70, 70, 8, 0, 0, 0)) // bare RIFF
    ).toDF("media_id", "kind", "content")
    // structural walk recovers one JPEG payload per frame
    assert(Multimodal.aviFrameChunks(good).length == 5)
    assert(Multimodal.aviFrameChunks(Array.emptyByteArray).isEmpty)
    val d = Multimodal.decodeAviMjpegFrames(media, frameStride = 2).collect()
      .groupBy(_.media_id)
    assert(d(0L).map(_.frame_no).sorted.toSeq == Seq(0, 2, 4))
    assert(d(0L).forall(f => f.width == 20 && f.height == 14))
    // solid gray at quality 1.0 is JPEG-exact: sums = w*h*((seed*31+f)%256)
    for (f <- d(0L)) {
      val v = (11L * 31 + f.frame_no) % 256
      val exp = 20L * 14L * v
      assert((f.sum_r, f.sum_g, f.sum_b) == ((exp, exp, exp)),
        s"frame ${f.frame_no}")
    }
    // seed past 256 exercises the mod: v = (300·31 + 0) mod 256 = 84
    assert(d(1L).map(_.frame_no).toSeq == Seq(0))
    assert(d(1L).head.sum_r == 16L * 12L * ((300L * 31) % 256))
    assert(!d.contains(2L), "torn container must yield zero rows")
    assert(!d.contains(3L), "frameless RIFF must yield zero rows")
  }

  test("cross-modal retrieval: shared hashed-BoW space ranks the matching " +
    "caption first; equal ids across modalities are legitimate matches") {
    import spark.implicits._
    val captions = Seq(
      (1L, "red fox in the forest"),
      (2L, "blue whale under the ocean"),
      (3L, "red fox in the forest at dawn"))
    val media = Multimodal.asMediaTable(
      captions.toDF("doc_id", "text"), "doc_id", "text", "image")
    val mEmb = Multimodal.hashedBowEmbeddings(media, "media_id",
      col("content"), dim = 16)
    // query 1's text equals media 1's decoded payload: cosine 1, rank 1 —
    // and the SAME id on both sides must not be filtered (cross-modal)
    val qEmb = Multimodal.hashedBowEmbeddings(
      Seq((1L, "red fox in the forest"), (7L, "blue whale songs"))
        .toDF("doc_id", "text"), "doc_id", col("text"), dim = 16)
    val got = Multimodal.crossModalTopK(mEmb, qEmb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ(1L).find(_._3 == 1L).map(t => (t._2, t._4)).contains((1L, 1000000L)),
      s"exact caption match should rank 1 with cos_ppm 10^6: ${byQ(1L).toSeq}")
    // near-match (superset caption) outranks the unrelated one
    val r1 = byQ(1L).sortBy(_._3).map(_._2).toSeq
    assert(r1 == Seq(1L, 3L, 2L), s"got order $r1")
    // query 7 shares 'blue whale' with media 2 only
    assert(byQ(7L).minBy(_._3)._2 == 2L)
    // embeddings are dense integer count vectors over dim buckets
    val e1 = mEmb.filter($"id" === 1L).select("emb", "n2").head()
    assert(e1.getSeq[Long](0).length == 16 && e1.getSeq[Long](0).sum == 5L
      && e1.getLong(1) >= 5L)
  }

  test("AVI RIFF walk never throws and never fabricates frames under fuzz") {
    val good = Multimodal.aviMjpegBytes(16, 12, 3, seed = 5L)
    val nGood = Multimodal.aviFrameChunks(good).length
    assert(nGood == 3)
    val rnd = new scala.util.Random(42)
    // truncation at every prefix length: parse must return a SUBSET of
    // the real frames (never invent one) and never throw
    for (len <- 0 to good.length by 7) {
      val frames = Multimodal.aviFrameChunks(good.take(len))
      assert(frames.length <= nGood, s"len=$len fabricated frames")
    }
    // random byte corruption: any outcome but an exception is acceptable
    // (a flipped movi length can legitimately reveal fewer/garbled
    // chunks) — the invariant is bounded, exception-free parsing
    for (_ <- 1 to 200) {
      val b = good.clone()
      for (_ <- 1 to 5) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val frames = Multimodal.aviFrameChunks(b)
      assert(frames.length <= 64, "runaway chunk fabrication")
    }
    // pure-noise buffers of RIFF-ish and arbitrary shapes
    for (n <- Seq(0, 1, 7, 8, 11, 12, 100)) {
      val noise = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      Multimodal.aviFrameChunks(noise) // must not throw
    }
  }

  test("audio features: per-channel integer aggregates off real WAV decode") {
    implicit val s = spark
    val media = Seq(
      (0L, "audio", Multimodal.wavBytes(8000, 2, 50, seed = 9L)),
      (1L, "audio", Array[Byte](82, 73, 70, 70)) // torn RIFF
    ).toDF("media_id", "kind", "content")
    val rows = Multimodal.audioFeatures(media).collect()
      .map(a => (a.media_id, a.channel) -> a).toMap
    assert(rows.keySet == Set((0L, 0), (0L, 1)), "torn payload yields no rows")
    // replay the synth formula: sample i = (9*773 + i*131) & 0xffff as int16
    for (c <- 0 until 2) {
      var (energy, peak, zc, silent) = (0L, 0L, 0L, 0L)
      var prev = 0
      for (f <- 0 until 50) {
        val v = ((9L * 773 + (f * 2 + c) * 131) & 0xffff).toShort.toInt
        energy += v.toLong * v
        peak = math.max(peak, math.abs(v))
        if (f > 0 && ((prev < 0) != (v < 0))) zc += 1
        if (math.abs(v) < 1000) silent += 1
        prev = v
      }
      val a = rows((0L, c))
      assert((a.n_samples, a.energy, a.peak, a.zero_crossings, a.n_silent) ==
        ((50L, energy, peak, zc, silent)), s"channel $c")
    }
  }

  test("audio fingerprint: energy-delta bits off real WAV decode, channel 0") {
    implicit val s = spark
    // 3 windows of 8 mono samples with energies e0 < e1 > e2:
    // bit0 = (e1 > e0) = 1, bit1 = (e2 > e1) = 0 -> fp = 1
    val mono = Array.fill[Short](8)(10) ++ Array.fill[Short](8)(100) ++
      Array.fill[Short](8)(20)
    // stereo: channel 0 = same pattern, channel 1 = loud constant that
    // would flip every bit if it leaked into the window energies
    val stereo = mono.flatMap(v => Array[Short](v, 30000))
    val media = Seq(
      (0L, "audio", Multimodal.wavBytesFrom(8000, 1, mono)),
      (1L, "audio", Multimodal.wavBytesFrom(8000, 2, stereo)),
      (2L, "audio", Array[Byte](82, 73, 70, 70)) // torn RIFF
    ).toDF("media_id", "kind", "content")
    val got = Multimodal.audioFingerprint(media).collect()
      .map(a => a.media_id -> ((a.n_windows, a.fp))).toMap
    assert(got(0L) == ((3L, 1L)))
    assert(got(1L) == ((3L, 1L)), "channel 0 only")
    assert(got(2L) == ((0L, 0L)), "torn payload reports zeros")
  }

  test("banded hamming pairs: pigeonhole candidates, verify, bucket cap") {
    val fps = Seq(
      10L -> 0x01L,               // base
      11L -> 0x03L,               // hamming 1 from base, shares 3 bands
      12L -> (0x01L ^ ((1L << 0) | (1L << 8) | (1L << 16) | (1L << 24))),
      // ^ hamming 4, one flip in EVERY band -> never a candidate
      13L -> 0x7f3366aaL          // far away
    ).toDF("id", "fp")
    val pairs = Dedup.bandedHammingPairs(fps, "id", "fp",
        nBands = 4, bandBits = 8, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((10L, 11L, 1L)),
      "only the shared-band pair within the verify threshold survives")

    // bucket cap: 3 identical fingerprints form a 3-clique; cap 2 drops
    // the bucket entirely, cap 3 yields all 3 pairs at hamming 0
    val clique = Seq(1L -> 0x5aL, 2L -> 0x5aL, 3L -> 0x5aL).toDF("id", "fp")
    assert(Dedup.bandedHammingPairs(clique, "id", "fp",
      maxBucketSize = 2L).count() == 0L)
    assert(Dedup.bandedHammingPairs(clique, "id", "fp",
      maxBucketSize = 3L).count() == 3L)
  }

  test("md5 png + dHash: one sampled-pixel edit moves at most 2 bits") {
    implicit val s = spark
    val md = java.security.MessageDigest.getInstance("MD5")
    val (w, h) = (11, 9)
    // base image vs a copy whose grid cell (3, 4) pixel is re-shot: the
    // NN map x -> x*w/9 is injective for w >= 9, so exactly one of the
    // 72 sampled cells moves -> only bits (3,3) and (3,4) may flip
    val (py, px) = (3 * h / 8, 4 * w / 9)
    val base = Multimodal.md5PngBytes(w, h, md, (x, y) => s"g_${y}_${x}")
    val edit = Multimodal.md5PngBytes(w, h, md, (x, y) =>
      if (y == py && x == px) s"g_${y}_${x}_edited" else s"g_${y}_${x}")
    val hashes = Multimodal.imageDHash(
        Seq((0L, base), (1L, edit)).toDF("media_id", "content"))
      .collect().map(i => i.media_id -> ((i.dhash_hi, i.dhash_lo))).toMap
    val (hi0, lo0) = hashes(0L)
    val (hi1, lo1) = hashes(1L)
    assert((hi0, lo0) != ((0L, 0L)), "decode must succeed")
    val flipped = java.lang.Long.bitCount(hi0 ^ hi1) +
      java.lang.Long.bitCount(lo0 ^ lo1)
    assert(flipped <= 2, s"edit locality: $flipped bits flipped")
    // the flips stay inside row 3 / columns {3,4} of the hi word
    val rowMask = ((1L << 3) | (1L << 4)) << (3 * 8)
    assert(((hi0 ^ hi1) & ~rowMask) == 0L, "flips confined to cells (3,3)/(3,4)")
    assert(lo0 == lo1, "rows 4-7 untouched")
  }

  test("video scene cuts: real AVI decode, threshold edge, running scene id") {
    implicit val s = spark
    // levels: scene A (10, 11), boundary delta exactly 8 (NOT a cut),
    // then a real cut (+50), then a final cut back down
    val levels = Array(10, 11, 19, 69, 70, 20)
    val media = Seq((7L, "video", Multimodal.aviMjpegBytesFrom(9, 8, levels)))
      .toDF("media_id", "kind", "content")
    val got = Multimodal.videoSceneCuts(media, threshold = 8)
      .orderBy("frame_no")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 10L, 0L), (1L, 11L, 0L), (2L, 19L, 0L), // +8 is not > 8
      (3L, 69L, 1L), (4L, 70L, 1L), (5L, 20L, 2L)))
  }

  test("constraint audit: fused single-pass checks, violation counting") {
    val df = Seq(
      (1L, "a", 1),   // ok
      (2L, null, 1),  // completeness violation
      (2L, "ccc", 3), // duplicate key; n_len consistent
      (3L, "dd", 5)   // consistency violation (len 2 != 5)
    ).toDF("id", "txt", "n_len")
    val got = Audit.audit(df, Seq(
        Audit.complete("c1_complete", $"txt"),
        Audit.unique("c2_unique", $"id"),
        Audit.satisfies("c3_consistent", $"n_len" === length($"txt"))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("c1_complete") == ((4L, 1L, 0L)))
    assert(got("c2_unique") == ((4L, 1L, 0L)))
    // null-text row contributes NO consistency violation (unknown != false)
    assert(got("c3_consistent") == ((4L, 1L, 0L)))
    val ref = Audit.refCheck("c4_ref",
        Seq(1L, 2L, 9L).toDF("k"), "k",
        Seq(1L, 2L, 3L).toDF("p"), "p")
      .collect().head
    assert((ref.getLong(1), ref.getLong(2), ref.getLong(3)) == ((3L, 1L, 0L)))
  }

  test("incremental view merge: group arithmetic, zero-count eviction") {
    val base = Seq((1L, "a", 10.5), (1L, "a", 2.25), (2L, "b", 5.0))
      .toDF("k", "t", "v")
    val ins = Seq((1L, "a", 1.0), (3L, "c", 7.5)).toDF("k", "t", "v")
    val del = Seq((2L, "b", 5.0)).toDF("k", "t", "v") // retracts ALL of (2,b)
    val got = Incremental.mergeCountSum(base, ins, del, Seq("k", "t"), "v")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      (1L, "a") -> ((3L, 13.75)),  // 10.5 + 2.25 + 1.0, exact in decimal
      (3L, "c") -> ((1L, 7.5))))   // insert-only group appears
    // (2L, "b") evicted: count reached zero
  }

  test("incremental min/max/avg: extremes repaired, only affected groups re-scanned") {
    // group A: delete hits its MIN (affected -> re-scan)
    // group B: delete strictly inside (min, max)  (unaffected -> no re-scan)
    // group C: untouched by deletes
    // group D: fully deleted, then re-inserted (min must come from inserts)
    val base = Seq(
      (100L, "A", 1.0), (101L, "A", 5.0), (102L, "A", 9.0),
      (200L, "B", 2.0), (201L, "B", 4.0), (202L, "B", 8.0),
      (300L, "C", 3.0),
      (400L, "D", 6.0)
    ).toDF("rid", "g", "v")
    val ins = Seq((500L, "D", 7.5)).toDF("rid", "g", "v")
    val del = Seq((100L, "A", 1.0), (201L, "B", 4.0), (400L, "D", 6.0))
      .toDF("rid", "g", "v")
    var rescanned = -1L
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft.ivm.rescan.")) seen.put(name, row.getLong(0))
        }
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val got = try {
      val out = Incremental.mergeMinMaxAvg(base, ins, del, Seq("g"), "v", "rid")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      rescanned = seen.values().toArray(Array.empty[java.lang.Long]).map(_.longValue).sum
      out
    } finally spark.listenerManager.unregister(listener)
    assert(got("A") == ((2L, 5.0, 9.0, 7.0)))      // min repaired: 1.0 gone
    assert(got("B") == ((2L, 2.0, 8.0, 5.0)))      // extremes untouched
    assert(got("C") == ((1L, 3.0, 3.0, 3.0)))
    assert(got("D") == ((1L, 7.5, 7.5, 7.5)))      // rebuilt from the insert
    // re-scan touched ONLY groups A and D's surviving base rows:
    // A has 2 survivors, D has 0 -> exactly 2 rows re-scanned (B and C
    // contribute nothing: B's delete is strictly inside its extremes)
    assert(rescanned == 2L, s"expected 2 re-scanned rows, got $rescanned")
  }

  test("incremental top-k: delete in stored top forces rescan, outside-top deletes ignored") {
    // group A: delete hits stored rank-1 (affected -> re-scan), plus an insert
    // group B: delete hits a row OUTSIDE the stored top-2 (unaffected, view unchanged)
    // group C: insert beats the stored top (unaffected re-rank path)
    // group D: brand-new group arriving via inserts only
    val base = Seq(
      (100L, "A", 9.0), (101L, "A", 7.0), (102L, "A", 5.0), (103L, "A", 3.0),
      (200L, "B", 9.0), (201L, "B", 7.0), (202L, "B", 5.0),
      (300L, "C", 4.0), (301L, "C", 2.0)
    ).toDF("rid", "g", "v")
    val ins = Seq((110L, "A", 8.0), (310L, "C", 6.0),
      (400L, "D", 1.0), (401L, "D", 2.0)).toDF("rid", "g", "v")
    val del = Seq((100L, "A", 9.0), (202L, "B", 5.0)).toDF("rid", "g", "v")
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft.ivm.rescan.")) seen.put(name, row.getLong(0))
        }
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val (got, rescanned) = try {
      val out = Incremental.mergeTopK(base, ins, del, Seq("g"), "v", "rid", k = 2)
        .collect().map(r => (r.getString(0), r.getInt(3)) ->
          ((r.getLong(2), r.getDouble(1)))).toMap
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      (out, seen.values().toArray(Array.empty[java.lang.Long]).map(_.longValue).sum)
    } finally spark.listenerManager.unregister(listener)
    assert(got == Map(
      ("A", 1) -> ((110L, 8.0)), ("A", 2) -> ((101L, 7.0)), // 9.0 retracted
      ("B", 1) -> ((200L, 9.0)), ("B", 2) -> ((201L, 7.0)), // unchanged
      ("C", 1) -> ((310L, 6.0)), ("C", 2) -> ((300L, 4.0)), // insert wins
      ("D", 1) -> ((401L, 2.0)), ("D", 2) -> ((400L, 1.0))))
    // only group A re-scans: its 3 surviving base rows (B's outside-top
    // delete and C/D never touch the standing corpus)
    assert(rescanned == 3L, s"expected 3 re-scanned rows, got $rescanned")
  }

  test("incremental median: touched groups re-derive, untouched pass through, eviction") {
    // A: delete hits the stored median, insert shifts it  (touched)
    // B: untouched -> stored median passes through, zero work
    // C: insert-only new group (lower-median convention on even n)
    // D: fully deleted -> evicted from the view
    val base = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 5L), ("A", 9L),
      ("B", 2L), ("B", 4L), ("B", 8L), ("D", 6L)).toDF("g", "v")
    val ins = Seq(("A", 7L), ("C", 10L), ("C", 20L)).toDF("g", "v")
    val del = Seq(("A", 3L), ("D", 6L)).toDF("g", "v")
    val out = Incremental.mergeMedian(base, ins, del, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out("A") == ((5L, 5L)))   // [1,2,5,7,9] -> 5
    assert(out("B") == ((3L, 4L)))   // stored median unchanged
    assert(out("C") == ((2L, 10L)))  // lower median of [10,20]
    assert(!out.contains("D"))
  }

  test("association rules: exact ratios, duplicate rows collapse, giant basket capped") {
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"),          // dup (1,a) must collapse
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"),
      (4L, "a"), (5L, "b"), (6L, "c")
    ).toDF("basket", "item")
    val out = Association.pairRules(rows, "basket", "item", minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // support(a,b)=3; n_a=4, n_b=4, N=6 baskets
    // conf both ways = 3/4 = 750000 ppm; lift = 6*3/(4*4) = 1.125 -> 1125000
    assert(out == Map(("a", "b") -> ((3L, 750000L, 750000L, 1125000L))))
    // a degenerate giant basket is dropped whole by the cap
    val giant = (0 until 50).map(i => (99L, s"i$i")).toDF("basket", "item")
    val capped = Association.pairRules(rows.unionAll(giant), "basket", "item",
      minSupport = 2, maxBasketSize = 10)
    assert(capped.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b")), "giant basket must not contribute pairs")
  }

  test("mergeFrames: first matching clause wins; unmatched-by-clause rows pass through") {
    val target = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val src = Seq((1L, "X"), (2L, "Y"), (3L, "Z")).toDF("k", "tag")
    val out = Merge.mergeFrames(target, src, Seq("k"),
        matched = Seq(
          // clause 1 matches X and Y; clause 2 would also match Y but
          // must never fire for it (first wins)
          Merge.WhenMatched(Some(col("s.tag").isin("X", "Y")),
            set = Map("v" -> lit(1.0))),
          Merge.WhenMatched(Some(col("s.tag") === "Y"),
            set = Map("v" -> lit(-99.0))),
          Merge.WhenMatched(Some(col("s.tag") === "NOPE"), delete = true)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 1.0, 2L -> 1.0, 3L -> 30.0))
  }

  test("text cleaning: tag strip, entity unescape, redaction, normalization") {
    val rows = Seq(
      (0L, "<p>Hello <b>world</b></p> visit https://a.b/c?d=1 now"),
      (1L, "mail me at jo.doe+x@ex-a.co.uk  or\tnot &amp; see &lt;tag&gt;"),
      (2L, "plain text stays put")
    ).toDF("doc_id", "text")
    val got = rows.select($"doc_id", TextCleaning.cleanChain($"text").as("c"),
        TextCleaning.urlCount($"text").as("u"), TextCleaning.emailCount($"text").as("e"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) == (("Hello world visit [URL] now", 1L, 0L)))
    assert(got(1L) == (("mail me at [EMAIL] or not & see <tag>", 0L, 1L)))
    assert(got(2L) == (("plain text stays put", 0L, 0L)))

    // idempotence: re-cleaning cleaned text is a no-op (multi-stage
    // pipelines re-run hygiene passes; the redaction tokens must survive).
    // Known exception: entity-ENCODED tags (&lt;tag&gt;, doc 1) unescape
    // into literal tags that a second pass strips — the price of the
    // strip-then-unescape order, which never deletes user text on pass one.
    val scope = rows.filter($"doc_id" =!= 1L)
    val once = scope.select($"doc_id", TextCleaning.cleanChain($"text").as("text"))
    val twice = once.select($"doc_id", TextCleaning.cleanChain($"text").as("text"))
    assert(once.orderBy("doc_id").collect().toSeq ==
      twice.orderBy("doc_id").collect().toSeq)

    // PII pass: phones and IPs redacted, quantities and years untouched
    val pii = Seq(
      (0L, "call +14155550123 or 212-555-0187 from 10.0.0.1 today"),
      (1L, "in 1987 we sold 12345 units for 1.5 million at 3.14 margin")
    ).toDF("doc_id", "text")
      .select($"doc_id", TextCleaning.redactPii($"text").as("r"),
        TextCleaning.phoneCount($"text").as("np"), TextCleaning.ipCount($"text").as("ni"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(pii(0L) == (("call [PHONE] or [PHONE] from [IP] today", 2L, 1L)))
    assert(pii(1L) == (("in 1987 we sold 12345 units for 1.5 million at 3.14 margin", 0L, 0L)))

    // quality signals on crafted extremes
    val sig = Seq((0L, "a a a a a a"), (1L, "one two three four five six"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextCleaning.typeTokenRatio($"text").as("ttr"),
        TextCleaning.meanWordLength($"text").as("mwl"),
        TextCleaning.symbolFraction($"text").as("sf"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(sig(0L)._1 == 1.0 / 6.0 && sig(0L)._2 == 1.0 && sig(0L)._3 == 0.0)
    assert(sig(1L)._1 == 1.0)
  }

  test("incremental dedup probes batch buckets against the corpus only") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different corpus content about distributed query engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"), // dup of 1
      (11L, "fresh new document that matches nothing in the standing corpus at all")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupAgainst(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 1L, 11L -> 0L))
  }

  test("greedy packing: capacity, single-assignment, fill, determinism") {
    val docs = (0L until 100L).map(i => (i, 10L + (i % 7) * 30L)).toDF("doc_id", "n_tokens")
    val cap = 128L
    val packed = Packing.packGreedy(docs, "doc_id", "n_tokens", cap)
    // every doc exactly once
    assert(packed.count() == 100L && packed.select("doc_id").distinct().count() == 100L)
    val audit = Packing.binAudit(packed, "n_tokens", cap).collect()
    assert(audit.forall(_.getAs[Long]("within_cap") == 1L))
    // oversize doc gets its own bin rather than being dropped
    val over = Seq((0L, 500L), (1L, 20L), (2L, 20L)).toDF("doc_id", "n_tokens")
    val po = Packing.packGreedy(over, "doc_id", "n_tokens", cap)
    val oa = Packing.binAudit(po, "n_tokens", cap).collect()
    assert(po.count() == 3 && oa.forall(_.getAs[Long]("within_cap") == 1L))
    // deterministic under different source partitioning
    val a = packed.collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = Packing.packGreedy(docs.repartition(7), "doc_id", "n_tokens", cap)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("featurizer: hashing TF, tf-idf weighting, sparse cosine finds the dup") {
    val corpus = Seq(
      (0L, "spark engines shuffle data across partitions for joins"),
      (1L, "spark engines shuffle data across partitions for joins"), // dup of 0
      (2L, "completely unrelated cooking recipe with butter and flour"),
      (3L, "partitions and joins appear here too but differently arranged words")
    ).toDF("doc_id", "text")
    val tf = Featurize.hashingTf(corpus, "doc_id", "text", numFeatures = 256)
    // tf rows are per (doc, bucket) with positive counts
    assert(tf.filter($"tf" <= 0).count() == 0)
    val weighted = Featurize.tfIdf(tf, nDocs = 4)
    // idf downweights corpus-wide buckets; every weight stays positive here
    assert(weighted.filter($"tfidf" <= 0).count() == 0)
    // the family composes directly: tfIdf output feeds the cosine by name
    val top = Featurize.sparseCosineTopK(weighted, weighted, k = 1, weightCol = "tfidf")
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("c_id"), r.getAs[Double]("cosine"))).toMap
    // exact duplicates find each other with cosine 1 (identical sparse vecs)
    assert(top(0L)._1 == 1L && math.abs(top(0L)._2 - 1.0) < 1e-12)
    assert(top(1L)._1 == 0L)
    // the recipe doc must not rank a spark doc at cosine ~1
    assert(top(2L)._2 < 0.5)
  }

  test("sparse cosine df cap drops stopword-class buckets from both sides") {
    // every doc shares the token "the" (one ubiquitous bucket); pairs are
    // otherwise disjoint except docs 0/1 which share real content
    val corpus = Seq(
      (0L, "the quantum chromodynamics lattice simulation"),
      (1L, "the quantum chromodynamics lattice computation"),
      (2L, "the buttered croissant breakfast pastry recipe"),
      (3L, "the volcanic basalt geology survey report")
    ).toDF("doc_id", "text")
    val tf = Featurize.hashingTf(corpus, "doc_id", "text", numFeatures = 4096)
    // cap at df=3: the "the" bucket (df=4) is pruned, content buckets stay
    val capped = Featurize.sparseCosineTopK(tf, tf, k = 1, weightCol = "tf",
      maxBucketDf = 3)
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("c_id"), r.getAs[Double]("cosine"))).toMap
    // the real pair still finds itself on content features
    assert(capped(0L)._1 == 1L && capped(0L)._2 > 0.5)
    // docs related ONLY through the ubiquitous bucket no longer co-occur:
    // doc 2's entry (if any) must carry zero-ish similarity, not a
    // stopword-inflated score
    assert(!capped.contains(2L) || capped(2L)._2 < 1e-12)
    // capped output equals running uncapped on manually pruned input —
    // the cap is exact cosine over the capped feature subspace
    val hot = tf.groupBy("bucket").count().filter($"count" > 3).select("bucket")
    val pruned = tf.join(hot, Seq("bucket"), "left_anti")
    val manual = Featurize.sparseCosineTopK(pruned, pruned, k = 1, weightCol = "tf")
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        math.round(r.getAs[Double]("cosine") * 1e9))).toSet
    val auto = Featurize.sparseCosineTopK(tf, tf, k = 1, weightCol = "tf",
      maxBucketDf = 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        math.round(r.getAs[Double]("cosine") * 1e9))).toSet
    assert(auto == manual)
  }

  test("contamination: eval docs sharing 13-grams with train are flagged") {
    val base = "one two three four five six seven eight nine ten eleven twelve thirteen"
    val train = Seq(
      (1L, s"$base and some training tail content here"),
      (2L, "totally separate training text with no overlap whatsoever in it at all okay")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, s"prefix words then $base closing words"), // contains the train 13-gram
      (11L, "clean evaluation document nothing shared with the training corpus in any way shape or form"),
      (12L, "short doc") // < 13 words: zero grams, must still report
    ).toDF("doc_id", "text")
    val got = Contamination.ngramOverlap(train, eval, "doc_id", "text", n = 13)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(10L)._2 >= 1L, s"expected a hit: $got")
    assert(got(11L)._2 == 0L && got(11L)._1 > 0L)
    assert(got(12L) == ((0L, 0L)))
  }

  test("span decontamination: exact coverage, span merging, zero rows kept") {
    val bench = Seq(
      (100L, "alpha beta gamma"),          // 3-gram A
      (101L, "delta epsilon zeta")         // 3-gram B
    ).toDF("doc_id", "text")
    val train = Seq(
      // A at positions 2-4 of 8 tokens -> one 3-token span
      (1L, "t0 t1 alpha beta gamma t5 t6 t7"),
      // A and B disjoint -> two spans, 6 removed
      (2L, "alpha beta gamma x delta epsilon zeta"),
      // overlapping hits "alpha beta gamma beta gamma?" no — adjacent
      // grams sharing tokens must merge: "alpha beta gamma" at 0 and the
      // bench gram again at 3 -> positions 0-5 = ONE span of 6
      (3L, "alpha beta gamma alpha beta gamma t"),
      (4L, "completely clean document no overlap here at all")
    ).toDF("doc_id", "text")
    val got = Contamination.spanDecontaminate(train, bench, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((8L, 3L, 1L, 5L)))
    assert(got(2L) == ((7L, 6L, 2L, 1L)))
    assert(got(3L) == ((7L, 6L, 1L, 1L)))
    assert(got(4L) == ((8L, 0L, 0L, 8L)))
  }

  test("stratified sampling keeps per-stratum fractions deterministically") {
    val rows = (0L until 2000L).map(i => (i, if (i % 2 == 0) "keep" else "thin"))
      .toDF("doc_id", "lang")
    val sampled = Sampling.stratifiedSample(rows, "doc_id", "lang",
      Map("keep" -> 1.0, "thin" -> 0.1))
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("keep") == 1000L) // fraction 1.0 keeps everything
    assert(byLang("thin") > 50L && byLang("thin") < 200L) // ~10% of 1000
    // deterministic: same rows survive under a different partitioning
    val again = Sampling.stratifiedSample(rows.repartition(13), "doc_id", "lang",
      Map("keep" -> 1.0, "thin" -> 0.1))
    assert(sampled.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("multimodal: media table schema, stub decode, frame sampling, resize") {
    implicit val s = spark
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "image")
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "kind", "content", "meta"))
    assert(media.schema("content").dataType.typeName == "binary")

    val decoded = Multimodal.decodeStub(media)
    val d = decoded.collect().map(m => m.media_id -> m).toMap
    assert(d(0L).checksum == d(3L).checksum) // deterministic fake decode
    assert(d(0L).checksum != d(2L).checksum)
    assert(d(0L).width > 0 && d(0L).height > 0)

    val frames = Multimodal.frameSample(media, stride = 16)
    assert(frames.filter($"media_id" === 0L).count() ==
      (docs.filter($"doc_id" === 0L).select(length($"text")).first().getInt(0) / 16))

    val resized = Multimodal.resizeStub(media, targetBytes = 8)
    assert(resized.select(max($"meta.n_bytes")).first().getLong(0) <= 8)
  }

  test("segmentDedup: keep-first line dedup over token windows") {
    val in = Seq(
      (0L, "a b c d"), // keeper of both "a b" and "c d"
      (1L, "a b x y"), // loses "a b", keeps unique "x y"
      (2L, "c d c d"), // loses BOTH copies (keeper is doc 0)
      (3L, "z")        // short doc, one partial segment
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(in, "doc_id", "text", width = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) == ((2L, 2L, "a b c d")))
    assert(out(1L) == ((2L, 1L, "x y")))
    assert(out(2L) == ((2L, 0L, "")))
    assert(out(3L) == ((1L, 1L, "z")))
    // maxDocFreq=2 tolerates the 2-doc duplicates entirely
    val lax = Dedup.segmentDedup(in, "doc_id", "text", width = 2, maxDocFreq = 2)
    assert(lax.filter($"n_kept" =!= $"n_segments").count() == 0)
  }

  test("bloom-prefiltered contamination is bit-identical to the exact path") {
    val train = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8 tail"), // contains a train 8-gram
      (11L, "z1 z2 z3 z4 z5 z6 z7 z8"),      // clean
      (12L, "short")                          // fewer tokens than n
    ).toDF("doc_id", "text")
    val exact = Contamination.ngramOverlap(train, eval, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val bloom = Contamination.ngramOverlapBloom(train, eval, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(bloom == exact)
    assert(exact.exists(_._3 > 0)) // the hit path is actually exercised
    assert(exact.exists(t => t._1 == 12L && t._2 == 0L)) // short doc kept as 0/0
  }

  test("bpePairCounts: frequency-weighted pairs, single-char words inert") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower low"),
      (2L, "low a")          // 'a' has no pairs
    ).toDF("doc_id", "text")
    // word freqs: low=3, lower=1, a=1
    // pairs: lo=3+1, ow=3+1, we=1, er=1
    val out = TextAnalysis.bpePairCounts(docs, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.toMap == Map("lo" -> 4L, "ow" -> 4L, "we" -> 1L, "er" -> 1L))
    // rank order: count desc, pair asc
    assert(out.map(_._1).toSeq == Seq("lo", "ow", "er", "we"))
  }

  test("bpeTrain: greedy run merges, second-order merges, early exhaustion") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aab"), (2L, "aaaa")).toDF("doc_id", "text")
    // word freqs: aaaa=2, aab=1
    // r1: (a,a)=2*3+1=7 wins; greedy left-to-right: aaaa->[aa,aa] (NOT
    //     [aa,a,a] or [aaa,a]), aab->[aa,b]; vocab {aa,b}; ntok 2*2+2=6
    // r2: (aa,aa)=2 wins (second-order: both symbols from r1);
    //     aaaa->[aaaa]; vocab {aaaa,aa,b}; ntok 2+2=4
    // r3: (aa,b)=1; aab->[aab]; vocab {aaaa,aab}; ntok 2+1=3
    // r4: no pairs left -> trainer stops at 3 rows
    val out = TextAnalysis.bpeTrain(docs, "text", nMerges = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", 7L, 2L, 6L),
      (2L, "aa", "aa", 2L, 3L, 4L),
      (3L, "aa", "b", 1L, 2L, 3L)))
    // count ties break on the pair string ascending: (a,b) beats (c,d)
    val tie = Seq((1L, "ab cd ab cd")).toDF("doc_id", "text")
    val t1 = TextAnalysis.bpeTrain(tie, "text", nMerges = 1).collect()(0)
    assert((t1.getString(1), t1.getString(2), t1.getLong(3)) == ("a", "b", 2L))
    // encode with the trained vocab: after all 3 possible merges both
    // words are single tokens; after 1 merge each word is 2 tokens
    val enc3 = TextAnalysis.bpeEncode(docs, "doc_id", "text", nMerges = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(enc3 == Map(1L -> (2L, 7L, 2L), 2L -> (1L, 4L, 1L)))
    val enc1 = TextAnalysis.bpeEncode(docs, "doc_id", "text", nMerges = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(enc1 == Map(1L -> 4L, 2L -> 2L))
  }

  test("canonicalizeUrl: variants collapse, distinct origins/queries do not") {
    import spark.implicits._
    val urls = Seq(
      "https://www.Example.com/a/b",   // scheme+www+case
      "HTTP://example.com:80/a/b/",    // default port + trailing slash
      "example.com/a/b#frag",          // schemeless + fragment
      "https://example.com/a/b?utm_source=x&utm_medium=y", // tracking only
      "https://example.com:8080/a/b",  // NON-default port: different origin
      "https://example.com/a/b?id=7",  // meaningful param survives
      "https://example.com/a/b?utm_source=x&id=7" // utm stripped, id kept
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val canon = urls.select($"id", Featurize.canonicalizeUrl($"url").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(canon(0L) == "example.com/a/b")
    assert(canon(1L) == "example.com/a/b")
    assert(canon(2L) == "example.com/a/b")
    assert(canon(3L) == "example.com/a/b")
    assert(canon(4L) == "example.com:8080/a/b")
    assert(canon(5L) == "example.com/a/b?id=7")
    assert(canon(6L) == "example.com/a/b?id=7")
    // urlDedup keeps the min id of the collapsed group, flags the rest
    val out = Dedup.urlDedup(urls, "id", "url")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == (0L, 1L))
    assert((1L to 3L).forall(i => out(i) == (0L, 0L)))
    assert(out(4L) == (4L, 1L) && out(5L) == (5L, 1L))
    assert(out(6L) == (5L, 0L))
  }

  test("gopherRules: per-rule flags + keep, handcrafted edges") {
    import spark.implicits._
    val goodBody = (1 to 10).flatMap(i =>                  // 60 words, varied:
      Seq("the", "and", s"word$i", "quick", s"extra$i", s"topic$i")
    ).mkString(" ")                                        // top bigram 10/59 ≤ 20%
    val repeats = ("spam ham " * 30).trim                              // 60 words, one bigram dominates
    val docs = Seq(
      (1L, goodBody),            // passes everything
      (2L, "tiny doc"),          // r_words fails (2 words)
      (3L, repeats),             // r_rep fails, r_stop fails
      (4L, ("a b " * 30).trim)   // mean word length 1 → r_mean_len fails
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val good = out(1L)
    assert(good.getAs[Long]("n_words") == 60L)
    assert(good.getAs[Long]("n_stop") >= 2L)
    assert(good.getAs[Long]("keep") == 1L)

    assert(out(2L).getAs[Long]("r_words") == 0L)
    assert(out(2L).getAs[Long]("keep") == 0L)
    // single-bigram doc: "spam ham" repeated — top bigram ("ham spam" 29 or
    // "spam ham" 30 of 59) is way over 20%
    assert(out(3L).getAs[Long]("top_bigram_cnt") == 30L)
    assert(out(3L).getAs[Long]("n_bigrams") == 59L)
    assert(out(3L).getAs[Long]("r_rep") == 0L)
    assert(out(4L).getAs[Long]("r_mean_len") == 0L)
    assert(out(4L).getAs[Long]("char_sum") == 60L)
  }

  test("shuffleShards: a deterministic partition-invariant permutation") {
    val ids = spark.range(0, 100).toDF("doc_id")
    val a = Sampling.shuffleShards(ids, "doc_id", "ep1", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every id exactly once; shards in range; positions contiguous per shard
    assert(a.map(_._1).sorted.toSeq == (0L until 100L))
    assert(a.forall(t => t._2 >= 0 && t._2 < 4))
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length))
    }
    // invariant under input partitioning, changed by the seed
    val b = Sampling.shuffleShards(ids.repartition(7), "doc_id", "ep1", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSet == b.toSet)
    val c = Sampling.shuffleShards(ids, "doc_id", "ep2", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSet != c.toSet)
  }

  test("selectRepresentatives: best quality wins, min-id tiebreak, singletons") {
    // cluster 1 = {1,2,3} (rep: 2, highest quality); cluster 10 = {10,11}
    // (quality tie -> min id 10); 99 unpaired (its own rep)
    val canon = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (99L, 99L)).toDF("doc_id", "canonical_id")
    val scored = Seq((1L, 1L), (2L, 3L), (3L, 2L), (10L, 2L), (11L, 2L),
      (99L, 0L)).toDF("doc_id", "quality")
    val out = Dedup.selectRepresentatives(canon, scored, "doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    assert(out == Set(
      (1L, 2L, 0L), (2L, 2L, 1L), (3L, 2L, 0L),
      (10L, 10L, 1L), (11L, 10L, 0L),
      (99L, 99L, 1L)))
  }

  test("dupLeakageMatrix: pair space tracks sources, not copy count") {
    // "shared" appears in 3 sources with MANY copies each -> exactly the
    // 3 source pairs, each counted once; "solo" in one source -> no rows
    val docs = ((1 to 100).map(i => (s"a$i", "shared", "srcA")) ++
      (1 to 100).map(i => (s"b$i", "shared", "srcB")) ++
      (1 to 100).map(i => (s"c$i", "shared", "srcC")) ++
      (1 to 50).map(i => (s"d$i", "solo", "srcA")))
      .toDF("id", "text", "source")
    val out = Sampling.dupLeakageMatrix(docs, md5(col("text")), "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("srcA", "srcB", 1L), ("srcA", "srcC", 1L),
      ("srcB", "srcC", 1L)))
  }

  test("snapshotDiff: all four statuses, null payload never misclassifies") {
    val old = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish"),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val neu = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new"),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val out = Dedup.snapshotDiff(old, neu, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"))
  }

  test("randomProjection: dim-wise sign consistency and partition invariance") {
    import org.apache.spark.sql.types._
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 1.0f, 0.0f)),
      (4L, Array(0.5f, -0.25f, 2.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val p = Similarity.randomProjection(df, "vec_id", "embedding", 4)
    assert(p.schema.fields.count(_.name.startsWith("p")) == 4)
    assert(p.schema("p0_micro").dataType == LongType)
    val m = p.collect().map(r => r.getLong(0) ->
      (1 to 4).map(r.getLong).toVector).toMap
    // e1 and e2 project to the per-dimension sign rows; their projection
    // sums must be exactly +-1e6, and linearity must hold exactly:
    // proj(e1 + e2) = proj(e1) + proj(e2) in integer micro-units
    assert(m(1L).forall(v => v == 1000000L || v == -1000000L))
    assert(m(2L).forall(v => v == 1000000L || v == -1000000L))
    assert(m(3L) == m(1L).zip(m(2L)).map { case (a, b) => a + b })
    // partition layout must not change any coordinate (integer sums)
    val p2 = Similarity.randomProjection(
      df.repartition(7), "vec_id", "embedding", 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toVector)
      .toMap
    assert(p2 == m)
  }

  test("mergeJoinView: delete, dim-update rederive, insert on touched and untouched keys") {
    import spark.implicits._
    val facts = Seq((1L, 10L, 5.0), (2L, 10L, 6.0), (3L, 20L, 7.0), (4L, 30L, 8.0))
      .toDF("fid", "k", "v")
    val dims = Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("k", "name")
    val view = facts.join(dims, Seq("k"))
    val del = Seq(3L).toDF("fid")
    // insert 5 on an un-updated key, 6 on a dim-less key (must drop),
    // 7 on the UPDATED key (must surface with the NEW payload)
    val ins = Seq((5L, 20L, 9.0), (6L, 40L, 1.0), (7L, 10L, 2.0))
      .toDF("fid", "k", "v")
    val upd = Seq((10L, "x2")).toDF("k", "name")
    val got = Incremental
      .mergeJoinView(view, facts, dims, ins, del, upd, "k", "fid")
      .select("fid", "k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (1L, 10L, 5.0, "x2"), (2L, 10L, 6.0, "x2"), (7L, 10L, 2.0, "x2"),
      (4L, 30L, 8.0, "z"), (5L, 20L, 9.0, "y")))
    // equivalence with a from-scratch re-join of the post-churn tables
    val facts2 = facts.join(del, Seq("fid"), "left_anti").unionByName(ins)
    val dims2 = dims.join(upd.select("k"), Seq("k"), "left_anti").unionByName(upd)
    val full = facts2.join(dims2, Seq("k"))
      .select("fid", "k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(got == full)
  }

  test("bm25TopK: exact rational scores on a hand-computed corpus") {
    import spark.implicits._
    // terms picked: banana (4), apple (3); N=3, A=8. Expected ppm scores
    // from the exact recurrence (see TextAnalysis.bm25TopK scaladoc):
    // d1 matches both terms, d3 only banana (tf=3, longest doc), d2 only
    // apple — ordering d1 > d3 > d2 with exact integer values
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "banana banana banana")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        nTerms = 2, minTermLen = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((1L, 1367791L), (3L, 918260L), (2L, 668354L)))
  }

  test("weightedSample: min-of-w-clocks priorities, deterministic, monotone in weight") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, 1L + (i % 16))).toDF("doc_id", "w")
    val a = Sampling.weightedSample(docs, "doc_id", "w", "t", k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(a.size == 50)
    assert(a.map(_._3) == a.map(_._3).sorted, "ascending priority order")
    // pure function of (seed, id, replica): partitioning cannot change it
    val b = Sampling.weightedSample(docs.repartition(13), "doc_id", "w", "t", k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(a == b)
    // priority = min over the doc's replica keys, replayed byte-for-byte
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, r: Long): Long = {
      val hex = md.digest(s"t:$id:$r".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    a.foreach { case (id, w, pri) =>
      assert(pri == (0L until w).map(key(id, _)).min, s"doc $id")
    }
    // more clocks can only lower the min: doubling every weight must not
    // raise any doc's priority (same seed → replicas are a superset)
    val dbl = Sampling.weightedSample(
        docs.withColumn("w", col("w") * 2), "doc_id", "w", "t", k = 200)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val all = Sampling.weightedSample(docs, "doc_id", "w", "t", k = 200)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    all.foreach { case (id, pri) => assert(dbl(id) <= pri) }
  }
}
