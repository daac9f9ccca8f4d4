package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-guard scale probe (the BASELINE.md "pathological corpus" harness).
  *
  * `sbt "Test/runMain graft.ScaleProbe [sfDir] [mult] [injectSize]"`
  * (probe tooling, so it lives in src/test with the other *ProbeRun
  * mains — never on the library classpath, never in the shipped LoC)
  *
  * Builds a `mult`× replica of the documents corpus PLUS one deliberately
  * pathological boilerplate cluster of `injectSize` near-identical docs,
  * and one celebrity node grafted onto the events interaction graph, then
  * times the four skew-exposed operator families (n-gram Jaccard, LSH
  * candidate pairs, near-dup components, triangles) at 1× and at `mult`×.
  * One JSON line per probe:
  * `{"probe":..,"scale":..,"docs":..,"seconds":..,"rows":..}` — `rows` is
  * the operator's output size, the number that must stay LINEAR in
  * corpus/cluster size for the 100 TB posture to hold. Nothing here is
  * called by queries(); it exists so the skew claims in BASELINE.md are
  * reproducible with one command rather than asserted from memory.
  */
object ScaleProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val inject = if (args.length > 2) args(2).toInt else 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = relational.Tables.documents(spark, sfDir)
      .select("doc_id", "text").persist()
    val nBase = base.count()

    // mult× replicas (id-remapped — each doc becomes an exact-dup cluster
    // of size `mult`) + the boilerplate cluster: `inject` docs sharing one
    // body with a tiny per-doc suffix, the worst LSH case (every band maps
    // the whole cluster into one bucket).
    val boiler = "subscribe to our newsletter for daily updates unsubscribe " +
      "at any time terms of service privacy policy all rights reserved"
    val cluster = spark.range(inject).select(
      (col("id") + 900000000L).as("doc_id"),
      concat(lit(boiler + " ref"), (col("id") % 7).cast("string")).as("text"))
    val big = (0 until mult).map(k =>
        base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
      .unionAll(cluster)
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    val nBig = big.count()

    def probeDocs(name: String, scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows29, t29) = time(ops.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", threshold = 0.2).count())
      emit("q29_ngram_jaccard", scale, n, t29, rows29)
      val (rows37, t37) = time(ops.Dedup.minhashCandidates(
        docs, "doc_id", "text").count())
      emit("q37_minhash_pairs", scale, n, t37, rows37)
      val (rows52, t52) = time(ops.Dedup.canonicalize(
          docs.select("doc_id"), "doc_id",
          ops.Dedup.minhashStarEdges(docs, "doc_id", "text"))
        .filter(col("is_keep") === 0L).count())
      emit("q52_components_dropped", scale, n, t52, rows52)
    }

    probeDocs("docs", "1x", base, nBase)
    probeDocs("docs", s"${mult}x+cluster", big, nBig)

    // q123: representative selection where the boilerplate cluster is ONE
    // `inject`-doc component — the keeper argmax's worst key. The struct-min
    // aggregate partial-combines map-side, so the hot component costs one
    // combiner row per task, never a single-partition window sort; `rows` =
    // clusters (must track distinct components, not docs).
    def probeReps(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time {
        val canon = ops.Dedup.canonicalize(
          docs.select("doc_id"), "doc_id",
          ops.Dedup.minhashStarEdges(docs, "doc_id", "text"))
        val scored = docs.select(col("doc_id"),
          ops.TextAnalysis.qualityScore(col("text")).as("quality"))
        ops.Dedup.selectRepresentatives(canon, scored, "doc_id", "quality")
          .filter(col("is_rep") === 1L).count()
      }
      emit("q123_representatives", scale, n, t, rows)
    }
    probeReps("1x", base, nBase)
    probeReps(s"${mult}x+cluster (one giant component)", big, nBig)

    // q126: snapshot diff where the "recrawl" is the pathological corpus
    // vs itself with the boilerplate cluster flipped — one full-outer
    // hash join on id; cost must stay linear in rows, output one row per
    // id. `rows` = non-unchanged ids (~cluster size).
    def probeDiff(scale: String, docs: DataFrame, n: Long): Unit = {
      val neu = docs.select(col("doc_id"),
        when(col("doc_id") >= 900000000L, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      val (rows, t) = time(ops.Dedup.snapshotDiff(docs, neu, "doc_id", "text")
        .filter(col("status") =!= "unchanged").count())
      emit("q126_snapshot_diff", scale, n, t, rows)
    }
    probeDiff("1x", base, nBase)
    probeDiff(s"${mult}x+cluster (cluster rewritten)", big, nBig)

    // q127: leakage matrix where the boilerplate cluster gives ONE lede
    // hash `inject` copies across 3 synthetic sources — the hot
    // fingerprint. The distinct pass collapses copies before the self
    // join, so the hot key contributes 3 rows to the pair space, never
    // inject²; `rows` = matrix cells.
    def probeLeak(scale: String, docs: DataFrame, n: Long): Unit = {
      val sourced = docs.withColumn("source",
        concat(lit("s"), (col("doc_id") % 3).cast("string")))
      val (rows, t) = time(ops.Sampling.dupLeakageMatrix(
        sourced, md5(substring(col("text"), 1, 80)), "source").count())
      emit("q127_leakage_cells", scale, n, t, rows)
    }
    probeLeak("1x", base, nBase)
    probeLeak(s"${mult}x+cluster (one hot lede x3 sources)", big, nBig)

    // q92: repeated-window detection on the same corpora — the boilerplate
    // cluster makes its windows corpus-frequency ~inject, the worst case
    // for the frequency aggregate
    val (r92a, t92a) = time(ops.Dedup.repeatedWindows(base, "doc_id", "text")
      .agg(sum("n_repeated")).collect().head.getLong(0))
    emit("q92_repeated_windows", "1x", nBase, t92a, r92a)
    val (r92b, t92b) = time(ops.Dedup.repeatedWindows(big, "doc_id", "text")
      .agg(sum("n_repeated")).collect().head.getLong(0))
    emit("q92_repeated_windows", s"${mult}x+cluster", nBig, t92b, r92b)

    // q101: DSIR importance scoring with the boilerplate cluster
    // concentrating corpus token mass in a handful of hash buckets — the
    // worst case for the two unigram models (one bucket carries ~inject×
    // its fair share of mass). Both models stay corpus-level hash aggs
    // and the scorer one broadcast join, so the cost must track corpus
    // size, not cluster size; output stays one row per doc.
    def probeDsir(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time(ops.Featurize.importanceDigest(
        docs, docs.filter(col("doc_id") % 7 === 0), "doc_id", "text").count())
      emit("q101_importance_resample", scale, n, t, rows)
    }
    probeDsir("1x", base, nBase)
    probeDsir(s"${mult}x+cluster", big, nBig)

    // q106: repeated-window REMOVAL on the replicated corpus — every
    // window of every doc is corpus-repeated (each doc exists mult times),
    // the remover's worst case: the cover set explodes w rows per
    // repeated START for every start. Output must stay one row per doc.
    // aggregate n_removed, not count(): the output's final left join is
    // against a by-id aggregate, so a bare count() lets the optimizer
    // eliminate the whole cover-join branch and times only the base scan
    val (r106a, t106a) = time(ops.Dedup.removeRepeatedWindows(
      base, "doc_id", "text").agg(sum("n_removed")).collect().head.getLong(0))
    emit("q106_repeated_removal", "1x", nBase, t106a, r106a)
    val (r106b, t106b) = time(ops.Dedup.removeRepeatedWindows(
      big, "doc_id", "text").agg(sum("n_removed")).collect().head.getLong(0))
    emit("q106_repeated_removal", s"${mult}x+cluster (all windows hot)", nBig, t106b, r106b)

    // q109: quality-stratified rebalancing where the boilerplate cluster
    // drops ~all its docs into ONE perplexity bin (identical text → one
    // LM score) — the pathological stratum. The per-bin cap must hold and
    // the rank window is per-bin, never global.
    def probeRebalance(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time {
        val lm = ops.LanguageModel.bigramLm(docs, "doc_id", "text")
        val bucketed = ops.LanguageModel
          .scoreAvgCondProb(docs, "doc_id", "text", lm)
          .select(col("doc_id"), expr("avg_p_ppm div 100000").as("bucket"))
        ops.Sampling.groupCap(bucketed, "doc_id", "bucket", k = 30).count()
      }
      emit("q109_quality_rebalance", scale, n, t, rows)
    }
    probeRebalance("1x", base, nBase)
    probeRebalance(s"${mult}x+cluster (one hot bin)", big, nBig)

    // q115: Gopher rule gate on the pathological corpus — a pure per-row
    // pass; the boilerplate cluster maximizes the in-row repetition
    // aggregate (near-identical bigrams throughout), but cost must stay
    // linear with rows and the plan shuffle-free. `rows` = kept docs.
    def probeGopher(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time(ops.TextAnalysis.gopherRules(docs, "doc_id", "text")
        .agg(sum("keep")).collect().head.getLong(0))
      emit("q115_gopher_rules", scale, n, t, rows)
    }
    probeGopher("1x", base, nBase)
    probeGopher(s"${mult}x+cluster", big, nBig)

    // q117: canonical-URL dedup with a celebrity page — every cluster doc
    // canonicalizes to ONE url (distinct utm_* variants stripped), the
    // group-agg's worst key. min() is map-side combinable, so the hot key
    // costs its row count once; `rows` = dropped docs (~inject, not n).
    def probeUrl(scale: String, docs: DataFrame, n: Long): Unit = {
      val urled = docs.withColumn("url",
        when(col("doc_id") >= 900000000L,
          concat(lit("https://WWW.spam-hub.com:443/landing/?utm_source=s"),
            col("doc_id")))
          .otherwise(concat(lit("https://site-"), col("doc_id"),
            lit(".com/p/"), col("doc_id"))))
      val (rows, t) = time(ops.Dedup.urlDedup(urled, "doc_id", "url")
        .filter(col("is_keep") === 0L).count())
      emit("q117_url_dedup_dropped", scale, n, t, rows)
    }
    probeUrl("1x", base, nBase)
    probeUrl(s"${mult}x+cluster (one hot url)", big, nBig)

    // q122: blocklist filtering with one hot host — every cluster doc
    // lives under spam-hub.com, so one suffix key carries ~inject rows
    // into the blocklist join. The join is host-suffix equi (blocklist
    // broadcast at this size) and the winner agg is per-doc map-side
    // combined, so the hot host costs its row count once; `rows` =
    // blocked docs (~cluster size, not n).
    def probeBlocklist(scale: String, docs: DataFrame, n: Long): Unit = {
      import spark.implicits._
      val urled = docs.withColumn("url",
        when(col("doc_id") >= 900000000L,
          concat(lit("https://ads.spam-hub.com/l/"), col("doc_id")))
          .otherwise(concat(lit("https://site-"), col("doc_id"),
            lit(".com/p/"), col("doc_id"))))
      val bl = Seq("spam-hub.com", "example.net").toDF("blocked")
      val (rows, t) = time(ops.Sampling.blocklistFilter(
          urled, "doc_id", "url", bl)
        .filter(col("is_blocked") === 1L).count())
      emit("q122_blocklist_blocked", scale, n, t, rows)
    }
    probeBlocklist("1x", base, nBase)
    probeBlocklist(s"${mult}x+cluster (one hot host)", big, nBig)

    // q118: BPE pair counting — replication leaves the VOCABULARY
    // unchanged, so the per-character pair stage is constant-size and
    // per-unit cost must FALL as the corpus grows; only the word-count
    // hash agg (map-side combined) sees the extra rows.
    def probeBpe(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time(
        ops.TextAnalysis.bpePairCounts(docs, "text", topK = 20).count())
      emit("q118_bpe_pairs", scale, n, t, rows)
    }
    probeBpe("1x", base, nBase)
    probeBpe(s"${mult}x (same vocab)", big, nBig)

    // q128: FULL BPE training — after the single corpus-pass word count,
    // all 6 select-merge-recount rounds run over the distinct-word frame,
    // so replication must leave the per-round cost unchanged (the merge
    // rules themselves are identical: counts scale ×mult uniformly).
    // rows = completed merge rounds.
    def probeBpeTrain(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time(
        ops.TextAnalysis.bpeTrain(docs, "text", nMerges = 6).count())
      emit("q128_bpe_train", scale, n, t, rows)
    }
    probeBpeTrain("1x", base, nBase)
    probeBpeTrain(s"${mult}x (same vocab)", big, nBig)

    // q130: incremental-dedup split costs. The corpus INDEX build (batch
    // twin) is linear in corpus size; the per-ingest PROBE of a FIXED
    // 1000-doc batch must stay ~constant as the standing corpus grows —
    // that independence is the whole point of incremental dedup (re-running
    // corpus-wide dedup per ingest would be O(corpus) every time).
    def probeIncr(scale: String, docs: DataFrame, n: Long): Unit = {
      val (idxRows, tIdx) = time(
        ops.Dedup.md5BandBuckets(docs, "doc_id", "text").count())
      emit("q130_corpus_index", scale, n, tIdx, idxRows)
      val idx = ops.Dedup.md5BandBuckets(docs, "doc_id", "text")
        .select("band", "bucket").localCheckpoint(true)
      val ingest = base.limit(1000)
      val (hits, tProbe) = time(
        ops.Dedup.md5BandBucketsPerRow(ingest, "doc_id", "text")
          .join(idx, Seq("band", "bucket"), "left_semi")
          .select("id").distinct().count())
      emit("q130_ingest_probe", s"vs $scale corpus", 1000, tProbe, hits)
      idx.unpersist(blocking = false)
    }
    probeIncr("1x", base, nBase)
    probeIncr(s"${mult}x+cluster", big, nBig)

    // q131: cross-modal retrieval where the media corpus carries the
    // boilerplate cluster — `inject` identical payloads collapse onto ONE
    // point of the shared embedding space (the hot-neighbor case). The
    // scan is one linear pass over media embeddings per query batch;
    // rows = queries × k regardless of duplication.
    def probeCrossModal(scale: String, docs: DataFrame, n: Long): Unit = {
      val media = ops.Multimodal.asMediaTable(docs, "doc_id", "text", "image")
      val mEmb = ops.Multimodal.hashedBowEmbeddings(
        media, "media_id", col("content"), dim = 16)
      val qEmb = ops.Multimodal.hashedBowEmbeddings(
        docs.filter(col("doc_id") < 5), "doc_id", col("text"), dim = 16)
      val (rows, t) = time(ops.Multimodal.crossModalTopK(mEmb, qEmb, k = 10).count())
      emit("q131_crossmodal", scale, n, t, rows)
    }
    probeCrossModal("1x", base, nBase)
    probeCrossModal(s"${mult}x+cluster (one hot point)", big, nBig)

    // q104: k-means training under duplicate mass — the replicated
    // embedding corpus puts mult× identical vectors on every point; the
    // decimal-bridged mean must absorb them as weight, with cost linear
    // in rows and output fixed at k rows.
    val emb = relational.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).persist()
    val nEmb = emb.count()
    val embBig = (0 until mult).map(k =>
        emb.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          col("embedding")))
      .reduce(_ unionAll _)
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    val nEmbBig = embBig.count()
    val (r104a, t104a) = time(ops.Similarity.ivfCentroids(
      emb, "vec_id", "embedding", k = 8, iters = 3).count())
    emit("q104_kmeans", "1x", nEmb, t104a, r104a)
    val (r104b, t104b) = time(ops.Similarity.ivfCentroids(
      embBig, "vec_id", "embedding", k = 8, iters = 3).count())
    emit("q104_kmeans", s"${mult}x duplicate mass", nEmbBig, t104b, r104b)

    // q116: PQ coding under the same duplicate mass — codebook training
    // absorbs the weight, the assignment crossJoin expands ×(m·k) but
    // map-side combines to one row per vector before the exchange.
    val (r116a, t116a) = time(ops.Similarity.pqCodes(
      emb, "vec_id", "embedding", m = 2, k = 4, iters = 2).count())
    emit("q116_pq_codes", "1x", nEmb, t116a, r116a)
    val (r116b, t116b) = time(ops.Similarity.pqCodes(
      embBig, "vec_id", "embedding", m = 2, k = 4, iters = 2).count())
    emit("q116_pq_codes", s"${mult}x duplicate mass", nEmbBig, t116b, r116b)

    // q120: IVF-PQ residual coding under the same duplicate mass — the
    // coarse router and both residual-trainer passes see mult× identical
    // vectors; every stage is a broadcast join + map-side-combined agg
    // over the (checkpointed) residual corpus, so cost must stay linear
    // in rows with output one row per vector.
    def probeIvfPq(scale: String, e: DataFrame, n: Long): Unit = {
      val coarse = ops.Similarity.ivfCentroids(e, "vec_id", "embedding",
        k = 8, iters = 3)
      val (rows, t) = time(ops.Similarity.ivfPqCodes(
        e, "vec_id", "embedding", coarse, m = 2, k = 4, iters = 2).count())
      emit("q120_ivfpq_codes", scale, n, t, rows)
    }
    probeIvfPq("1x", emb, nEmb)
    probeIvfPq(s"${mult}x duplicate mass", embBig, nEmbBig)

    // q129: the IVF-PQ SEARCH path under duplicate mass — index build
    // cost is the q120 shape (probed above); here the timed section is
    // route → ADC over probed lists → re-rank for a fixed 5-query batch.
    // Inverted lists are mult× longer, so search cost may grow ~linearly
    // with list size but must never exceed the compressed scan of
    // nprobe/nLists of the corpus; rows = queries × k.
    def probeIvfPqSearch(scale: String, e: DataFrame, n: Long): Unit = {
      val coarse = ops.Similarity.ivfCentroids(e, "vec_id", "embedding",
        k = 8, iters = 3)
      val dir = java.nio.file.Files.createTempDirectory("probe_ivfpq").toString
      ops.Similarity.buildIvfPqIndex(e, "vec_id", "embedding", coarse, dir,
        dim = 64, m = 16, kCent = 16, iters = 2)
      val q = e.filter(col("vec_id") < 5)
      val (rows, t) = time(ops.Similarity.searchIvfPq(spark, dir, e, q,
        "vec_id", "embedding", k = 10, dim = 64, nprobe = 4,
        shortlist = 100, m = 16, kCent = 16).count())
      emit("q129_ivfpq_search", scale, n, t, rows)
    }
    probeIvfPqSearch("1x", emb, nEmb)
    probeIvfPqSearch(s"${mult}x duplicate mass", embBig, nEmbBig)

    // q133: incremental index update — a single-list, remove-only CDC
    // delta (50 ids all routed to list 0): the update must read and
    // rewrite ONLY that list's partition, so its cost tracks the touched
    // list's size, never the index size (the other nLists-1 partitions
    // are untouched bytes on disk). Timed section = the update alone.
    def probeIvfPqUpdate(scale: String, e: DataFrame, n: Long): Unit = {
      val coarse = ops.Similarity.ivfCentroids(e, "vec_id", "embedding",
        k = 8, iters = 3)
      val dir = java.nio.file.Files.createTempDirectory("probe_ivfpq_u").toString
      ops.Similarity.buildIvfPqIndex(e, "vec_id", "embedding", coarse, dir,
        dim = 64, m = 2, kCent = 4, iters = 2)
      val removed = ops.Similarity.readLists(spark, dir)
        .filter(col("list_id").cast("long") === 0L)
        .select(col("id").as("vec_id")).limit(50).localCheckpoint(true)
      val added = e.filter(lit(false))
      val (_, t) = time(ops.Similarity.updateIvfPqIndex(
        spark, dir, added, removed, "vec_id", "embedding", dim = 64, m = 2))
      val rows = ops.Similarity.readLists(spark, dir).count()
      emit("q133_index_update", scale, n, t, rows)
    }
    probeIvfPqUpdate("1x", emb, nEmb)
    probeIvfPqUpdate(s"${mult}x duplicate mass (same 50-id delta)", embBig, nEmbBig)

    // q124: JL projection under the same duplicate mass — a single hash
    // aggregate with k integer sums; cost must stay linear in rows and
    // the output one row per vector (shuffle volume k partials/vector
    // regardless of dim or duplication).
    val (r124a, t124a) = time(ops.Similarity.randomProjection(
      emb, "vec_id", "embedding", k = 8).count())
    emit("q124_random_projection", "1x", nEmb, t124a, r124a)
    val (r124b, t124b) = time(ops.Similarity.randomProjection(
      embBig, "vec_id", "embedding", k = 8).count())
    emit("q124_random_projection", s"${mult}x duplicate mass", nEmbBig, t124b, r124b)

    // q88: fuzzy matching on a name table with one pathological variant
    // bucket (all `inject` cluster "names" are near-identical strings)
    val names = spark.range(inject).select(
      concat(lit("User#"), lpad((col("id") % (inject / 10)).cast("string"), 9, "0"))
        .as("name"))
    val (r88, t88) = time(ops.Dedup.editDistance1Pairs(names, "name").count())
    emit("q88_fuzzy_names", "dense-dup names", inject, t88, r88)

    // celebrity graph: the events interaction edges + one node of degree
    // `inject` (edges to the lowest user ids). Degree orientation keeps
    // the wedge join bounded; the probe pins both the time and the count.
    val edges = ops.GlobalLag.withLag(
        relational.Tables.events(spark, sfDir)
          .select("user_id", "ts_ns", "event_id"),
        Seq("ts_ns", "event_id"), "user_id", "prev")
      .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
      .select(col("prev").as("source"), col("user_id").as("target"))
      .persist()
    val (tri1, tt1) = time(
      ops.Graph.triangleStats(edges, "source", "target").collect().head)
    emit("q73_triangles", "1x", tri1.getAs[Long]("n_edges"), tt1,
      tri1.getAs[Long]("n_triangles"))
    val celebrity = spark.range(inject).select(
      lit(-1L).as("source"), col("id").as("target"))
    val withCeleb = edges.unionAll(celebrity)
    val (tri2, tt2) = time(
      ops.Graph.triangleStats(withCeleb, "source", "target").collect().head)
    emit("q73_triangles", "celebrity", tri2.getAs[Long]("n_edges"), tt2,
      tri2.getAs[Long]("n_triangles"))

    // q192: hub-capped link prediction with the celebrity star — the
    // wedge self-join is Σ deg(w)² over common-neighbor CENTERS, so an
    // uncapped degree-`inject` hub alone contributes ~inject²/2 wedges
    // (2·10⁸ more pairs at inject=2·10⁴). The √(Σdeg) cap must exclude
    // the hub from the center role while KEEPING ordinary nodes — this
    // probe is what killed the previous 2×-mean cap: the grafted
    // degree-1 leaves dragged the mean below every ordinary node's
    // degree and recall went to zero (rows=0). `pairs` counts the full
    // candidate wedge-pair mass (pre-top-k), the honest cost metric.
    def probeLinkPred(scale: String, es: DataFrame): Unit = {
      val we = ops.Graph.canonicalEdges(es, "source", "target")
      val adj = we.select(col("a").as("v"), col("b").as("n"))
        .unionAll(we.select(col("b").as("v"), col("a").as("n")))
      val deg = adj.groupBy("v").agg(count(lit(1)).as("deg"))
      val cap = deg.agg(
        expr("CAST(floor(sqrt(sum(deg))) AS BIGINT)").as("cap"))
      val low = deg.crossJoin(broadcast(cap))
        .filter(col("deg") <= col("cap")).select(col("v").as("n"))
      val capped = adj.join(low, Seq("n"), "left_semi")
      val (pairs, tp) = time(capped.select(col("v").as("p"), col("n"))
        .join(capped.select(col("v").as("q"), col("n")), Seq("n"))
        .filter(col("q") > col("p")).count())
      val (rows, t) = time(ops.Graph.linkPrediction(we, 20).count())
      println(f"""{"probe":"q192_link_prediction","scale":"$scale","input":${we.count()},"seconds":${tp + t}%.2f,"rows":$rows,"wedge_pairs":$pairs}""")
    }
    probeLinkPred("1x", edges)
    probeLinkPred("celebrity", withCeleb)

    // q121: k-core peeling with the celebrity star — the degree-`inject`
    // node makes one peel round's degree agg maximally skewed, and its
    // `inject` leaves all peel in round 1 (degree 1 each). Per round the
    // cost is two semi-joins + one map-side-combined agg, so the hot node
    // costs its edge count once per round; `rows` = peeled nodes.
    def probeKcore(scale: String, es: DataFrame): Unit = {
      val canon = ops.Graph.canonicalEdges(es, "source", "target")
      val deg = ops.Graph.degrees(canon)
      val r = deg.agg(sum(col("deg")).as("s"), count(lit(1)).as("n")).head()
      val k = r.getLong(0) / r.getLong(1) + 1
      val (rows, t) = time(ops.Graph.kCore(canon, k, maxRounds = 5)
        .filter(col("peel_round") > 0L).count())
      emit("q121_kcore_peeled", scale, deg.count(), t, rows)
    }
    probeKcore("1x", edges)
    probeKcore("celebrity", withCeleb)

    // q137: label propagation with the celebrity star — the hub's
    // degree-`inject` vote aggregate is the skew case; per round the
    // (t, lbl) agg is map-side combined, so the hub costs its edge count
    // once per round and `rows` stays one per node.
    def probeLpa(scale: String, es: DataFrame): Unit = {
      val canon = ops.Graph.canonicalEdges(es, "source", "target")
        .withColumn("w", lit(1L))
      val (rows, t) = time(ops.Graph.labelPropagation(canon, rounds = 4).count())
      emit("q137_lpa_communities", scale, canon.count(), t, rows)
    }
    probeLpa("1x", edges)
    probeLpa("celebrity", withCeleb)
    probeLouvain(spark, "1x", edges)
    probeLouvain(spark, "celebrity", withCeleb)

    // q136: token drift where the recrawl APPENDS the boilerplate cluster
    // — the vocab-sized agg must absorb `inject` near-identical docs
    // without the output growing past the (bounded) vocabulary.
    def probeDrift(scale: String, neu: DataFrame, n: Long): Unit = {
      val (rows, t) = time(
        ops.Drift.tokenDrift(base, neu, "text").count())
      emit("q136_token_drift", scale, n, t, rows)
    }
    probeDrift("1x", base, nBase)
    probeDrift(s"boiler+${inject}", base.unionAll(cluster), nBase + inject)

    // q139: hashed linear classifier over the mult× corpus — a pure
    // per-row pass; time must scale linearly and rows = docs.
    def probeClassifier(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time(
        ops.Featurize.hashedLinearScore(docs, "doc_id", "text").count())
      emit("q139_quality_classifier", scale, n, t, rows)
    }
    probeClassifier("1x", base, nBase)
    probeClassifier(s"${mult}x", big, nBig)

    // q138: epoch mixture where ONE stratum holds nearly all the token
    // mass (the big unioned corpus as a single source vs tiny per-mod
    // strata). The per-stratum agg is map-side combined so the fat
    // stratum costs its row count once; output stays one row/stratum
    // and the DECIMAL(38,0) products must absorb the inflated budget.
    def probeEpoch(scale: String, docs: DataFrame, n: Long): Unit = {
      val strata = docs.withColumn("src",
        when(col("doc_id") % 101L === 0L,
          concat(lit("minor"), (col("doc_id") % 7L).cast("string")))
          .otherwise(lit("major")))
      val (rows, t) = time(ops.Sampling.epochMixture(
        strata, "src", length(col("text")).cast("long")).count())
      emit("q138_epoch_mixture", scale, n, t, rows)
    }
    probeEpoch("1x", base, nBase)
    probeEpoch(s"${mult}x skewed-major", big, nBig)

    // q108: temporal evolution with a celebrity DAY — one day holding a
    // degree-`inject` star (every edge first-seen that day). Per-day
    // rollups are hash aggs over the day-edge frame, so the hot day costs
    // its row count once; output stays one row per day.
    val dayPairs = ops.GlobalLag.withLag(
        relational.Tables.events(spark, sfDir)
          .select("user_id", "ts_ns", "event_id", "ts_sec"),
        Seq("ts_ns", "event_id"), "user_id", "prev")
      .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
      .select(expr("ts_sec div 86400").as("day"),
        least(col("prev"), col("user_id")).as("a"),
        greatest(col("prev"), col("user_id")).as("b"))
      .persist()
    val (r108a, t108a) = time(ops.Graph.temporalEvolution(dayPairs).count())
    emit("q108_graph_evolution", "1x", dayPairs.count(), t108a, r108a)
    val celebDay = spark.range(inject).select(
      lit(99999L).as("day"), lit(-1L).as("a"), col("id").as("b"))
    val withCelebDay = dayPairs.unionAll(celebDay)
    val (r108b, t108b) = time(ops.Graph.temporalEvolution(withCelebDay).count())
    emit("q108_graph_evolution", "celebrity day", withCelebDay.count(), t108b, r108b)

    // q141/q142: banded-Hamming near-dup with a hot fingerprint cluster —
    // `inject` IDENTICAL fingerprints put the whole cluster into one
    // bucket of every band; the bucket cap must drop it from candidate
    // generation entirely, so pair volume tracks the background corpus,
    // never inject². Bands here are 4×16-bit (pigeonhole for ≤3 bits
    // still holds): band width must be sized to the corpus — background
    // candidate volume is Σ n_bucket², i.e. ~n²/2^bandBits per band, so
    // a 100 TB run widens bands the way it widens hash partitions.
    def probeHamming(scale: String, nBg: Long, withCluster: Boolean): Unit = {
      val bg = spark.range(nBg).select(col("id"), xxhash64(col("id")).as("fp"))
      val fps = if (withCluster)
        bg.unionAll(spark.range(inject).select(
          (col("id") + 900000000L).as("id"), lit(0x5a5a5a5aL).as("fp")))
      else bg
      val (rows, t) = time(ops.Dedup.bandedHammingPairs(fps.toDF(), "id", "fp",
        nBands = 4, bandBits = 16, maxHamming = 3, maxBucketSize = 512L).count())
      emit("q142_banded_hamming", scale, nBg + (if (withCluster) inject else 0L),
        t, rows)
    }
    probeHamming("1x", nBase, withCluster = false)
    probeHamming(s"${mult}x", nBase * mult, withCluster = false)
    probeHamming(s"${mult}x+${inject} identical fps (hot bucket, capped)",
      nBase * mult, withCluster = true)

    // q144: span decontamination where the replicated corpus makes every
    // bench doc's 13-grams hit `mult` train replicas — removed-token
    // volume must scale with MATCHES (linear in mult), cost with corpus
    // size; the bench gram set stays the small fixed side.
    def probeSpan(scale: String, docs: DataFrame, n: Long): Unit = {
      val bench = base.filter(col("doc_id") % 50 === 0)
      val (rows, t) = time(ops.Contamination.spanDecontaminate(
          docs, bench, "doc_id", "text", n = 13)
        .agg(sum("n_removed")).collect().head.getLong(0))
      emit("q144_span_decon_removed", scale, n, t, rows)
    }
    probeSpan("1x", base, nBase)
    probeSpan(s"${mult}x+cluster", big, nBig)

    // q267: cross-doc substring dedup on the pathological corpus. The
    // mult× id-remapped replicas make EVERY gram cross-doc duplicated
    // (worst case: covered positions ≈ all tokens), and the boilerplate
    // cluster concentrates one gram set on 10⁴ docs. The kernel has no
    // pair join anywhere — hits are a semi-join and the explode is a
    // fixed k× of hit positions — so cost must scale with corpus size,
    // not with duplication-cluster size squared.
    def probeCrossDoc(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time(ops.Dedup.crossDocSpanDedup(
          docs, "doc_id", "text", k = 8)
        .agg(sum("n_removed")).collect().head.getLong(0))
      emit("q267_crossdoc_removed", scale, n, t, rows)
    }
    probeCrossDoc("1x", base, nBase)
    probeCrossDoc(s"${mult}x+cluster", big, nBig)

    // q262's operator form (Bipartite.projectCapped) under a 2*10^4-item
    // bot user: uncapped, that single user is a ~2*10^8-pair straggler
    // task; capped at 64 its contribution is <= 64^2 while every
    // all-under-cap pair count stays exact. Cost must track the
    // incidence size, not the bot's |items|^2.
    def probeBipartite(scale: String, nUsers: Int, withBot: Boolean): Unit = {
      val normal = spark.range(nUsers.toLong * 20).select(
        (col("id") % nUsers).as("user_id"), (col("id") % 500).as("item_id"))
      val incidence =
        if (!withBot) normal
        else normal.unionAll(spark.range(20000).select(
          lit(777777L).as("user_id"), (col("id") + 100000L).as("item_id")))
      val (rows, t) = time(ops.Bipartite.projectCapped(
          incidence, "user_id", "item_id", 64).count())
      emit("q262_bipartite_capped", scale, incidence.count(), t, rows)
    }
    probeBipartite("1x", 5000, withBot = false)
    probeBipartite("1x+bot", 5000, withBot = true)

    // q268's read path, measured at sf scale: the same events projection
    // written (a) z-ordered on (day, user_id) and (b) lexicographically
    // range-clustered, then read through the same 2-D box. `rows` is the
    // scan metric (rows surviving parquet footer row-group pruning) —
    // the lex layout is tight on day but spans ALL users per file, so
    // the user half of the box prunes nothing; z must scan strictly
    // fewer. Seconds include the one-time layout write (setup), so the
    // reading that matters is the rows-scanned ratio, not wall-clock.
    def probeZorder(): Unit = {
      val ev = relational.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("value"),
          expr("ts_sec div 86400").as("day"))
      val nEv = ev.count()
      def run(name: String, write: (DataFrame, String) => Unit): Unit = {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_zprobe_").toString
        write(ev, dir)
        val t0 = System.nanoTime()
        val df = spark.read.parquet(dir)
          .filter(col("day").between(19735L, 19742L) &&
            col("user_id").between(30L, 89L))
        df.collect()
        val scanned = df.queryExecution.executedPlan.collectLeaves()
          .collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec =>
              s.metrics("numOutputRows").value
          }.sum
        emit("q268_zorder_scan", name, nEv,
          (System.nanoTime() - t0) / 1e9, scanned)
        locally {
          import scala.jdk.CollectionConverters._
          val root = java.nio.file.Paths.get(dir)
          java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        }
      }
      run("zorder", (d, dir) =>
        sources.Io.writeZOrdered(d, dir, Seq("day", "user_id"),
          numFiles = 16, bits = 8))
      run("lex", (d, dir) =>
        sources.Io.writeClustered(d, dir, Seq("day", "user_id"),
          numFiles = 16))
    }
    probeZorder()

    // q309/q310 probe: zone-map serving must track the ANSWER (pruned
    // buckets × rows per bucket at fixed selectivity), and the CDC
    // upsert must track the DELTA — both ~flat when the corpus grows
    // mult× with the bucket count scaled to hold per-bucket volume
    // (the 100 TB sizing rule: buckets track bytes).
    def probeZoneMap(): Unit = {
      val li = relational.Tables.t(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      val nLi = li.count()
      val liBig = (0 until mult).map(k =>
          li.withColumn("l_orderkey",
            col("l_orderkey") + lit(k * 10000000L)))
        .reduce(_ unionAll _).persist()
      val nBig2 = liBig.count()
      def run(scale: String, df: DataFrame, n: Long, buckets: Int): Unit = {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_zmprobe_").toString
        ops.ZoneMap.build(df, "l_orderkey", dir, nBuckets = buckets)
        val (_, tServe) = time {
          ops.ZoneMap.rangeQuery(spark, dir, "l_orderkey", 1000L, 1399L)
            .agg(count(lit(1)), sum("l_quantity")).collect()
        }
        val (hit, total) = ops.ZoneMap.prunedSelection(spark, dir, 1000L, 1399L)
        emit("q309_zonemap_serve", scale, n, tServe, hit.toLong)
        val delta = df.filter(col("l_orderkey").between(1000, 1099))
          .withColumn("l_quantity", col("l_quantity") + lit(5.0))
        val (_, tCdc) = time {
          ops.ZoneMap.update(spark, dir, delta, "l_orderkey",
            Seq("l_orderkey", "l_linenumber"))
        }
        emit("q310_zonemap_cdc", scale, n, tCdc, total.toLong)
      }
      run("1x", li, nLi, 64)
      run(s"${mult}x", liBig, nBig2, 64 * mult)
      liBig.unpersist()
    }
    probeZoneMap()

    // q311 probe: Bradley-Terry cost must be ONE corpus scan (the
    // rater×item utility agg) + types²-bounded everything after — a
    // mult× corpus costs ~the scan ratio, and a degree-skewed rater
    // (one user re-logging one pair millions of times) adds only its
    // row count to the map-side combine, never a bigger wins matrix.
    def probePreference(): Unit = {
      val ev = relational.Tables.events(spark, sfDir)
        .select("user_id", "event_type", "value")
      val nEv = ev.count()
      def run(scale: String, df: DataFrame, n: Long): Unit = {
        val ut = df.groupBy(col("user_id").as("rater"),
            col("event_type").as("item"))
          .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast("long").as("w"))
        val (rows, t) = time {
          ops.Preference.bradleyTerry(ops.Preference.winsMatrix(ut), 3)
            .collect().length.toLong
        }
        emit("q311_bradley_terry", scale, n, t, rows)
      }
      run("1x", ev, nEv)
      val big = (0 until mult).map(k =>
          ev.withColumn("user_id", col("user_id") + lit(k * 10000000L)))
        .reduce(_ unionAll _)
      run(s"${mult}x", big, nEv * mult)
    }
    probePreference()

    // q314/q315 probe: the MV-served aggregate must cost the SUMMARY
    // (constant in the corpus), while the base aggregate costs the scan
    // — the ratio is the acceleration the rewrite buys at any scale.
    def probeMv(): Unit = {
      val base = java.nio.file.Files.createTempDirectory("graft_mvprobe_")
        .toString + "/lineitem"
      val li = relational.Tables.t(spark, sfDir, "lineitem")
      (0 until mult).map(_ => li).reduce(_ unionAll _)
        .write.mode("overwrite").parquet(base)
      val n = spark.read.parquet(base).count()
      def q() = spark.read.parquet(base)
        .filter(col("l_linestatus") === "F")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("sk"))
        .orderBy("l_returnflag")
      val (_, tBase) = time { q().collect() }
      emit("q314_mv_base_scan", s"${mult}x", n, tBase, 0L)
      val mv = java.nio.file.Files
        .createTempDirectory("graft_mvprobe_sum_").toString
      spark.read.parquet(base).groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum("l_orderkey").as("sum_l_orderkey"),
          sum("l_suppkey").as("sum_l_suppkey"))
        .coalesce(1).write.mode("overwrite").parquet(mv)
      org.apache.spark.sql.GraftRegistrar.register(spark)
      plans.MvRewrite.register(spark, base, mv,
        Set("l_returnflag", "l_linestatus"), Set("l_orderkey", "l_suppkey"))
      val (_, tMv) = time { q().collect() }
      emit("q314_mv_served", s"${mult}x", n, tMv, 0L)
    }
    probeMv()

    // q270: theta-sketch segment build under a hot-key segment — 2*10^4
    // duplicate rows of one key must cost 2*10^4 O(1) updates absorbed
    // by map-side partial aggregation (one retained hash), so seconds
    // track row count, not distinct structure; `rows` = the union
    // estimate (sanity: duplicates add nothing).
    def probeTheta(scale: String, keys: DataFrame, n: Long): Unit = {
      val theta = udaf(functions.ThetaAggregator(4096),
        org.apache.spark.sql.Encoders.scalaLong)
      val (est, t) = time {
        val sks = keys
          .select(col("k"), explode(array(
            when(col("k") % 2 === 0, "a"), when(col("k") % 3 === 0, "b")))
            .as("seg"))
          .filter(col("seg").isNotNull)
          .groupBy("seg").agg(theta(col("k")).as("sk"))
          .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
          .toMap
        functions.ThetaSketch.union(Seq(sks("a"), sks("b")), 4096)
          .getEstimate.toLong
      }
      emit("q270_theta_union_est", scale, n, t, est)
    }
    val thetaBase = spark.range(200000L).select(col("id").as("k"))
    probeTheta("1x", thetaBase, 200000L)
    probeTheta("1x+hotkey", thetaBase.unionAll(
      spark.range(20000L).select(lit(42L).as("k"))), 220000L)

    // q271: tier-7 join+agg IVM under a celebrity join key — the CDC
    // delta re-groups a key owning 2*10^4 B rows; maintenance cost must
    // track the delta's JOIN FAN-OUT (the 2*10^4 matching rows), never
    // the standing corpus (the untouched groups are only probed).
    def probeJoinAgg(scale: String, bExtra: Option[DataFrame]): Unit = {
      val a = spark.range(5000L).select(col("id").as("k"),
        concat(lit("g"), (col("id") % 7).cast("string")).as("grp"))
      val b0 = spark.range(100000L).select((col("id") % 5000L).as("k"),
        col("id").as("line"), lit("1.25").as("v"))
      val b = bExtra.map(b0.unionAll).getOrElse(b0)
      val nB = b.count()
      val aDel = a.filter(col("k") === 42L)
      val aIns = aDel.withColumn("grp", lit("gX"))
      val bDel = b.filter(col("k") === 77L && col("line") < 50000L)
      val bIns = spark.range(100L).select(lit(42L).as("k"),
        (col("id") + 10000000L).as("line"), lit("9.99").as("v"))
      val view = a.join(b, Seq("k")).groupBy("grp")
        .agg(count(lit(1)).as("n"),
          sum(relational.Sql.dec2(col("v"))).as("s"))
        .localCheckpoint(true)
      val (rows, t) = time(ops.Incremental.mergeJoinAggView(
        view, a, b, aIns, aDel, bIns, bDel, "k", Seq("grp"), "v").count())
      emit("q271_ivm_join_agg", scale, nB, t, rows)
    }
    probeJoinAgg("1x", None)
    probeJoinAgg("1x+celebrity-key", Some(spark.range(20000L).select(
      lit(42L).as("k"), (col("id") + 1000000L).as("line"),
      lit("2.00").as("v"))))

    // q276: 3-D skyline under dominated mass — 2*10^5 copies of one
    // deeply-dominated point must be pruned partition-locally (each
    // local sweep emits its skyline, bounded by distinct y), so seconds
    // track the scan, never the dominated multiplicity, and the global
    // pass moves only candidates.
    def probeSkyline(scale: String, extra: Option[DataFrame]): Unit = {
      val li = relational.Tables.lineitem(spark, sfDir)
        .filter(col("l_extendedprice").isNotNull &&
          col("l_quantity").isNotNull && col("l_discount").isNotNull)
        .select(
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 " +
            "AS BIGINT) div 50000").as("x"),
          col("l_quantity").cast("long").as("y"),
          expr("CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)")
            .as("z"))
      val in = extra.map(li.unionAll).getOrElse(li)
      val n = in.count()
      val (rows, t) = time(ops.Skyline.skyline3d(in, "x", "y", "z").count())
      emit("q276_skyline3d", scale, n, t, rows)
    }
    probeSkyline("1x", None)
    probeSkyline("1x+dominated-mass", Some(spark.range(200000L).select(
      lit(9999L).as("x"), lit(1L).as("y"), lit(0L).as("z"))))

    // q277: Merkle replica diff at table scale — the identical-replica
    // run must cost only the two digest passes (empty rescan), and the
    // diverging run's extra cost tracks the mismatched buckets' rows.
    def probeMerkle(scale: String, diverge: Boolean): Unit = {
      val o = relational.Tables.orders(spark, sfDir).select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      val b = if (!diverge) o
        else o.filter(col("o_orderkey") % 103 =!= 5)
          .withColumn("cents", when(col("o_orderkey") % 101 === 7,
            col("cents") + 1).otherwise(col("cents")))
      val n = o.count()
      val dg = expr("CAST(conv(substring(md5(concat(CAST(o_orderkey AS " +
        "STRING), ':', CAST(cents AS STRING))), 1, 15), 16, 10) AS BIGINT)")
      val (rows, t) = time(
        ops.Audit.merkleBucketDiff(o, b, "o_orderkey", dg, 256).count())
      emit("q277_merkle_diff", scale, n, t, rows)
    }
    probeMerkle("identical-replicas", diverge = false)
    probeMerkle("diverging", diverge = true)

    // q298: persisted inverted text index CDC maintenance — the SAME
    // 40-doc delta against a 1x and a mult× corpus. The rewrite unit is
    // the term-bucket partition; production sizing holds bucket bytes
    // constant (buckets ∝ corpus, like shuffle partitions), so the
    // bucket count scales with the corpus here and the maintenance cost
    // must stay ~flat: delta-sized tokenize + the touched buckets'
    // rewrite + a column-pruned (doc_id, bucket) discovery scan.
    def probeTextIndex(scale: String, docs: DataFrame, n: Long,
        nBuckets: Int): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory("probe_txtidx").toString
      ops.TextIndex.buildPhraseIndex(docs, "doc_id", "text", dir, nBuckets)
      val removed = docs.select("doc_id").limit(20).localCheckpoint(true)
      val added = docs.limit(20)
        .select((col("doc_id") + 800000000L).as("doc_id"),
          concat(col("text"), lit(" fast table value")).as("text"))
        .localCheckpoint(true)
      val (_, t) = time(ops.TextIndex.updatePhraseIndex(
        spark, dir, added, removed, "doc_id", "text"))
      val rows = ops.TextIndex.readPostings(spark, dir).count()
      emit("q298_text_index_update", scale, n, t, rows)
      // the SERVE path against the same standing index: tf/df read only
      // the query terms' buckets, so with bucket count scaled to the
      // corpus the ranked-retrieval latency must stay ~flat too
      val (hits, t2) = time(ops.TextIndex.bm25TopKFromIndex(
        spark, dir, Seq("fast", "table", "value"), 20).count())
      emit("q304_index_bm25_serve", scale, n, t2, hits)
    }
    probeTextIndex("1x", base, nBase, nBuckets = 64)
    probeTextIndex(s"${mult}x+cluster (same 40-doc delta, buckets scaled)",
      big, nBig, nBuckets = 64 * mult)
    probeTextIndexStream(spark, "1x", base, nBase, nBuckets = 64)
    probeTextIndexStream(spark,
      s"${mult}x+cluster (same delta, 3 micro-batches)",
      big, nBig, nBuckets = 64 * mult)

    // q281: tier-8 CC merge where the delta chains 2*10^4 standing
    // singleton components into ONE — the giant merging component is the
    // skew surface. Standing labels scale 1x -> 10x; the same delta's
    // pointer-jumping work is bounded by the merging components, so
    // seconds must track the delta (plus one remap join over the label
    // table), never the standing corpus.
    def probeMergeComponents(scale: String, nStanding: Long): Unit = {
      val nChain = 20000L
      val labels = spark.range(nStanding)
        .select(col("id").as("node"), col("id").as("label"))
        .localCheckpoint(true)
      val delta = spark.range(nChain - 1)
        .select(col("id").as("a"), (col("id") + 1L).as("b"))
      val (rows, t) = time(ops.Incremental.mergeComponents(
        labels, delta, "a", "b").filter(col("label") === 0L).count())
      emit("q281_merge_components", scale, nStanding, t, rows)
    }
    probeMergeComponents("2*10^4-chain merge, 1x labels", 20000L)
    probeMergeComponents("2*10^4-chain merge, 10x labels", 200000L)

    // q283: priority sampling under ONE hot weight ~10^6x the base —
    // the heap top-k must stay a TakeOrderedAndProject (k rows per
    // partition cross the wire, never the corpus) and the arithmetic
    // exact BIGINT (4e6 * 2^40 < 2^63, the documented w < 2^23 domain).
    def probePriority(scale: String, hot: Boolean): Unit = {
      val n = 2000000L
      val docs0 = spark.range(n)
        .select(col("id").as("doc_id"), (col("id") % 8L + 1L).as("w"))
      val docs = if (hot) docs0.unionAll(spark.range(1L)
        .select(lit(999999999L).as("doc_id"), lit(4000000L).as("w")))
        else docs0
      val (rows, t) = time(docs.select(col("doc_id"),
          expr("""(w * CAST(1099511627776 AS BIGINT)) div
            |(CAST(conv(substring(md5(concat('wsamp:',
            |CAST(doc_id AS STRING))), 1, 10), 16, 10) AS BIGINT) + 1)"""
            .stripMargin.replace("\n", " ")).as("priority"))
        .orderBy(col("priority").desc, col("doc_id")).limit(100).count())
      emit("q283_priority_sample", scale, n, t, rows)
    }
    probePriority("uniform weights", hot = false)
    probePriority("one 10^6x hot weight", hot = true)

    // q285: forget cascade where one forgotten customer owns 10^4
    // orders — the cascade must stay a semi/anti-join pipeline whose
    // cost tracks the tables scanned once, with no pair blowup on the
    // hot key (semi-joins emit each probe row at most once).
    def probeCascade(scale: String, hotOrders: Long): Unit = {
      val cust = spark.range(1L, 2001L).select(col("id").as("c_custkey"))
      val forget = cust.filter(col("c_custkey") % 37 === 1)
      val orders = spark.range(hotOrders)
        .select((col("id") + 10000000L).as("o_orderkey"),
          lit(38L).as("o_custkey"))
        .unionAll(spark.range(200000L)
          .select(col("id").as("o_orderkey"),
            (col("id") % 2000L + 1L).as("o_custkey")))
      val li = orders.select(col("o_orderkey").as("l_orderkey"))
        .unionAll(orders.select(col("o_orderkey").as("l_orderkey")))
      val (_, t) = time(graft.relational.RelationalQueries
        .forgetCascade(forget, cust, orders, li).count())
      emit("q285_forget_cascade", scale, hotOrders + 200000L, t, 9L)
    }
    probeCascade("uniform ownership", hotOrders = 0L)
    probeCascade("one customer owns 10^4 orders", hotOrders = 10000L)

    // q143: perceptron training on the pathological corpus — the
    // boilerplate cluster concentrates `inject` near-identical feature
    // rows on a handful of buckets (hot gradient keys, absorbed by the
    // map-side combine). Epoch cost must track corpus size; the output
    // is the 65-row model regardless of scale.
    def probePerceptron(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time(
        ops.Featurize.perceptronTrain(docs, "doc_id", "text").count())
      emit("q143_perceptron_train", scale, n, t, rows)
    }
    probePerceptron("1x", base, nBase)
    probePerceptron(s"${mult}x+cluster (hot feature buckets)", big, nBig)

    // ---- round-11 capstone probes (VERDICT round-10 #5): the second-half
    // kernels at the 20×/2·10⁴ pathological shapes ----

    // q154/q159: event funnel with a CELEBRITY USER carrying `inject`
    // events — the per-user window's worst key. The partition is bounded
    // by that user's event count (never the corpus), so cost must track
    // total rows; output is one row per user then a 3-row rollup.
    val evBase = relational.Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts_sec").persist()
    val nEv = evBase.count()
    def probeFunnel(scale: String, ev: DataFrame, n: Long): Unit = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val (rows, t) = time {
        ev.withColumn("t1",
            min(when(col("event_type") === "view", col("ts_sec"))).over(w))
          .withColumn("t2", min(when(col("event_type") === "click" &&
            col("ts_sec") > col("t1"), col("ts_sec"))).over(w))
          .withColumn("t3", min(when(col("event_type") === "purchase" &&
            col("ts_sec") > col("t2"), col("ts_sec"))).over(w))
          .groupBy("user_id")
          .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
          .agg(count(col("t1")) + count(col("t2")) + count(col("t3")))
          .collect().head.getLong(0)
      }
      emit("q154_event_funnel", scale, n, t, rows)
    }
    probeFunnel("1x", evBase, nEv)
    val celebEvents = spark.range(inject).select(
      lit(-1L).as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase")),
        (col("id") % 3 + 1).cast("int")).as("event_type"),
      (lit(1704067200L) + col("id") * 60L).as("ts_sec"))
    probeFunnel(s"celebrity user with $inject events",
      evBase.unionAll(celebEvents), nEv + inject)

    // q155: cohort retention with ONE HOT COHORT DAY — `inject` users all
    // first-active on the same day. Both aggs are user-keyed hash aggs
    // (the hot day is not a shuffle key until the final bounded rollup),
    // so cost must track rows; output stays ≤ days² cells.
    def probeCohort(scale: String, ev: DataFrame, n: Long): Unit = {
      val (rows, t) = time {
        val days = ev.select(col("user_id"), expr("ts_sec div 86400").as("day"))
        val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
        days.distinct().join(cohort, Seq("user_id"))
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .count()
      }
      emit("q155_cohort_retention", scale, n, t, rows)
    }
    probeCohort("1x", evBase, nEv)
    val hotCohort = spark.range(inject).select(
      (col("id") + 900000000L).as("user_id"), lit("view").as("event_type"),
      (lit(1704067200L) + (col("id") % 5) * 86400L + col("id") % 1000).as("ts_sec"))
    probeCohort(s"one cohort day gaining $inject users",
      evBase.unionAll(hotCohort), nEv + inject)

    // q228: conversion-latency deciles with (a) a HOT VALUE BIN —
    // `inject` users all converting with the identical latency, so the
    // value-domain histogram concentrates in one row — and (b) a
    // celebrity user with `inject` events in one window partition. The
    // machinery is per-user windows (user-keyed, the celebrity is one
    // partition's rows) + a histogram whose size is DISTINCT latencies,
    // so neither shape may move cost or output size.
    def probeLatency(scale: String, ev: DataFrame, n: Long): Unit = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val (rows, t) = time {
        val lat = ev
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts_sec"))).over(w))
          .withColumn("tp", min(when(col("event_type") === "purchase" &&
            col("ts_sec") > col("t1"), col("ts_sec"))).over(w))
          .groupBy("user_id")
          .agg((first("tp") - first("t1")).as("lat"))
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
        broadcast(ks).join(gp, col("gpct") >= col("k") * 100000)
          .groupBy("k").agg(min("val").as("upper_latency_s")).count()
      }
      emit("q228_conversion_latency", scale, n, t, rows)
    }
    probeLatency("1x", evBase, nEv)
    val hotLatency = spark.range(inject).flatMap { i =>
      Seq((800000000L + i, "view", 1704067200L),
        (800000000L + i, "purchase", 1704067200L + 777L))
    }.toDF("user_id", "event_type", "ts_sec")
    val celebConvert = spark.range(inject).select(lit(-7L).as("user_id"),
      element_at(array(lit("view"), lit("purchase")),
        (col("id") % 2 + 1).cast("int")).as("event_type"),
      (lit(1704067200L) + col("id") * 60L).as("ts_sec"))
    probeLatency(s"$inject identical-latency users + celebrity with $inject events",
      evBase.unionAll(hotLatency).unionAll(celebConvert),
      nEv + 3 * inject)

    // q230: per-node clustering coefficient with the celebrity star —
    // the wedge join is degree-ORIENTED (each edge points low→high
    // (deg, id) rank), so the hub's `inject` edges all point INTO it
    // and it centers no wedges; cost tracks Σ outdeg² = O(m^1.5), and
    // output stays one row per node.
    def probeClustering(scale: String, es: DataFrame): Unit = {
      val (rows, t) = time(
        ops.Graph.localClustering(es, "source", "target").count())
      emit("q230_local_clustering", scale, es.count(), t, rows)
    }
    probeClustering("1x", edges)
    probeClustering("celebrity", withCeleb)

    // q229: inverted-index all-pairs similarity (word 3-shingle units)
    // where the boilerplate cluster (`inject` docs sharing one body)
    // drives every shared shingle's df to cluster size ≫ 64 — the df cap
    // must DROP those shingles from pair generation entirely (a unit in
    // every doc carries no discrimination), so pair mass tracks
    // Σ_{2≤df≤64} df² over the background corpus, never inject².
    def probeSparseCos(scale: String, docs: DataFrame, n: Long): Unit = {
      val sh = docs.select(col("doc_id"), lit("en").as("lang"), col("text"))
        .select(col("doc_id"),
          explode(ops.Dedup.shingleArray(col("text"), 3)).as("sh"))
      val dfx = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 64))
      val wt = sh.join(dfx, Seq("sh"))
      val (pairs, t) = time(
        wt.select(col("sh"), col("doc_id").as("a"))
          .join(wt.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
          .filter(col("b") > col("a")).count())
      println(f"""{"probe":"q229_sparse_cosine_pairs","scale":"$scale","input":$n,"seconds":$t%.2f,"rows":$pairs}""")
    }
    probeSparseCos("1x", base, nBase)
    probeSparseCos(s"${mult}x + $inject-doc boilerplate cluster", big, nBig)

    // q146/q156: banded-Hamming pairs → components → keeper with a
    // GIANT FINGERPRINT CLUSTER. All `inject` cluster fps sit within
    // Hamming ≤ 2, so every band bucket holds the whole cluster — the
    // 512-cap drops those buckets from candidate generation (the
    // documented contract: exact-fp groups are collapsed by callers
    // first), so pair volume and chain cost must track the BACKGROUND
    // corpus, never inject².
    def probeHammingChain(scale: String, nBg: Long, withCluster: Boolean): Unit = {
      val bg = spark.range(nBg).select(col("id"), xxhash64(col("id")).as("fp"))
      val fps = (if (withCluster)
        bg.unionAll(spark.range(inject).select((col("id") + 900000000L).as("id"),
          lit(0x5a5a5a5aL).bitwiseOR(col("id") % 4).as("fp")))
      else bg).toDF()
      val (rows, t) = time {
        val pairs = ops.Dedup.bandedHammingPairs(fps, "id", "fp",
          nBands = 4, bandBits = 16, maxHamming = 3, maxBucketSize = 512L)
        val canon = ops.Dedup.canonicalize(fps.select("id"), "id", pairs)
        val scored = fps.select(col("id"), bit_count(col("fp")).cast("double").as("q"))
        ops.Dedup.selectRepresentatives(canon, scored, "id", "q")
          .filter(col("is_rep") === 1L).count()
      }
      emit("q156_hamming_component_keeper", scale,
        nBg + (if (withCluster) inject else 0L), t, rows)
    }
    probeHammingChain("1x", nBase, withCluster = false)
    probeHammingChain(s"${mult}x+$inject near-identical fps (capped)",
      nBase * mult, withCluster = true)

    // q151 (semantic side): semanticDedup with `inject` IDENTICAL
    // embeddings — one LSH bucket holding the whole cluster. The opt-in
    // cap degrades it to star pairs, so the giant cluster SURVIVES as one
    // component at O(f) edges; rows = dropped members ≈ inject − 1.
    def probeSemantic(scale: String, extra: Long): Unit = {
      val base500 = relational.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 500).select("vec_id", "embedding")
      // element type must stay FLOAT: a double-promoted array would make
      // the union coerce base500 to double and the float-typed native dot
      // in annBuckets null the buckets out
      val vecs = (if (extra > 0)
        base500.unionAll(spark.range(extra).select(
          (col("id") + 900000000L).as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            i => (i.cast("double") / 64d + 1d).cast("float")).as("embedding")))
      else base500).toDF()
      val (rows, t) = time {
        ops.Similarity.semanticDedup(vecs, "vec_id", "embedding",
            threshold = 0.95, dim = 64, planes = 8, maxBucketSize = 64)
          .filter(col("is_keep") === 0L).count()
      }
      emit("q151_semantic_components", scale, 500L + extra, t, rows)
    }
    probeSemantic("1x", 0L)
    probeSemantic(s"$inject identical embeddings (one bucket, star-degraded)", inject.toLong)

    // q158: n-gram novelty with a HOT GRAM — `inject` docs share one
    // body, so each of its grams is corpus-frequency ~inject. Attribution
    // is a min hash agg over the distinct gram frame (map-side combined),
    // so the hot gram costs one combiner row per task; output stays one
    // row per doc.
    def probeNovelty(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time {
        val grams = ops.Dedup.shingleRows(docs, "doc_id", "text", 3).distinct()
        val firstDoc = grams.groupBy("sh").agg(min("id").as("first_doc"))
        grams.join(firstDoc, Seq("sh"))
          .groupBy("id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("id") === col("first_doc"), 1L).otherwise(0L)).as("n_novel"))
          .count()
      }
      emit("q158_novelty_scoring", scale, n, t, rows)
    }
    probeNovelty("1x", base, nBase)
    probeNovelty(s"${mult}x+cluster (hot grams)", big, nBig)

    // q157: single-pass constraint audit on the replicated corpus — the
    // audit is aggregate expressions fused into one scan; cost must be
    // linear in rows and independent of any skew.
    def probeAudit(scale: String, docs: DataFrame, n: Long): Unit = {
      val (rows, t) = time {
        ops.Audit.audit(docs, Seq(
            ops.Audit.complete("text_present", col("text")),
            ops.Audit.unique("id_unique", col("doc_id")),
            ops.Audit.satisfies("nonempty", length(col("text")) > 0)))
          .count()
      }
      emit("q157_constraint_audit", scale, n, t, rows)
    }
    probeAudit("1x", base, nBase)
    probeAudit(s"${mult}x+cluster", big, nBig)

    // q145: scene-cut detection on ONE LONG VIDEO — the per-video window
    // is the unit of work, so a 2·10³-frame video is one task decoding
    // 2·10³ JPEGs; cost must scale with total frames.
    def probeScenes(scale: String, nVideos: Int, framesPer: Int): Unit = {
      implicit val sp: SparkSession = spark
      import spark.implicits._
      val vids = (0 until nVideos).map { v =>
        val levels = Array.tabulate(framesPer)(f =>
          (f / 3 * 40 + (f % 3)) % 248)
        (v.toLong, ops.Multimodal.aviMjpegBytesFrom(8, 8, levels))
      }.toDF("media_id", "content")
        .repartition(math.min(nVideos, spark.sparkContext.defaultParallelism))
      val (rows, t) = time(
        ops.Multimodal.videoSceneCuts(vids).agg(max("scene_id"))
          .collect().head.getLong(0))
      emit("q145_video_scene_cuts", scale, nVideos.toLong * framesPer, t, rows)
    }
    probeScenes("20 videos x 50 frames", 20, 50)
    probeScenes(s"1 video x ${math.min(inject / 5, 4000)} frames (one fat partition)",
      1, math.min(inject / 5, 4000))

    // q180: HITS with a CELEBRITY AUTHORITY — `inject` distinct sources
    // all pointing at one node. Per round the hub/auth frames are
    // node-sized hash aggs (map-side combinable), so the hot node is one
    // combiner key, never a single-task partition of raw edges.
    locally {
      val de = evBase
        .select(col("user_id").as("s"), (col("user_id") % 97).as("t"))
        .distinct()
      def probeHits(scale: String, edges: DataFrame, n: Long): Unit = {
        val (rows, t) = time(ops.Graph.hits(edges, iters = 3).count())
        emit("q180_hits_scores", scale, n, t, rows)
      }
      val nDe = de.count()
      probeHits("1x", de, nDe)
      val celeb = spark.range(inject)
        .select((col("id") + 700000000L).as("s"), lit(-5L).as("t"))
      probeHits(s"celebrity authority with $inject in-edges",
        de.unionAll(celeb), nDe + inject)
    }

    // q181: skyline under ANTI-CORRELATED criteria — the worst case where
    // EVERY point is on the frontier (x + y constant), so partition-local
    // pruning removes nothing and the global sweep runs over the full
    // candidate union in one task. The probe pins that even this
    // degenerate shape stays a linear single-pass sweep (output = input);
    // correlated data (the 1x run) prunes to a handful of candidates.
    locally {
      def probeSky(scale: String, df: DataFrame, n: Long): Unit = {
        val (rows, t) = time(
          ops.Skyline.skyline2d(df, "x", "y").count())
        emit("q181_skyline", scale, n, t, rows)
      }
      val corr = spark.range(inject * 10L).select(col("id").as("doc_id"),
        (col("id") % 10007).as("x"), ((col("id") * 31L) % 9973).as("y"))
        .repartition(spark.sparkContext.defaultParallelism).persist()
      probeSky("uncorrelated 10x", corr, corr.count())
      // worst case for min-x/max-y: every price increase buys more
      // quantity, so no point dominates another — output = input and the
      // global sweep degenerates to one linear pass over all rows
      val anti = spark.range(inject * 10L).select(col("id").as("doc_id"),
        col("id").as("x"), col("id").as("y"))
        .repartition(spark.sparkContext.defaultParallelism).persist()
      probeSky("anti-correlated (all points on frontier)", anti, anti.count())
      corr.unpersist(); anti.unpersist()
    }

    // q185: rolling distinct with ONE HOT DAY — `inject` users all active
    // on the same day. The cover explode is a constant 7× regardless of
    // key skew, and the per-day count is a map-side-combined hash agg.
    locally {
      def probeRolling(scale: String, ev: DataFrame, n: Long): Unit = {
        val ad = ev.select(col("user_id"), expr("ts_sec div 86400").as("day"))
          .distinct()
        val days = ad.select("day").distinct()
        val (rows, t) = time(
          ad.select(col("user_id"),
              explode(expr("sequence(day, day + 6)")).as("day"))
            .distinct()
            .join(days, Seq("day"), "left_semi")
            .groupBy("day").agg(count(lit(1)).as("n_users"))
            .count())
        emit("q185_rolling_distinct", scale, n, t, rows)
      }
      probeRolling("1x", evBase, nEv)
      val hotDay = spark.range(inject).select(
        (col("id") + 800000000L).as("user_id"), lit("view").as("event_type"),
        lit(1704067200L).as("ts_sec"))
      probeRolling(s"one day with $inject distinct users",
        evBase.unionAll(hotDay), nEv + inject)
    }

    // q187: attribution with a CELEBRITY BUYER — one user with `inject`
    // touches and inject/10 purchases. The bucketized interval join keeps
    // candidates to the touches of a 6-day span per purchase; a plain
    // user-equi join would generate touches×purchases pairs for this user.
    locally {
      def probeAttr(scale: String, ev: DataFrame, n: Long): Unit = {
        val win = 259200L
        val touches = ev.filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), (col("ts_sec") * 1000000000L).as("t_ts"),
            col("event_type").as("touch_type"),
            explode(array(expr(s"ts_sec div $win"),
              expr(s"ts_sec div $win") + 1)).as("bk"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), (col("ts_sec") * 1000000000L).as("p_ts"),
            concat(col("user_id"), lit(":"), col("ts_sec")).as("pid"),
            expr(s"ts_sec div $win").as("bk"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("pid")
        val (rows, t) = time(
          purchases.join(touches, Seq("user_id", "bk"))
            .filter(col("t_ts") < col("p_ts") &&
              col("t_ts") >= col("p_ts") - lit(259200000000000L))
            .withColumn("k", count(lit(1)).over(w))
            .groupBy("touch_type")
            .agg(count(lit(1)).as("n_touches"),
              sum(expr("1000000 div k")).as("credit_ppm"))
            .count())
        emit("q187_linear_attribution", scale, n, t, rows)
      }
      probeAttr("1x", evBase, nEv)
      val buyer = spark.range(inject).select(lit(-9L).as("user_id"),
        element_at(array(lit("view"), lit("click"), lit("purchase")),
          (col("id") % 10 === 0).cast("int") * 2 + 1).as("event_type"),
        (lit(1704067200L) + col("id") * 600L).as("ts_sec"))
      probeAttr(s"celebrity buyer with $inject events",
        evBase.unionAll(buyer), nEv + inject)
    }

    // Straggler probe (VERDICT round-10 #1): ONE 10⁵-row bucket — every
    // row identical text, so all 10⁵ land in the same (band, bucket) of
    // every band. Under the old count().over(Window) cap this bucket was
    // sorted into a single task per band; under the groupBy+anti-join cap
    // the fat side keeps its input partitioning and only per-bucket
    // combiner rows cross the shuffle. The pin is the per-task ceiling:
    // max task duration must stay a small multiple of the mean, not the
    // whole job (a straggler shows up as max ≈ total wall-clock).
    locally {
      val fat = math.max(inject * 10, 100000)
      val oneBucket = spark.range(fat).select(col("id").as("doc_id"),
          lit(boiler).as("text"))
        .unionAll(spark.range(2000).select((col("id") + 500000000L).as("doc_id"),
          concat(lit("unique doc "), col("id").cast("string"),
            lit(" words "), (col("id") * 31L).cast("string")).as("text")))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
      oneBucket.count()
      val taskMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskInfo != null) taskMs.add(te.taskInfo.duration)
      }
      spark.sparkContext.addSparkListener(listener)
      val (rows, t) = try {
        time(ops.Dedup.minhashCandidates(oneBucket.toDF(), "doc_id", "text",
          numHashes = 32, bands = 8, maxBucketSize = 64).count())
      } finally {
        spark.sparkContext.removeSparkListener(listener)
      }
      val durs = taskMs.toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted
      val maxMs = if (durs.isEmpty) 0L else durs.last
      val p50Ms = if (durs.isEmpty) 0L else durs(durs.length / 2)
      println(f"""{"probe":"q37_hot_bucket_straggler","scale":"one ${fat}-row bucket","input":${fat + 2000},"seconds":$t%.2f,"rows":$rows,"max_task_ms":$maxMs,"p50_task_ms":$p50Ms,"tasks":${durs.length}}""")
      oneBucket.unpersist()
    }

    // q258: grid DBSCAN with a HOT CELL — `inject` points quantizing into
    // ONE grid cell. The kernel's first aggregate is map-side combinable,
    // so the hot cell collapses to a single dense-cell row before any
    // join; components then run on the (tiny) cell graph. A distance-join
    // DBSCAN would generate inject² pairs here.
    locally {
      def probeDbscan(scale: String, pts: DataFrame, n: Long): Unit = {
        val dense = pts.groupBy("cx", "cy").agg(count(lit(1)).as("n_pts"))
          .filter(col("n_pts") >= 3)
          .withColumn("cell",
            (col("cx") + lit(1000L)) * lit(100000L) + (col("cy") + lit(1000L)))
        val shifted = dense.select(col("cell").as("a"), col("cx"), col("cy"))
          .withColumn("dx", explode(expr("sequence(-1, 1)")))
          .withColumn("dy", explode(expr("sequence(-1, 1)")))
          .select(col("a"),
            ((col("cx") + col("dx") + lit(1000L)) * lit(100000L)
              + (col("cy") + col("dy") + lit(1000L))).as("b"))
        val edges = shifted.join(dense.select(col("cell").as("b")), Seq("b"))
        val (rows, t) = time(
          ops.Dedup.connectedComponents(edges, "a", "b")
            .join(dense.select(col("cell").as("node"), col("n_pts")), Seq("node"))
            .groupBy(col("label")).agg(sum("n_pts").as("n_points"))
            .count())
        emit("q258_grid_dbscan", scale, n, t, rows)
      }
      val embPts = relational.Tables.embeddings(spark, sfDir).select(
        expr("CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 40) AS BIGINT)").as("cx"),
        expr("CAST(floor(CAST(element_at(embedding, 2) AS DOUBLE) * 40) AS BIGINT)").as("cy"))
        .persist()
      val nPts = embPts.count()
      probeDbscan("1x", embPts, nPts)
      val hotCell = spark.range(inject)
        .select(lit(999L).as("cx"), lit(999L).as("cy"))
      probeDbscan(s"one cell with $inject points",
        embPts.unionAll(hotCell), nPts + inject)
      embPts.unpersist()
    }

    // q262: bipartite projection with an OMNIPRESENT type — every user
    // gains one extra incidence row, the worst case for the per-user
    // self-join (the new type co-occurs with everything). Fan-out stays
    // (|types|+1)² per user; output stays |types|²-bounded.
    locally {
      def probeBipartite(scale: String, inc: DataFrame, n: Long): Unit = {
        val nt = inc.groupBy("event_type").agg(count(lit(1)).as("ntyp"))
        val (rows, t) = time(
          inc.as("a").join(inc.as("b"),
              col("b.user_id") === col("a.user_id") &&
                col("b.event_type") > col("a.event_type"))
            .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
            .agg(count(lit(1)).as("co"))
            .join(broadcast(nt.select(col("event_type").as("ta"), col("ntyp").as("na"))), Seq("ta"))
            .count())
        emit("q262_bipartite_projection", scale, n, t, rows)
      }
      val inc = evBase.select("user_id", "event_type").distinct().persist()
      val nInc = inc.count()
      probeBipartite("1x", inc, nInc)
      val omni = inc.select("user_id").distinct()
        .select(col("user_id"), lit("zz_omni").as("event_type"))
      probeBipartite("omnipresent extra type", inc.unionAll(omni), nInc * 2)
      inc.unpersist()
    }

    spark.stop()
  }

  private def emit(probe: String, scale: String, n: Long, sec: Double, rows: Long): Unit =
    println(f"""{"probe":"$probe","scale":"$scale","input":$n,"seconds":$sec%.2f,"rows":$rows}""")

  /** q302 probe: the STREAMING maintenance path — the same ~40-doc delta
    * split into 3 key-ranged micro-batches applied by foreachBatch
    * against the standing text index, corpus and buckets scaled 1× →
    * mult×. Each batch's rewrite is delta-sized (touched buckets only),
    * so total stream seconds must stay ~flat in the corpus. Object-level
    * so a scratch runner can probe it without the full sweep.
    */
  private[graft] def probeTextIndexStream(spark: SparkSession, scale: String,
      docs: DataFrame, n: Long, nBuckets: Int): Unit = {
    val dir = java.nio.file.Files
      .createTempDirectory("probe_txtidx_stream").toString
    ops.TextIndex.buildPhraseIndex(docs, "doc_id", "text", dir, nBuckets)
    val delta = docs.limit(20)
      .select(lit("u").as("op"), (col("doc_id") + 800000000L).as("doc_id"),
        concat(col("text"), lit(" fast table value")).as("text"))
      .unionByName(docs.limit(60).filter(col("doc_id") % 3 === 1)
        .select(lit("d").as("op"), col("doc_id"),
          lit(null).cast("string").as("text")))
      .localCheckpoint(true)
    val staged = java.nio.file.Files.createTempDirectory("probe_302_src")
    (0 until 3).foreach(i => delta
      .filter(pmod(col("doc_id"), lit(3)) === i)
      .coalesce(1).write.mode("append").parquet(staged.toString))
    val schema = spark.read.parquet(staged.toString).schema
    val ckpt = java.nio.file.Files.createTempDirectory("probe_302_ckpt")
    val (batches, t) = time {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(staged.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          val ups = batch.filter(col("op") === "u")
            .select("doc_id", "text").localCheckpoint(true)
          val dels = batch.filter(col("op") === "d")
            .select("doc_id").localCheckpoint(true)
          ops.TextIndex.updatePhraseIndex(spark, dir, ups, dels,
            "doc_id", "text")
          ()
        }
        .option("checkpointLocation", ckpt.toString).start()
      try { q.processAllAvailable() } finally { q.stop() }
      q.recentProgress.count(_.numInputRows > 0).toLong
    }
    emit("q302_stream_index_cdc", scale, n, t, batches)
  }

  /** q307 probe: multi-level Louvain with the celebrity star. Level
    * entry is one node-level contraction; every merge/contract round
    * after runs on the community graph, whose pair frame is bounded by
    * ADJACENT community pairs — the degree-`inject` hub must cost its
    * edge count in the entry contraction and then live as ONE community
    * row, never a quadratic pair blow-up. rows = final communities.
    */
  private[graft] def probeLouvain(spark: SparkSession, scale: String,
      es: DataFrame): Unit = {
    val canon = ops.Graph.canonicalEdges(es, "source", "target")
      .withColumn("w", lit(1L))
    val lbl = ops.Graph.labelPropagation(canon, rounds = 4)
      .localCheckpoint(true)
    val (perLevel, t) = time {
      val r = ops.Graph.louvain(canon, lbl, levels = 3)
      r._2.last.count() // every level is already eagerly checkpointed
      r._2
    }
    val finalComm = perLevel.last.select(col("a").as("v"))
      .unionByName(perLevel.last.select(col("b").as("v")))
      .distinct().count()
    emit("q307_louvain_multilevel", scale, canon.count(), t, finalComm)
  }
}
