package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted positional inverted TEXT index with incremental (CDC)
  * maintenance — the text twin of the vector-index lifecycle in
  * [[Similarity]] (`buildIvfPqIndex` → `updateIvfPqIndex` →
  * `searchIvfPq`). q275 builds its posting list per query; at 100 TB the
  * posting list must be a standing artifact: built once, maintained by
  * delta batches that rewrite ONLY the term-bucket partitions the delta
  * touches, and served to every phrase query after it.
  *
  * Artifacts (committed together through [[VersionedIndex]] — one
  * pointer covers all of them, so a crash mid-maintenance can never
  * strand a postings/doclen/stats blend, and a concurrent reader sees
  * old-or-new, never a mix):
  *  - `postings`: one row per token occurrence (`term`, `doc_id`, `pos`
  *    1-based), partitioned by `bucket = pmod(hash(term), nBuckets)` — a
  *    phrase query touches only its terms' buckets (static pruning on
  *    the literal bucket set), and a CDC batch rewrites only the buckets
  *    holding the delta's terms;
  *  - `doclen`: per-doc token count (the BM25 normalizer), partitioned
  *    by `dbucket = pmod(hash(doc_id), nDocBuckets)`;
  *  - manifest stats: `n_buckets`/`n_doc_buckets` (the frozen routing),
  *    plus the BM25 corpus totals `n_docs`/`sum_dl`, maintained
  *    INCREMENTALLY by each CDC commit — the serve path reads them as
  *    two literals instead of paying two O(n_docs) sidecar passes per
  *    query.
  *
  * The bucket routing hash is Spark's murmur3 (`hash()`), evaluated
  * inside the plan on both the write and read paths — never recomputed
  * driver-side — so the routing is consistent by construction.
  */
object TextIndex {

  private val postingsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("pos", LongType),
    StructField("term", StringType), StructField("bucket", IntegerType)))

  private val doclenSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("dl", LongType),
    StructField("dbucket", IntegerType)))

  /** Tokenize `docs` into positional postings with their bucket route.
    * Tokenization is EXACTLY q275's (split on single space, 1-based
    * positions, empty tokens kept) so the standing index answers the
    * same queries as the per-query build.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast(LongType).as("pos"),
        col("col").as("term"))
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))

  /** Per-doc token length (the BM25 normalizer) with its doc-hash bucket
    * route. dl counts the SAME tokens [[postings]] emits
    * (split-on-space, empties kept), so dl ≡ the doc's posting count by
    * construction.
    */
  def docLengths(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame =
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        size(split(col(textCol), " ")).cast(LongType).as("dl"))
      .withColumn("dbucket", pmod(hash(col("doc_id")), lit(nBuckets)))

  /** Builds and commits the index under `dir` (one versioned commit:
    * postings + doclen + stats). Build cost is paid here, once; every
    * searcher and maintainer after it reads the committed artifact.
    *
    * `nDocBuckets` sizes the doclen sidecar's partitions INDEPENDENTLY
    * of the postings': doclen is doc-count-sized (~30× smaller than the
    * posting mass for natural text), so giving it the postings' bucket
    * count shatters it into tiny files whose listing overhead dominates
    * every read (probe-measured: a 640-way doclen cost the serve path
    * ~10× its data). Default: nBuckets/8, floor 8 — bucket count tracks
    * the artifact's own bytes, the same sizing rule as shuffle
    * partitions.
    */
  def buildPhraseIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String, nBuckets: Int = 16, nDocBuckets: Int = -1): Unit = {
    val s = docs.sparkSession
    val ndb = if (nDocBuckets > 0) nDocBuckets else math.max(8, nBuckets / 8)
    val c = VersionedIndex.begin(s, dir)
    try {
      postings(docs, idCol, textCol, nBuckets)
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"${c.gen}/postings")
      docLengths(docs, idCol, textCol, ndb)
        .write.mode("overwrite").partitionBy("dbucket")
        .parquet(s"${c.gen}/doclen")
      // corpus stats come from the just-written sidecar (one
      // doc-count-sized scan at BUILD time buys literal stats at every
      // serve), committed atomically with the data they describe
      val st = s.read.parquet(s"${c.gen}/doclen")
        .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
      val parts = Map(
        "postings" -> VersionedIndex
          .writtenPartDirs(s, s"${c.gen}/postings")
          .map(_ -> c.genLabel).toMap,
        "doclen" -> VersionedIndex.writtenPartDirs(s, s"${c.gen}/doclen")
          .map(_ -> c.genLabel).toMap)
      c.finish(VersionedIndex.Manifest(parts, Map(
        "n_buckets" -> nBuckets.toLong, "n_doc_buckets" -> ndb.toLong,
        "n_docs" -> st.getLong(0), "sum_dl" -> st.getLong(1))))
    } catch { case e: Throwable => c.abort(); throw e }
  }

  /** The committed postings artifact, read through the manifest — the
    * full-scan view (tests, probes, rebuild comparisons). Searches use
    * the bucket-pruned path instead.
    */
  def readPostings(spark: SparkSession, dir: String): DataFrame = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    VersionedIndex.readArtifact(spark, dir, m, "postings", None,
      postingsSchema)
      .withColumn("bucket", col("bucket").cast(IntegerType))
  }

  /** The committed doclen sidecar, read through the manifest. */
  def readDocLengths(spark: SparkSession, dir: String): DataFrame = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    VersionedIndex.readArtifact(spark, dir, m, "doclen", None, doclenSchema)
      .withColumn("dbucket", col("dbucket").cast(IntegerType))
  }

  /** Physical location of every live partition of `artifact`
    * (`postings` | `doclen`) — the test/maintenance view of the
    * manifest (mtime pins, compaction assertions).
    */
  def partitionPaths(spark: SparkSession, dir: String,
      artifact: String): Map[String, String] = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    VersionedIndex.partitionPaths(dir, m, artifact)
  }

  /** Incremental maintenance under a doc insert+delete CDC batch —
    * q133's protocol on the text side: UPSERT `addedDocs` (re-tokenized
    * with the index's frozen bucket routing) and delete `removedIds`,
    * rewriting ONLY the touched term-bucket partitions — each into this
    * commit's own generation directory, published by the single pointer
    * flip (crash-atomic across postings, doclen AND the corpus stats; a
    * killed update leaves the served index byte-identical). Untouched
    * buckets are never written — their files keep their mtimes (pinned
    * in OpsSpec); a bucket emptied by the delta simply drops out of the
    * manifest. The discovery of which buckets hold a removed doc's
    * postings is a column-pruned (doc_id, bucket) scan, never a rewrite.
    *
    * Upsert semantics: standing postings of ids in `addedDocs` are
    * replaced (anti-join on removed ∪ added ids before the union), an
    * added id also present in `removedIds` survives as its new version,
    * and re-applying the same delta is idempotent — identical partitions
    * are rewritten to identical content, and the incrementally-maintained
    * corpus stats re-derive the same totals.
    *
    * Per-batch cost tracks the delta: the new postings are delta-sized,
    * the rewrite reads and writes only buckets the delta's terms or the
    * removed docs' postings land in, and the stats correction reads only
    * the touched doclen buckets. The broadcast of the delta id set is
    * batch-sized, never corpus-sized.
    */
  def updatePhraseIndex(spark: SparkSession, dir: String,
      addedDocs: DataFrame, removedIds: DataFrame, idCol: String,
      textCol: String, keepLast: Int = 2,
      autoCompact: Option[Int] = None): Unit = {
    val c = VersionedIndex.begin(spark, dir, keepLast)
    try {
      val m = c.baseManifest
      require(m.parts.nonEmpty, s"$dir holds no built index to update")
      val nBuckets = m.stats("n_buckets").toInt
      val nDocBuckets = m.stats("n_doc_buckets").toInt
      val newPosts = postings(addedDocs, idCol, textCol, nBuckets)
        .localCheckpoint(true) // tokenize the delta once, use it twice
      val rmIds = removedIds.select(col(idCol).cast(LongType).as("doc_id"))
        .union(addedDocs.select(col(idCol).cast(LongType).as("doc_id")))
        .distinct().localCheckpoint(true)
      // NOT checkpointed: a narrow per-doc projection of the delta with
      // two consumers — recomputing it twice inside the jobs that need it
      // is cheaper than a dedicated materialization action per commit
      // (guide §1.2: a CDC batch pays per-action fixed cost)
      val newLens = docLengths(addedDocs, idCol, textCol, nDocBuckets)
      // ONE job discovers the touched buckets on BOTH partition axes AND
      // computes the signed corpus-stat correction (rows leaving the
      // index carry sgn −1, rows entering +1) — previously the stats were
      // their own action (~0.25 s of pure per-commit overhead), and the
      // two-collect form before that cost ~0.35 s more. The doclen legs
      // scan the doc-count-sized sidecar column-pruned — far cheaper than
      // the postings semi-join this job already pays. The collect stays
      // bounded by n_buckets + n_doc_buckets.
      val standingAll = VersionedIndex.readArtifact(spark, dir, m,
        "postings", None, postingsSchema)
      val standingLenAll = VersionedIndex.readArtifact(spark, dir, m,
        "doclen", None, doclenSchema)
      val zero = Seq(lit(0L).as("sgn"), lit(0L).as("dl"))
      val disc = standingAll
        .join(broadcast(rmIds), Seq("doc_id"), "left_semi")
        .select(lit("t").as("ax") +: col("bucket").cast(IntegerType).as("b")
          +: zero: _*)
        .union(newPosts.select(lit("t").as("ax") +: col("bucket").as("b")
          +: zero: _*))
        .union(rmIds.select(lit("d").as("ax") +:
          pmod(hash(col("doc_id")), lit(nDocBuckets)).as("b") +: zero: _*))
        .union(newLens.select(lit("d").as("ax"), col("dbucket").as("b"),
          lit(1L).as("sgn"), col("dl")))
        .union(standingLenAll
          .join(broadcast(rmIds), Seq("doc_id"), "left_semi")
          .select(lit("d").as("ax"), col("dbucket").cast(IntegerType).as("b"),
            lit(-1L).as("sgn"), col("dl")))
        .groupBy("ax", "b")
        .agg(sum("sgn").as("sgn"), sum(col("sgn") * col("dl")).as("sdl"))
        .collect()
      val nDocsDelta = disc.map(_.getLong(2)).sum
      val sumDlDelta = disc.map(r => if (r.isNullAt(3)) 0L else r.getLong(3)).sum
      val touched = disc.filter(_.getString(0) == "t")
        .map(_.getInt(1)).toSeq
      val touchedDirs = touched.map(b => s"bucket=$b").toSet
      // rewrite = (standing rows of touched buckets) − (delta ids) +
      // (new postings); reads only the touched partitions' paths, writes
      // only into this commit's generation — the standing files are
      // never overwritten, so no checkpoint-before-write is needed
      val rewritten = VersionedIndex.readArtifact(spark, dir, m,
        "postings", Some(touchedDirs), postingsSchema)
        .withColumn("bucket", col("bucket").cast(IntegerType))
        .join(broadcast(rmIds), Seq("doc_id"), "left_anti")
        .unionByName(newPosts)
      rewritten.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"${c.gen}/postings")
      val postParts = (m.parts("postings") -- touchedDirs) ++
        VersionedIndex.writtenPartDirs(spark, s"${c.gen}/postings")
          .map(_ -> c.genLabel)
      // doclen sidecar: same protocol on the doc-hash bucket axis; the
      // delta ids' buckets are the only partitions read or written
      val touchedD = disc.filter(_.getString(0) == "d")
        .map(_.getInt(1)).toSeq
      val touchedDDirs = touchedD.map(b => s"dbucket=$b").toSet
      val standingLenT = VersionedIndex.readArtifact(spark, dir, m,
        "doclen", Some(touchedDDirs), doclenSchema)
        .withColumn("dbucket", col("dbucket").cast(IntegerType))
      val rewrittenLen = standingLenT
        .join(broadcast(rmIds), Seq("doc_id"), "left_anti")
        .unionByName(newLens)
      rewrittenLen.write.mode("overwrite").partitionBy("dbucket")
        .parquet(s"${c.gen}/doclen")
      val lenParts = (m.parts("doclen") -- touchedDDirs) ++
        VersionedIndex.writtenPartDirs(spark, s"${c.gen}/doclen")
          .map(_ -> c.genLabel)
      newPosts.unpersist(blocking = false)
      rmIds.unpersist(blocking = false)
      c.finish(VersionedIndex.Manifest(
        Map("postings" -> postParts, "doclen" -> lenParts),
        m.stats ++ Map(
          "n_docs" -> (m.stats("n_docs") + nDocsDelta),
          "sum_dl" -> (m.stats("sum_dl") + sumDlDelta))))
    } catch { case e: Throwable => c.abort(); throw e }
    // auto-compaction policy: after the CDC commit published, collapse
    // any partition whose file count exceeded the threshold as a
    // follow-on commit (a no-op commit-free scan when nothing is
    // oversized) — sustained CDC otherwise accretes one file batch per
    // task per commit in hot buckets until a caller remembers to compact
    autoCompact.foreach(n => compact(spark, dir, n, keepLast))
  }

  /** COMPACTION (see [[VersionedIndex.compactPartitioned]]): collapse
    * partitions of both artifacts holding more than `targetFiles`
    * parquet files to one file each, as one crash-safe commit;
    * conforming partitions keep their existing generation dirs and
    * mtimes. Returns partitions compacted.
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 1,
      keepLast: Int = 2): Int =
    VersionedIndex.compactPartitioned(spark, dir,
      Seq("postings" -> "bucket", "doclen" -> "dbucket"), targetFiles,
      keepLast)

  /** BM25 top-k served FROM the standing index — the ranked-retrieval
    * read path beside [[phraseSearch]]'s boolean one, with q183's
    * exact-rational scoring (k1 = 6/5, b = 3/4 cleared of denominators;
    * idf argument (2N−2df+1)/(2df+1); floor-ppm per term): the postings
    * scan is pruned to the query terms' buckets (the same static
    * partition filter), tf and df come from those postings alone, the
    * corpus stats (N, Σdl) are two LITERALS from the manifest (zero
    * sidecar passes — the CDC commits maintain them), and the
    * per-candidate dl lookup reads ONLY the candidate docs' dbucket
    * partitions (their bucket set is collected bounded by
    * n_doc_buckets, never corpus-sized). Top-k is a
    * TakeOrderedAndProject.
    */
  def bm25TopKFromIndex(spark: SparkSession, dir: String,
      terms: Seq[String], k: Int): DataFrame = {
    import spark.implicits._
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    val nBuckets = m.stats("n_buckets").toInt
    val nDocBuckets = m.stats("n_doc_buckets").toInt
    val nDocs = m.stats("n_docs")
    val aTokens = m.stats("sum_dl")
    // dedupe defensively: a repeated query term would join each posting
    // once per copy and double-count its per-term score in the sum
    val tt = terms.distinct.toDF("term")
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
    val buckets = tt.select("bucket").distinct().collect()
      .map(_.getInt(0)).toSeq
    val posts = VersionedIndex.readArtifact(spark, dir, m, "postings",
      Some(buckets.map(b => s"bucket=$b").toSet), postingsSchema)
      .filter(col("bucket").isin(buckets: _*))
    val tf = posts.join(broadcast(tt), Seq("bucket", "term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // reused: candidate routing + the score plan
    val dfx = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // candidate dl lookup, pruned: the candidates' dbucket set is
    // bounded by n_doc_buckets (a driver-safe collect at any corpus
    // size), so the sidecar scan reads only buckets holding candidates
    val candBuckets = tf
      .select(pmod(hash(col("doc_id")), lit(nDocBuckets)).as("dbucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val dl = VersionedIndex.readArtifact(spark, dir, m, "doclen",
      Some(candBuckets.map(b => s"dbucket=$b").toSet), doclenSchema)
      .select("doc_id", "dl")
    val scored = tf.join(broadcast(dfx), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("s", expr(
        s"""(CAST(1000000 AS DECIMAL(38,0)) *
           | (2 * ${nDocs}L - 2 * df + 1) * 22 * ${aTokens}L * tf) div
           |((CAST(2 AS DECIMAL(38,0)) * df + 1) *
           | (CAST(10 AS DECIMAL(38,0)) * ${aTokens}L * tf +
           |  3 * ${aTokens}L + CAST(9 AS DECIMAL(38,0)) * dl * ${nDocs}L))"""
          .stripMargin))
      .groupBy("doc_id").agg(sum("s").cast(LongType).as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k)
    scored
  }

  /** Exact phrase search served FROM the standing index — q275's
    * broadcast-join + anchor-agg plan, reading only the buckets of the
    * phrase terms: the tiny phrase-term table is routed with the
    * index's bucket hash, its distinct buckets collected (phrase-sized,
    * never corpus-sized) into a literal partition filter, and a posting
    * matches phrase occurrence `anchor = pos − off` iff all `len`
    * offsets land. Overlapping occurrences count.
    */
  def phraseSearch(spark: SparkSession, dir: String,
      phrases: Seq[String]): DataFrame = {
    import spark.implicits._
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    val nBuckets = m.stats("n_buckets").toInt
    val phraseRows = phrases.flatMap(p =>
      p.split(' ').zipWithIndex.map { case (t, i) =>
        (p, i.toLong, t, p.split(' ').length.toLong) })
    val pt = phraseRows.toDF("phrase", "off", "term", "plen")
      .withColumn("bucket", pmod(hash(col("term")), lit(nBuckets)))
    // phrase-sized collect: the literal bucket set makes the pruning
    // STATIC — unprobed term partitions are skipped at planning time,
    // not discovered at runtime
    val buckets = pt.select("bucket").distinct().collect()
      .map(_.getInt(0)).toSeq
    val posts = VersionedIndex.readArtifact(spark, dir, m, "postings",
      Some(buckets.map(b => s"bucket=$b").toSet), postingsSchema)
      .filter(col("bucket").isin(buckets: _*))
    posts.join(broadcast(pt), Seq("bucket", "term"))
      .groupBy(col("phrase"), col("doc_id"),
        (col("pos") - col("off")).as("anchor"))
      .agg(countDistinct("off").as("nmatch"), max("plen").as("plen"))
      .filter(col("nmatch") === col("plen"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_docs"))
      .orderBy("phrase")
  }
}
