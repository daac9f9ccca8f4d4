package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  test("chat stream builds the graph incrementally across file arrivals") {
    val in = Files.createTempDirectory("graft_stream_in").toString
    val log = Files.createTempDirectory("graft_stream_log").resolve("edges").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    val q = ChatStream.incrementalGraph(spark, in, log, ckpt)
    try {
      Files.writeString(java.nio.file.Path.of(in, "a.txt"),
        "[7.10.2023, 10:00:00] Ann: hi\n[7.10.2023, 10:01:00] Ben: yo\n")
      q.processAllAvailable()
      Files.writeString(java.nio.file.Path.of(in, "b.txt"),
        "[8.10.2023, 10:00:00] Ben: more\n[8.10.2023, 10:01:00] Ann: yes\n[8.10.2023, 10:02:00] Ben: ok\n")
      q.processAllAvailable()
    } finally q.stop()

    val links = ChatStream.currentLinks(spark, log)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // batch 1: Ann→Ben (1); batch 2: Ben→Ann→Ben (2) — merged weight 3
    assert(links == Seq(("Ann", "Ben", 3L)))
  }

  test("stateful sessionization carries state across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[EventStream.Evt]
    val out = EventStream.sessionCounts(ms.toDS(), gapSec = 100)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      ms.addData(EventStream.Evt(1L, 1000), EventStream.Evt(1L, 1050))
      q.processAllAvailable()
      // gap > 100s → second session; state survived the batch boundary
      ms.addData(EventStream.Evt(1L, 2000), EventStream.Evt(2L, 5))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("sessions").groupBy("user_id")
      .agg(max("n_sessions").as("n"), max("n_events").as("ne")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(last == Map(1L -> ((2L, 3L)), 2L -> ((1L, 1L))))
  }

  test("streaming dedup: first occurrence per key wins across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val df = ms.toDS().toDF("k", "ts")
    val q = EventStream.dedupeStream(df, "k", "ts")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      ms.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      q.processAllAvailable()
      ms.addData(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), // exact dup
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00")), // same KEY, new ts
        (2L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00")))
      q.processAllAvailable()
    } finally q.stop()
    // key-dedup (like ops.Dedup.exact), not row-dedup: the same key at a
    // later timestamp is still a duplicate
    assert(spark.table("dedup").count() == 2)
  }

  test("streaming incremental dedup: batches probe the static corpus index") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different corpus content about distributed query engines")
    ).toDF("doc_id", "text")
    // the restart story: the index is computed once, PERSISTED, and each
    // (re)started stream reads it back rather than recomputing the corpus
    val indexDir = Files.createTempDirectory("graft_lsh_index").resolve("idx").toString
    CorpusStream.corpusBuckets(corpus, "doc_id", "text")
      .write.parquet(indexDir)
    val index = spark.read.parquet(indexDir)

    val ms = MemoryStream[(Long, String)]
    val newDocs = ms.toDS().toDF("doc_id", "text")
    val q = CorpusStream.flagNearDups(newDocs, index, "doc_id", "text")
      .writeStream.format("memory").queryName("neardups").outputMode("update").start()
    try {
      ms.addData(
        (10L, "the quick brown fox jumps over the lazy dog again and again today"),
        (11L, "fresh new document that matches nothing in the standing corpus at all"))
      q.processAllAvailable()
      // a later batch still sees the same static index
      ms.addData(
        (12L, "completely different corpus content about distributed query engines"))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("neardups").groupBy("id")
      .agg(max("n_hits").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(10L) && hits(10L) > 0L) // dup of corpus doc 1
    assert(hits.contains(12L) && hits(12L) > 0L) // dup of corpus doc 2
    assert(!hits.contains(11L)) // novel doc emits nothing
  }

  test("md5 per-row buckets (q130's stream side) match the batch hs form; " +
    "short docs get null buckets and never collide") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact dup of 1
      (3L, "tiny doc")                // < 3 tokens: no shingles
    ).toDF("doc_id", "text")
    // batch reference: q58's hs CTE shape — min(md5(band || sh)) per band
    // over exploded 3-token window shingles
    val toks = docs.select($"doc_id",
      posexplode(split($"text", " ")).as(Seq("i", "w")))
    val sh = toks
      .withColumn("sh", concat_ws(" ", $"w",
        lead("w", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("i")),
        lead("w", 2).over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("i"))))
      .filter(size(split($"sh", " ")) === 3)
    val batch = sh
      .select($"doc_id", explode(sequence(lit(0), lit(7))).as("band"), $"sh")
      .groupBy("doc_id", "band")
      .agg(min(md5(concat($"band".cast("string"), $"sh"))).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val perRow = Dedup.md5BandBucketsPerRow(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        Option(r.getString(2))).toMap
    assert(perRow((1L, 0)).isDefined && perRow((1L, 0)) == perRow((2L, 0)))
    batch.foreach { case (k, v) => assert(perRow(k).contains(v),
      s"per-row bucket for $k diverges from the batch form") }
    // short doc: all 8 bands null, so a semi-join can never flag it
    assert((0 until 8).forall(b => perRow((3L, b)).isEmpty))
    // the codegen'd batch twin (q130's corpus side) must agree exactly
    // with the per-row stream form: same keys, same buckets, and no rows
    // at all for the shingle-less short doc
    val batchTwin = Dedup.md5BandBuckets(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(batchTwin.keySet == perRow.filter(_._2.isDefined).keySet)
    batchTwin.foreach { case (k, v) => assert(perRow(k).contains(v),
      s"batch twin diverges from per-row at $k") }
    val idx = Dedup.md5BandBucketsPerRow(
      docs.filter($"doc_id" === 1L), "doc_id", "text").select("band", "bucket")
    val ms = MemoryStream[(Long, String)]
    val flagged = Dedup.md5BandBucketsPerRow(
        ms.toDS().toDF("doc_id", "text"), "doc_id", "text")
      .join(idx, Seq("band", "bucket"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    val q = flagged.writeStream.format("memory").queryName("md5dups")
      .outputMode("complete").start()
    try {
      ms.addData((10L, "alpha beta gamma delta"), (11L, "tiny doc"),
        (12L, "unrelated words entirely here"))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("md5dups").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(10L) && hits(10L) == 8L)
    assert(!hits.contains(11L) && !hits.contains(12L))
  }

  test("streaming CDC index ingestion: foreachBatch upserts micro-batches " +
    "into the persisted IVF-PQ index; at-least-once replay is safe") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.ops.Similarity
    def jig(i: Int): Float = (i / 3 % 5) * 0.02f
    val vecs = (0 until 30).map { i =>
      val base = Array.fill(8)(0.0f)
      base(i % 3) = 1.0f
      (i.toLong, base.map(_ + jig(i)))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_cdc").toString
    val coarse = Similarity.ivfCentroids(vecs, "vec_id", "embedding",
      k = 3, iters = 4)
    Similarity.buildIvfPqIndex(vecs, "vec_id", "embedding", coarse, dir,
      dim = 8, m = 4, kCent = 4, iters = 2)
    val none = vecs.filter(lit(false)).select("vec_id")
    val ms = MemoryStream[(Long, Array[Float])]
    // the streaming shape: each micro-batch of newly embedded vectors is
    // routed + coded with the FROZEN codebooks and upserted — the
    // stream-side twin of q133's batch CDC; updateIvfPqIndex's idempotent
    // upsert is exactly what makes foreachBatch's at-least-once contract
    // safe here
    val q = ms.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Similarity.updateIvfPqIndex(spark, dir, batch, none,
          "vec_id", "embedding", dim = 8, m = 4)
      }.start()
    val c0 = Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val c1 = Array(0f, 1.0f, 0f, 0f, 0f, 0f, 0f, 0f)
    try {
      ms.addData((100L, c0), (101L, c1))
      q.processAllAvailable()
      ms.addData((101L, c1), (102L, c0.map(_ + 0.01f))) // 101 replayed
      q.processAllAvailable()
    } finally q.stop()
    val ids = graft.ops.Similarity.readLists(spark, dir).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.size == 33 && Seq(100L, 101L, 102L).forall(ids.contains),
      s"expected 30 base + 3 streamed rows, got ${ids.size}")
    // streamed vectors are searchable through the normal read path
    val got = Similarity.searchIvfPq(spark, dir, vecs, Seq((100L, c0))
        .toDF("vec_id", "embedding"), "vec_id", "embedding",
      k = 3, dim = 8, nprobe = 1, shortlist = 10, m = 4, kCent = 4)
      .collect().map(_.getLong(1)).toSet
    assert(got.nonEmpty && got.forall(id => id % 3 == 0 || id >= 100L),
      s"cluster-0 query must retrieve cluster-0 / streamed ids, got $got")
  }

  test("stream-stream interval join pairs clicks with in-window impressions") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = EventStream.attributeClicks(
      imps.toDS().toDF("imp_user", "imp_ts"),
      clks.toDS().toDF("click_user", "click_ts"),
      windowSec = 3600)
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      imps.addData(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      clks.addData(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00")), // in window
        (2L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00")), // too late
        (3L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"))) // no impression
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attrib").select("imp_user").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("stream-stream join state is watermark-bounded, never cumulative " +
      "(q233's per-batch twin)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val windowSec = 100L
    val delaySec = 10L
    val t0 = 1000000000000L // millis
    def ts(offsetSec: Long) = new java.sql.Timestamp(t0 + offsetSec * 1000L)
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clks = MemoryStream[(Long, java.sql.Timestamp)]
    // every row ever staged, for the survivor bound below
    val impRows = Seq(0L, 20L, 500L, 10000L).map(ts)
    val clkRows = Seq(30L, 40L, 520L, 10000L).map(ts)
    val joined = EventStream.attributeClicks(
      imps.toDS().toDF("imp_user", "imp_ts"),
      clks.toDS().toDF("click_user", "click_ts"),
      windowSec = windowSec, watermarkDelay = s"$delaySec seconds")
    val q = joined.writeStream.format("memory").queryName("statebound")
      .outputMode("append").start()
    try {
      // batch 1: two imps, one matching click, one orphan click
      imps.addData((1L, ts(0)), (2L, ts(20)))
      clks.addData((1L, ts(30)), (3L, ts(40)))
      q.processAllAvailable()
      // batch 2: far enough that batch-1 state becomes evictable
      imps.addData((4L, ts(500)))
      clks.addData((4L, ts(520)))
      q.processAllAvailable()
      // batch 3: sentinels push the watermark past every real expiry
      imps.addData((-1L, ts(10000)))
      clks.addData((-2L, ts(10000)))
      q.processAllAvailable()
    } finally q.stop()
    val progress = q.recentProgress.toSeq.filter(_.stateOperators.nonEmpty)
    assert(progress.nonEmpty, "no stateful progress recorded")
    // Per-batch NON-CUMULATIVE bound: a progress reporting watermark W ran
    // its eviction with W, so its end-of-batch state can only hold rows
    // still inside W's retention window — impressions with
    // imp_ts >= W - window (a later click could still match them), clicks
    // with click_ts >= W (a later impression could still match them) —
    // regardless of how many rows ever streamed through.
    progress.foreach { p =>
      val wmStr = p.eventTime.get("watermark")
      if (wmStr != null && wmStr.nonEmpty) {
        val wm = java.time.Instant.parse(wmStr).toEpochMilli
        if (wm > 0) { // skip the epoch-zero initial watermark
          val survivors =
            impRows.count(_.getTime >= wm - windowSec * 1000L) +
              clkRows.count(_.getTime >= wm)
          val total = p.stateOperators.map(_.numRowsTotal).sum
          assert(total <= survivors,
            s"batch ${p.batchId}: state rows $total exceed the " +
              s"$survivors rows inside watermark $wmStr's retention window")
        }
      }
    }
    val trajectory = progress.map(_.stateOperators.map(_.numRowsTotal).sum)
    // eviction observed (peak strictly above the end state) and the end
    // state is exactly the open-window keys: the two sentinels
    assert(trajectory.max > trajectory.last,
      s"no eviction observed in state trajectory $trajectory")
    assert(trajectory.last == 2L,
      s"final state ${trajectory.last} != the 2 open sentinel rows " +
        s"(trajectory $trajectory)")
    // the join itself still emitted exactly the in-window matches
    val matched = spark.table("statebound").filter(col("imp_user") >= 0L)
      .select("imp_user").collect().map(_.getLong(0)).sorted.toSeq
    assert(matched == Seq(1L, 4L))
  }

  test("daily windowed counts with watermark (streaming form of q22)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val df = ms.toDS().toDF("ts", "event_type")
    val q = EventStream.dailyTypeCounts(df)
      .writeStream.format("memory").queryName("daily").outputMode("update").start()
    try {
      ms.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click"),
        (java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "click"),
        (java.sql.Timestamp.valueOf("2024-01-02 09:00:00"), "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("daily")
      .select(col("day.start").cast("date").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("2024-01-01", "click", 2L), ("2024-01-02", "view", 1L)))
  }
}
