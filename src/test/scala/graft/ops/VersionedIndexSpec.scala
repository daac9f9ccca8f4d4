package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The crash-atomicity contract of the versioned index commit
  * ([[VersionedIndex]]): a maintenance commit killed at ANY point
  * before its pointer flip leaves the SERVED index byte-identical to
  * the pre-update state (pointer, manifest, physical partition files
  * and mtimes, query results); a concurrent search during an update
  * never observes a blend of old and new artifacts; the next committer
  * sweeps the crash debris and lands cleanly; and compaction preserves
  * content while collapsing files and leaving single-file partitions'
  * generations untouched.
  */
class VersionedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def textCorpus() = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg",
    "hh").zipWithIndex.map { case (t, i) => (i.toLong, s"$t $t") }
    .toDF("doc_id", "text")

  private def phraseHits(dir: String): Seq[(String, Long, Long)] =
    TextIndex.phraseSearch(spark, dir, Seq("aa aa", "bb bb")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  private def bm25(dir: String): Seq[(Long, Long)] =
    TextIndex.bm25TopKFromIndex(spark, dir, Seq("aa", "bb"), 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** Every live physical partition file of both artifacts with its
    * mtime — the byte-identity witness. */
  private def fileState(dir: String): Map[String, Long] =
    Seq("postings", "doclen").flatMap { a =>
      TextIndex.partitionPaths(spark, dir, a).toSeq.flatMap {
        case (pd, path) =>
          new java.io.File(path).listFiles()
            .filter(_.getName.endsWith(".parquet"))
            .map(f => s"$a/$pd/${f.getName}" -> f.lastModified())
      }
    }.toMap

  private def smallFiles(dir: String): Map[String, String] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(_.isFile)
      .map(f => f.getName -> new String(
        java.nio.file.Files.readAllBytes(f.toPath))).toMap
  }

  test("a commit killed before the manifest write or before the pointer " +
    "flip leaves the served text index byte-identical; the next committer " +
    "sweeps the debris and lands; a search inside the window sees no blend") {
    val dir = java.nio.file.Files.createTempDirectory("vidx_crash").toString
    TextIndex.buildPhraseIndex(textCorpus(), "doc_id", "text", dir,
      nBuckets = 8)
    val hits0 = phraseHits(dir)
    val bm0 = bm25(dir)
    val files0 = fileState(dir)
    val meta0 = smallFiles(dir)
    assert(hits0.nonEmpty && bm0.nonEmpty)
    val added = Seq((0L, "aa aa aa aa"), (100L, "aa aa aa"))
      .toDF("doc_id", "text")
    val removed = Seq(Tuple1(1L)).toDF("doc_id")
    val oldStale = VersionedIndex.claimStaleMs
    try {
      // crash at each site in turn; every kill must leave the SERVED
      // index untouched (sweeping the prior crash's claim on the way in)
      VersionedIndex.claimStaleMs = 0L
      for (site <- Seq("pre-manifest", "pre-pointer")) {
        VersionedIndex.crashHook = s =>
          if (s == site) throw new RuntimeException(s"crash at $s")
        val e = intercept[RuntimeException] {
          TextIndex.updatePhraseIndex(spark, dir, added, removed,
            "doc_id", "text")
        }
        assert(e.getMessage.contains(site))
        VersionedIndex.crashHook = _ => ()
        assert(phraseHits(dir) == hits0, s"served results drifted after $site kill")
        assert(bm25(dir) == bm0, s"served BM25 drifted after $site kill")
        assert(fileState(dir) == files0,
          s"live partition files/mtimes drifted after $site kill")
        assert(smallFiles(dir).get("current") == meta0.get("current") &&
          smallFiles(dir).get("manifest.v1") == meta0.get("manifest.v1"),
          s"pointer or committed manifest drifted after $site kill")
      }
      // a search fired INSIDE the commit window (after the new manifest
      // is on disk, before the pointer flip) must serve the OLD version
      var inWindow: Seq[(String, Long, Long)] = Seq.empty
      VersionedIndex.crashHook = s =>
        if (s == "pre-pointer") inWindow = phraseHits(dir)
      TextIndex.updatePhraseIndex(spark, dir, added, removed,
        "doc_id", "text") // sweeps the previous kill's claim, then lands
      VersionedIndex.crashHook = _ => ()
      assert(inWindow == hits0,
        "a concurrent search during the commit window must see the old index")
      // the landed commit serves the post-delta state, equal to a
      // from-scratch rebuild on the post-delta corpus
      val rebuilt = java.nio.file.Files
        .createTempDirectory("vidx_rebuild").toString
      val postCorpus = textCorpus().filter($"doc_id" =!= 1L && $"doc_id" =!= 0L)
        .unionByName(added)
      TextIndex.buildPhraseIndex(postCorpus, "doc_id", "text", rebuilt,
        nBuckets = 8)
      assert(phraseHits(dir) == phraseHits(rebuilt),
        "landed CDC commit must equal the from-scratch rebuild")
      assert(bm25(dir) == bm25(rebuilt),
        "index-served BM25 must equal the rebuild (corpus stats included)")
      // no claim/tombstone debris once landed
      val debris = new java.io.File(dir).listFiles().map(_.getName)
        .filter(n => n.contains(".claim"))
      assert(debris.isEmpty, s"claim debris: ${debris.toSeq}")
    } finally {
      VersionedIndex.crashHook = _ => ()
      VersionedIndex.claimStaleMs = oldStale
    }
  }

  test("corpus stats (n_docs, sum_dl) are maintained incrementally and " +
    "transactionally: every CDC commit re-derives the rebuild's totals") {
    val dir = java.nio.file.Files.createTempDirectory("vidx_stats").toString
    TextIndex.buildPhraseIndex(textCorpus(), "doc_id", "text", dir,
      nBuckets = 8)
    def stats(d: String): (Long, Long) = {
      val (_, m) = VersionedIndex.readManifest(spark, d)
      (m.stats("n_docs"), m.stats("sum_dl"))
    }
    assert(stats(dir) == (8L, 16L))
    // delta 1: remove doc 1 (dl 2), upsert doc 0 (2 -> 4), add 100 (3)
    TextIndex.updatePhraseIndex(spark, dir,
      Seq((0L, "aa aa aa aa"), (100L, "aa aa aa")).toDF("doc_id", "text"),
      Seq(Tuple1(1L)).toDF("doc_id"), "doc_id", "text")
    assert(stats(dir) == (8L, 19L)) // 8-1-1+2 docs; 16-2-2+4+3 tokens
    // delta 2: remove an id that is NOT in the index (no double-count),
    // re-add an existing doc verbatim (idempotent totals)
    TextIndex.updatePhraseIndex(spark, dir,
      Seq((100L, "aa aa aa")).toDF("doc_id", "text"),
      Seq(Tuple1(999L)).toDF("doc_id"), "doc_id", "text")
    assert(stats(dir) == (8L, 19L))
  }

  test("compaction collapses multi-file partitions to one file in a " +
    "crash-safe commit, preserves content exactly, and leaves " +
    "single-file partitions' generations (and mtimes) untouched") {
    val dir = java.nio.file.Files.createTempDirectory("vidx_compact").toString
    // 4-way parallel build -> up to 4 files per bucket partition
    TextIndex.buildPhraseIndex(textCorpus().repartition(4), "doc_id",
      "text", dir, nBuckets = 8)
    def fileCounts(): Map[String, Int] =
      TextIndex.partitionPaths(spark, dir, "postings").map {
        case (pd, path) => pd -> new java.io.File(path).listFiles()
          .count(_.getName.endsWith(".parquet"))
      }
    val before = fileCounts()
    assert(before.values.exists(_ > 1),
      s"fixture must fragment at least one partition: $before")
    val content0 = TextIndex.readPostings(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val hits0 = phraseHits(dir)
    val singles = fileState(dir).filter { case (k, _) =>
      k.startsWith("postings/") &&
        before.getOrElse(k.split("/")(1), 0) == 1 }
    val n = TextIndex.compact(spark, dir)
    assert(n >= before.values.count(_ > 1),
      s"compacted $n, expected at least the ${before.values.count(_ > 1)} " +
        "fragmented postings partitions")
    val after = fileCounts()
    assert(after.values.forall(_ == 1), s"compaction left fragments: $after")
    assert(TextIndex.readPostings(spark, dir)
      .collect().map(_.toString).sorted.toSeq == content0,
      "compaction changed content")
    assert(phraseHits(dir) == hits0, "compaction changed served results")
    // single-file partitions were not rewritten: same paths, same mtimes
    val afterFiles = fileState(dir)
    singles.foreach { case (k, mt) =>
      assert(afterFiles.get(k).contains(mt),
        s"compaction rewrote a single-file partition: $k")
    }
    // idempotent: a second compact is a no-op (no new commit)
    val (v1, _) = VersionedIndex.readManifest(spark, dir)
    assert(TextIndex.compact(spark, dir) == 0)
    val (v2, _) = VersionedIndex.readManifest(spark, dir)
    assert(v1 == v2, "no-op compaction must not commit")
  }

  test("keepLast retention: five commits at keepLast=4 keep a four-" +
    "version reader window (an old manifest still resolves every path, " +
    "its artifact content is readable) and GC sweeps below the window") {
    val dir = java.nio.file.Files.createTempDirectory("vidx_keep").toString
    TextIndex.buildPhraseIndex(textCorpus(), "doc_id", "text", dir,
      nBuckets = 8) // v1
    val (_, m1) = VersionedIndex.readManifest(spark, dir)
    def upd(v: Int): Unit = TextIndex.updatePhraseIndex(spark, dir,
      Seq((0L, ("aa " * v).trim)).toDF("doc_id", "text"),
      Seq.empty[Tuple1[Long]].toDF("doc_id"), "doc_id", "text",
      keepLast = 4)
    upd(2) // v2
    val m2 = VersionedIndex.readManifestAt(spark, dir, 2L).get
    // the v2-era content, to re-read through the old manifest later
    val at2 = VersionedIndex.readArtifact(spark, dir, m2, "postings",
      None, null).collect().map(_.toString).sorted.toSeq
    // g1 partition dirs superseded by v2 — unreachable once v1 leaves
    // the window
    val superseded = m1.parts("postings").filter { case (pd, _) =>
      m2.parts("postings").get(pd).exists(_ != m1.parts("postings")(pd))
    }.map { case (pd, g) => s"$dir/$g/postings/$pd" }.toSeq
    assert(superseded.nonEmpty, "fixture must supersede some partition")
    upd(3); upd(4); upd(5) // v3, v4, v5
    // window: v2..v5 kept, v1 swept
    assert(VersionedIndex.readManifestAt(spark, dir, 1L).isEmpty,
      "manifest v1 must leave the 4-version window")
    assert(superseded.forall(p => !new java.io.File(p).exists()),
      s"partition dirs reachable only from v1 must be swept: $superseded")
    (2L to 5L).foreach { v =>
      val m = VersionedIndex.readManifestAt(spark, dir, v)
        .getOrElse(fail(s"manifest v$v must stay inside the window"))
      Seq("postings", "doclen").foreach { a =>
        VersionedIndex.partitionPaths(dir, m, a).values.foreach { p =>
          assert(new java.io.File(p).exists(),
            s"v$v reader lost $p — retention window broken")
        }
      }
    }
    // the long-running reader's actual read: v2's postings via its own
    // manifest, byte-equal to what v2 served when it was current
    assert(VersionedIndex.readArtifact(spark, dir, m2, "postings",
      None, null).collect().map(_.toString).sorted.toSeq == at2,
      "an in-window manifest must re-read its own generation's content")
  }

  test("auto-compaction policy: ten CDC batches with autoCompact keep " +
    "every partition's file count bounded, never-touched partitions " +
    "keep their mtimes, and served content equals the uncompacted twin") {
    val dirA = java.nio.file.Files.createTempDirectory("vidx_ac_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("vidx_ac_b").toString
    // 4-way parallel build fragments partitions from the start
    Seq(dirA, dirB).foreach(d => TextIndex.buildPhraseIndex(
      textCorpus().repartition(4), "doc_id", "text", d, nBuckets = 8))
    def counts(d: String): Map[String, Int] =
      TextIndex.partitionPaths(spark, d, "postings").map {
        case (pd, path) => pd -> new java.io.File(path).listFiles()
          .count(_.getName.endsWith(".parquet"))
      }
    // partitions the batches never touch: their files must never move
    val untouchedBefore = fileState(dirA).filter(_._1.contains("=")) //
    (1 to 10).foreach { i =>
      // each batch ADDS a doc sharing the hot term, so the hot bucket
      // accumulates rows across task boundaries — one more file per
      // commit, the fragmentation the policy exists for
      val delta = Seq((100L + i, "aa aa"))
        .toDF("doc_id", "text").repartition(3)
      TextIndex.updatePhraseIndex(spark, dirA, delta,
        Seq.empty[Tuple1[Long]].toDF("doc_id"), "doc_id", "text",
        autoCompact = Some(3))
      TextIndex.updatePhraseIndex(spark, dirB, delta,
        Seq.empty[Tuple1[Long]].toDF("doc_id"), "doc_id", "text")
      assert(counts(dirA).values.forall(_ <= 3),
        s"batch $i left an over-threshold partition: ${counts(dirA)}")
    }
    // the policy actually fired: the knob-less twin fragments past the
    // threshold somewhere
    assert(counts(dirB).values.exists(_ > 3),
      s"twin never fragmented — the assertion above proves nothing: " +
        s"${counts(dirB)}")
    // served content identical to the uncompacted twin
    assert(TextIndex.readPostings(spark, dirA)
      .collect().map(_.toString).sorted.toSeq ==
      TextIndex.readPostings(spark, dirB)
        .collect().map(_.toString).sorted.toSeq,
      "auto-compaction changed postings content")
    assert(phraseHits(dirA) == phraseHits(dirB),
      "auto-compaction changed served results")
    // a partition no batch ever touched keeps its original files+mtimes
    val afterA = fileState(dirA)
    val stillThere = untouchedBefore.filter { case (k, mt) =>
      afterA.get(k).contains(mt) }
    assert(stillThere.nonEmpty,
      "fixture degenerated: every partition was touched or rewritten")
  }

  test("IVF-PQ maintenance through the same protocol: a killed update " +
    "serves the old index; compaction preserves ANN results") {
    def jig(i: Int): Float = (i / 3 % 5) * 0.02f
    val vecs = (0 until 30).map { i =>
      val base = Array.fill(8)(0.0f); base(i % 3) = 1.0f
      (i.toLong, base.map(_ + jig(i)))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("vidx_ivf").toString
    val coarse = Similarity.ivfCentroids(vecs, "vec_id", "embedding",
      k = 3, iters = 4)
    Similarity.buildIvfPqIndex(vecs.repartition(4), "vec_id", "embedding",
      coarse, dir, dim = 8, m = 4, kCent = 4, iters = 2)
    val q = vecs.filter($"vec_id" === 0L || $"vec_id" === 25L)
    def search(): Set[(Long, Long, Int)] =
      Similarity.searchIvfPq(spark, dir, vecs, q, "vec_id", "embedding",
        k = 3, dim = 8, nprobe = 1, shortlist = 10, m = 4, kCent = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got0 = search()
    val c0 = Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val added = Seq((3L, c0.map(_ + 0.01f)), (100L, c0))
      .toDF("vec_id", "embedding")
    val removed = Seq(Tuple1(0L)).toDF("vec_id")
    val oldStale = VersionedIndex.claimStaleMs
    try {
      VersionedIndex.claimStaleMs = 0L
      VersionedIndex.crashHook = s =>
        if (s == "pre-pointer") throw new RuntimeException("boom")
      intercept[RuntimeException] {
        Similarity.updateIvfPqIndex(spark, dir, added, removed,
          "vec_id", "embedding", dim = 8, m = 4)
      }
      VersionedIndex.crashHook = _ => ()
      assert(search() == got0, "killed IVF update changed served results")
      // recovery sweeps and lands
      Similarity.updateIvfPqIndex(spark, dir, added, removed,
        "vec_id", "embedding", dim = 8, m = 4)
      val ids = Similarity.readLists(spark, dir).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(!ids.contains(0L) && ids.contains(100L) && ids.size == 30)
      // compaction: same rows, same search results, fewer files
      val content = Similarity.readLists(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      Similarity.compactIndex(spark, dir)
      assert(Similarity.readLists(spark, dir)
        .collect().map(_.toString).sorted.toSeq == content)
      val counts = Similarity.listPartitionPaths(spark, dir).map {
        case (_, path) => new java.io.File(path).listFiles()
          .count(_.getName.endsWith(".parquet"))
      }
      assert(counts.forall(_ == 1), s"fragments left: $counts")
    } finally {
      VersionedIndex.crashHook = _ => ()
      VersionedIndex.claimStaleMs = oldStale
    }
  }
}
