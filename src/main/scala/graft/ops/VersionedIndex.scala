package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Crash-atomic, multi-writer-safe commit protocol for PERSISTED INDEX
  * artifacts (the text index's postings/doclen, the IVF-PQ index's
  * lists/centroids/codebooks) — `ChatStore`'s version-pointer + claim
  * protocol re-shaped for partitioned artifacts whose maintenance is
  * DELTA-SIZED: a commit writes only the partitions it touches, into its
  * own immutable generation directory, and publishes by flipping ONE
  * pointer that covers every artifact of the index together (reference
  * behavior: the POC keeps its derived artifacts consistent by
  * rebuilding them in one process, `POC/backend/main.py`; at 100 TB the
  * rebuild becomes incremental and the consistency guarantee must come
  * from the commit protocol instead).
  *
  * Layout under an index root `dir`:
  *  - `current` — the pointer file (committed version number), flipped
  *    by atomic tmp+rename: the ONLY mutable object in the protocol;
  *  - `manifest.v<N>` — version N's full snapshot: every artifact's
  *    partition → generation mapping plus the index's scalar stats
  *    (bucket counts, BM25 corpus totals, …), written complete and
  *    atomically BEFORE the pointer flips to N;
  *  - `commit.v<N>.claim` — create-exclusive claim for version N
  *    (multi-writer conflict detection, ChatStore's shape);
  *  - `g<N>/<artifact>/<part>=<val>/` — data written by commit N.
  *
  * Data directories are IMMUTABLE once committed: an update rewrites a
  * touched partition into its OWN generation dir and repoints that
  * partition's manifest entry; untouched partitions keep their files
  * (and mtimes) forever; a partition emptied by deletes simply drops
  * out of the manifest — no ghost-partition sweep and no
  * read-after-replace hazard, the two failure modes the previous
  * dynamic-partition-overwrite maintenance had to patch around.
  *
  * Crash safety: the pointer flip IS the commit. A writer killed at any
  * earlier point leaves only orphan debris (a gen dir, a claim, an
  * unpointed manifest) that no reader ever resolves — the served index
  * stays byte-identical to the pre-update state — and that the next
  * committer sweeps via the same single-winner tombstone-rename
  * recovery ChatStore uses (rename the stale claim to a unique
  * tombstone; only the renamer may delete, and only after re-reading
  * the pointer so a crash-after-publish claim never costs committed
  * data). A concurrent reader resolves the pointer once and then reads
  * immutable paths: old-or-new, never a blend. GC after a successful
  * flip keeps a one-version grace window (manifest N−1 and every
  * partition directory it references) for in-flight readers, the same
  * grace ChatStore's versioned tables keep.
  */
object VersionedIndex {

  /** One committed snapshot: `parts(artifact)(partDir) = genName` maps a
    * partition directory name (`bucket=3`; `"-"` for an unpartitioned
    * artifact's whole directory) to the generation that last wrote it;
    * `stats` carries the index's scalar metadata, updated transactionally
    * with the data by the same commit.
    */
  case class Manifest(parts: Map[String, Map[String, String]],
      stats: Map[String, Long])

  /** A claim older than this is a crashed writer's debris (spec knob). */
  private[graft] var claimStaleMs: Long = 15L * 60 * 1000

  /** Crash-injection seam: invoked at named points of [[Commit.finish]]
    * (`pre-manifest`, `pre-pointer`, `post-pointer`). Tests throw here to
    * prove a killed commit leaves the served index untouched, or read
    * here to prove a concurrent reader never sees a blend. No-op in
    * production.
    */
  private[graft] var crashHook: String => Unit = _ => ()

  private def fs(spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hp(p: String) = new org.apache.hadoop.fs.Path(p)

  private def pointerPath(dir: String) = s"$dir/current"
  private def manifestPath(dir: String, v: Long) = s"$dir/manifest.v$v"
  private def claimPath(dir: String, v: Long) = s"$dir/commit.v$v.claim"
  private def genName(v: Long) = s"g$v"

  /** True iff `dir` holds a committed index (pointer present). */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val f = fs(spark, dir)
    f.exists(hp(pointerPath(dir)))
  }

  private def readSmall(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = f.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  /** Atomic small-object publish: unique tmp + rename-with-overwrite —
    * the same primitive ChatStore's pointer uses, so readers observe
    * old-or-new content, never a truncated in-between.
    */
  private def writeAtomic(f: org.apache.hadoop.fs.FileSystem, path: String,
      content: String): Unit = {
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tmp = hp(path + s".tmp.${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    try org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, f.getConf)
      .rename(tmp, hp(path), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        f.delete(hp(path), false)
        if (!f.rename(tmp, hp(path)))
          throw new java.io.IOException(s"commit publish failed: $tmp -> $path")
    }
  }

  private def currentVersion(f: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[Long] =
    readSmall(f, hp(pointerPath(dir)))
      .flatMap(t => scala.util.Try(t.trim.toLong).toOption)

  private def serialize(m: Manifest): String = {
    val sb = new StringBuilder
    m.stats.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(s"S\t$k\t$v\n") }
    m.parts.toSeq.sortBy(_._1).foreach { case (a, ps) =>
      ps.toSeq.sortBy(_._1).foreach { case (pd, g) =>
        sb.append(s"P\t$a\t$pd\t$g\n") } }
    sb.toString
  }

  private def deserialize(text: String): Manifest = {
    val stats = scala.collection.mutable.Map.empty[String, Long]
    val parts = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, String]]
    text.linesIterator.filter(_.nonEmpty).foreach { line =>
      line.split('\t') match {
        case Array("S", k, v) => stats(k) = v.toLong
        case Array("P", a, pd, g) =>
          parts.getOrElseUpdate(a, scala.collection.mutable.Map.empty)(pd) = g
        case other => throw new IllegalStateException(
          s"corrupt manifest line: ${other.mkString("\t")}")
      }
    }
    Manifest(parts.map { case (a, ps) => a -> ps.toMap }.toMap, stats.toMap)
  }

  /** The committed manifest of a SPECIFIC version — the multi-version
    * reader's entry (index-side time travel): any version inside the
    * retention window of the commits that followed it ([[begin]]'s
    * `keepLast`) still resolves every partition path it references.
    * None once the window has moved past it.
    */
  def readManifestAt(spark: SparkSession, dir: String,
      version: Long): Option[Manifest] = {
    val f = fs(spark, dir)
    readSmall(f, hp(manifestPath(dir, version))).map(deserialize)
  }

  /** The committed (version, manifest) the pointer currently serves. */
  def readManifest(spark: SparkSession, dir: String): (Long, Manifest) =
    readManifestOpt(spark, dir).getOrElse(throw new IllegalStateException(
      s"$dir holds no committed index (no `current` pointer)"))

  private def readManifestOpt(spark: SparkSession,
      dir: String): Option[(Long, Manifest)] = {
    val f = fs(spark, dir)
    currentVersion(f, dir).map { v =>
      val text = readSmall(f, hp(manifestPath(dir, v))).getOrElse(
        throw new IllegalStateException(
          s"pointer of $dir names v$v but manifest.v$v is missing"))
      (v, deserialize(text))
    }
  }

  /** An in-flight commit: the caller writes its data under [[gen]], then
    * [[finish]]es with the new manifest (or [[abort]]s). Obtained from
    * [[begin]], which has already claimed the version — two concurrent
    * committers cannot both hold a Commit for the same version.
    */
  final class Commit private[VersionedIndex] (spark: SparkSession,
      dir: String, val base: Option[(Long, Manifest)],
      keepLast: Int) {
    val version: Long = base.map(_._1).getOrElse(0L) + 1
    /** This commit's private generation directory — data staged here is
      * invisible until the pointer flips. */
    val gen: String = s"$dir/${genName(version)}"
    def genLabel: String = genName(version)
    def baseManifest: Manifest =
      base.map(_._2).getOrElse(Manifest(Map.empty, Map.empty))

    /** Publish: atomic manifest write → atomic pointer flip (THE commit)
      * → claim cleanup → GC of everything unreachable from the new and
      * grace manifests.
      */
    private[graft] def finish(m: Manifest): Unit = {
      val f = fs(spark, dir)
      crashHook("pre-manifest")
      writeAtomic(f, manifestPath(dir, version), serialize(m))
      crashHook("pre-pointer")
      writeAtomic(f, pointerPath(dir), version.toString)
      crashHook("post-pointer")
      f.delete(hp(claimPath(dir, version)), false)
      gc(f, m)
    }

    /** Drop the claim and any staged data — nothing was published. */
    private[graft] def abort(): Unit = {
      val f = fs(spark, dir)
      scala.util.Try(f.delete(hp(gen), true))
      scala.util.Try(f.delete(hp(claimPath(dir, version)), false))
    }

    /** Keep everything reachable from the `keepLast` most recent
      * manifests — `version` (just committed) down to
      * `version − keepLast + 1` (the retention window for in-flight and
      * long-running readers; keepLast = 2, the default, is the classic
      * one-version grace). Delete superseded partition dirs, manifests
      * below the window, spent claims, and crashed-sweeper tombstones.
      * Never touches generations above `version` — they may be a
      * concurrent writer's in-flight stage.
      */
    private def gc(f: org.apache.hadoop.fs.FileSystem, m: Manifest): Unit = {
      val floor = version - keepLast + 1
      val kept = ((floor max 1L) until version).flatMap(v =>
        readSmall(f, hp(manifestPath(dir, v))).map(deserialize))
      val keep = reachable(m) ++ kept.flatMap(reachable)
      sweep(f, dir, version, keepManifestsFrom = floor, keep)
    }
  }

  private def reachable(mm: Manifest): Set[String] =
    mm.parts.flatMap { case (a, ps) => ps.map { case (pd, g) =>
      if (pd == "-") s"$g/$a" else s"$g/$a/$pd" } }.toSet

  /** Delete everything under `dir` that is not in `keep` (partition-dir
    * keys of [[reachable]]'s shape), plus manifests below
    * `keepManifestsFrom`, spent claims, sweeper tombstones, and stray
    * publish temps. Shared by the post-commit GC (keep = current +
    * grace) and [[sweepGrace]] (keep = current only).
    */
  private def sweep(f: org.apache.hadoop.fs.FileSystem, dir: String,
      version: Long, keepManifestsFrom: Long, keep: Set[String]): Unit = {
      val keptArtifacts = keep // whole-dir entries (`-`) are prefix guards
      val root = scala.util.Try(f.listStatus(hp(dir))).toOption
        .getOrElse(Array.empty)
      root.map(_.getPath).foreach { p =>
        val n = p.getName
        // superseded manifests (below the grace window)
        if (n.startsWith("manifest.v") &&
          n.stripPrefix("manifest.v").forall(_.isDigit) &&
          n.stripPrefix("manifest.v").toLong < keepManifestsFrom)
          f.delete(p, false)
        // spent claims (their version is committed or abandoned forever)
        if (n.startsWith("commit.v") && n.endsWith(".claim") &&
          n.stripPrefix("commit.v").stripSuffix(".claim").forall(_.isDigit) &&
          n.stripPrefix("commit.v").stripSuffix(".claim").toLong < version)
          f.delete(p, false)
        // crashed-sweeper tombstones are unconditionally debris
        if (n.contains(".claim.sweep.")) f.delete(p, false)
        // stray atomic-publish temps from crashed committers
        if (n.contains(".tmp.") && (n.startsWith("manifest.v") ||
          n.startsWith("current.tmp."))) f.delete(p, false)
        // generation dirs at or below this version: drop unreachable
        // partition dirs (and then empty artifact/gen dirs)
        if (n.startsWith("g") && n.drop(1).nonEmpty &&
          n.drop(1).forall(_.isDigit) && n.drop(1).toLong <= version) {
          scala.util.Try(f.listStatus(p)).toOption.getOrElse(Array.empty)
            .map(_.getPath).foreach { art =>
              val artKey = s"$n/${art.getName}"
              if (!keptArtifacts.contains(artKey)) {
                // partitioned artifact: check each partition dir
                scala.util.Try(f.listStatus(art)).toOption
                  .getOrElse(Array.empty).map(_.getPath).foreach { part =>
                    if (part.getName.contains("=") &&
                      !keep.contains(s"$artKey/${part.getName}"))
                      f.delete(part, true)
                  }
                val left = scala.util.Try(f.listStatus(art)).toOption
                  .getOrElse(Array.empty)
                // only bookkeeping files (_SUCCESS) left → artifact dead
                if (left.forall(s => s.getPath.getName.startsWith("_")))
                  f.delete(art, true)
              }
            }
          val leftG = scala.util.Try(f.listStatus(p)).toOption
            .getOrElse(Array.empty)
          if (leftG.isEmpty) f.delete(p, true)
        }
      }
  }

  /** PHYSICAL-ERASURE sweep: drop the grace window so ONLY the current
    * manifest's partition directories remain on disk — the index-side
    * analogue of ChatStore's `vacuum(keepLast = 1)`, called by forget
    * flows after a delete commit so superseded generations holding the
    * forgotten rows' bytes are actually gone. Trades away the one-commit
    * reader grace for that one transition (exactly like the table
    * store's forget), so callers reserve it for erasure, not routine GC.
    */
  def sweepGrace(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val (v, m) = readManifest(spark, dir)
    sweep(f, dir, v, keepManifestsFrom = v, keep = reachable(m))
  }

  /** Open a commit: read the current snapshot, claim the next version
    * (create-exclusive; stale crashed-writer claims are swept via the
    * single-winner tombstone rename), re-validate the pointer after the
    * claim. Throws `ConcurrentModificationException` if a live writer
    * holds the claim or the pointer moved — the caller re-runs against
    * the new current, exactly ChatStore's contract.
    *
    * `keepLast` is this commit's RETENTION window (parity with
    * `ChatStore.commitKeepLast`): the post-commit GC keeps the keepLast
    * most recent manifests and every partition directory they reach, so
    * a reader that resolved a manifest up to keepLast−1 commits ago
    * still finds all its paths. The default 2 is the classic
    * one-version grace. The window is per-commit — the NEXT commit's
    * knob decides what survives it — so a lifecycle with long-running
    * readers passes the same value throughout.
    */
  def begin(spark: SparkSession, dir: String, keepLast: Int = 2): Commit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark, dir)
    f.mkdirs(hp(dir))
    val base = readManifestOpt(spark, dir)
    val cur = base.map(_._1)
    val next = cur.getOrElse(0L) + 1
    val claim = hp(claimPath(dir, next))
    def tryClaim(): Boolean =
      try { val o = f.create(claim, false); o.close(); true }
      catch { case _: java.io.IOException => false }
    var claimed = tryClaim()
    if (!claimed) {
      val stale = scala.util.Try(f.getFileStatus(claim)).toOption.exists(st =>
        System.currentTimeMillis() - st.getModificationTime > claimStaleMs)
      if (stale) {
        // single-winner sweep (see ChatStore.commitVersioned): rename
        // first, delete only if the pointer still proves the claimant
        // never published
        val tomb = hp(claimPath(dir, next) +
          s".sweep.${java.util.UUID.randomUUID()}")
        if (f.rename(claim, tomb)) {
          if (currentVersion(f, dir) == cur) {
            f.delete(hp(s"$dir/${genName(next)}"), true)
            f.delete(hp(manifestPath(dir, next)), false)
          }
          f.delete(tomb, false)
          claimed = tryClaim()
        }
      }
    }
    if (!claimed)
      throw new java.util.ConcurrentModificationException(
        s"index commit conflict on $dir: version $next is claimed by a " +
          "concurrent writer — re-run the maintenance against the new current")
    if (currentVersion(f, dir) != cur) {
      f.delete(claim, false)
      throw new java.util.ConcurrentModificationException(
        s"index commit conflict on $dir: the current version advanced past " +
          "the snapshot this maintenance was derived from — re-run it")
    }
    new Commit(spark, dir, base, keepLast)
  }

  /** Partition directory names (`bucket=3`, …) a just-finished artifact
    * write produced under `genArtifactDir` — the manifest entries for the
    * partitions this commit owns.
    */
  def writtenPartDirs(spark: SparkSession, genArtifactDir: String): Seq[String] = {
    val f = fs(spark, genArtifactDir)
    if (!f.exists(hp(genArtifactDir))) Seq.empty
    else f.listStatus(hp(genArtifactDir))
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath.getName).toSeq.sorted
  }

  /** Absolute physical path of every partition of `artifact` under the
    * given manifest — the read-side (and test-side) view of where each
    * partition currently lives.
    */
  def partitionPaths(dir: String, m: Manifest,
      artifact: String): Map[String, String] =
    m.parts.getOrElse(artifact, Map.empty).map { case (pd, g) =>
      pd -> (if (pd == "-") s"$dir/$g/$artifact" else s"$dir/$g/$artifact/$pd")
    }

  /** Read an artifact through the manifest: the selected partition dirs
    * (all of them by default), grouped by generation so Spark recovers
    * the partition column via each generation's `basePath`, unioned.
    * `only = Some(dirNames)` is the STATIC pruning path — unselected
    * partitions are never even listed. An empty selection returns an
    * empty frame with `emptySchema` (a term that hashes to a bucket the
    * corpus never produced must yield zero rows, not an error).
    */
  def readArtifact(spark: SparkSession, dir: String, m: Manifest,
      artifact: String, only: Option[Set[String]],
      emptySchema: => StructType): DataFrame = {
    val entries = m.parts.getOrElse(artifact, Map.empty)
    val sel = only.map(o => entries.view.filterKeys(o).toMap).getOrElse(entries)
    if (sel.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], emptySchema)
    else if (sel.keySet == Set("-"))
      spark.read.parquet(s"$dir/${sel("-")}/$artifact")
    else sel.groupBy(_._2).toSeq.sortBy(_._1).map { case (g, parts) =>
      spark.read.option("basePath", s"$dir/$g/$artifact")
        .parquet(parts.keys.toSeq.sorted.map(pd => s"$dir/$g/$artifact/$pd"): _*)
    }.reduce(_.unionByName(_))
  }

  /** Per-partition selective COMPACTION: rewrite (as one ordinary commit)
    * only the partitions of the named artifacts whose parquet file count
    * exceeds `targetFiles`, one output file per partition; every other
    * partition keeps its existing generation directory — files, mtimes
    * and all. Content is preserved row-for-row (the rewrite is a
    * read-union-write of the same rows). Returns the number of
    * partitions compacted (0 = no commit was made).
    *
    * This is the maintenance a long-lived index needs after many CDC
    * batches: each rewrite emits as many files per partition as its
    * write tasks, and generations scatter hot partitions across dirs —
    * compaction re-localizes them and collapses the small files, while
    * the versioned commit keeps readers crash-safe throughout.
    */
  def compactPartitioned(spark: SparkSession, dir: String,
      artifacts: Seq[(String, String)], targetFiles: Int = 1,
      keepLast: Int = 2): Int = {
    import org.apache.spark.sql.functions.col
    val f = fs(spark, dir)
    val (_, m0) = readManifest(spark, dir)
    def oversized(artifact: String): Map[String, String] =
      m0.parts.getOrElse(artifact, Map.empty).filter { case (pd, g) =>
        pd != "-" && scala.util.Try(
          f.listStatus(hp(s"$dir/$g/$artifact/$pd"))).toOption
          .getOrElse(Array.empty)
          .count(_.getPath.getName.endsWith(".parquet")) > targetFiles
      }
    val work = artifacts.map { case (a, pc) => (a, pc, oversized(a)) }
      .filter(_._3.nonEmpty)
    if (work.isEmpty) return 0
    val c = begin(spark, dir, keepLast)
    try {
      // re-read under the claim: the pre-claim scouting above may have
      // raced another commit (begin re-validated the pointer, so the
      // base manifest is authoritative now)
      val m = c.baseManifest
      var parts = m.parts
      var n = 0
      work.foreach { case (artifact, partCol, _) =>
        val entries = m.parts.getOrElse(artifact, Map.empty)
        val over = entries.filter { case (pd, g) =>
          pd != "-" && scala.util.Try(
            f.listStatus(hp(s"$dir/$g/$artifact/$pd"))).toOption
            .getOrElse(Array.empty)
            .count(_.getPath.getName.endsWith(".parquet")) > targetFiles
        }
        if (over.nonEmpty) {
          val df = readArtifact(spark, dir, m, artifact, Some(over.keySet),
            throw new IllegalStateException("nonempty selection"))
          df.repartition(over.size, col(partCol))
            .write.mode("overwrite").partitionBy(partCol)
            .parquet(s"${c.gen}/$artifact")
          val written = writtenPartDirs(spark, s"${c.gen}/$artifact")
          require(written.toSet == over.keySet,
            s"compaction must preserve the partition set: expected " +
              s"${over.keySet}, wrote ${written.toSet}")
          parts = parts.updated(artifact,
            entries ++ written.map(_ -> c.genLabel))
          n += over.size
        }
      }
      c.finish(Manifest(parts, m.stats))
      n
    } catch { case e: Throwable => c.abort(); throw e }
  }
}
