package graft.chat

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed table sinks covering the reference's storage surface
  * (SURVEY.md §2.1 S5–S11): `whatsapp_messages`, `users`,
  * `research_configs`. The reference's per-row INSERT round trips
  * (backend/main.py:380-387) become batched columnar appends; its MySQL/
  * Mongo split (a bug as committed, SURVEY §1.7) becomes three uniform
  * tables.
  *
  * Point mutations are expressed as the standard lakehouse rewrites:
  * upsert = anti-join old ∪ new, delete = anti-join — both shuffle-free
  * when the key side is broadcast.
  *
  * Durability: rewrites commit via directory rename-swap on filesystems
  * where single-dir rename is atomic (local, HDFS) and via an atomic
  * version-pointer object everywhere else (S3/GCS-style stores, where a
  * directory rename is a non-atomic copy) — see [[overwrite]].
  */
object ChatStore {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** S5: ingest a chat file through the upload dialect into
    * `whatsapp_messages(group_name, date_time, sender, message)`.
    * Returns the inserted-row count (A3).
    */
  def uploadChat(spark: SparkSession, chatPath: String, tableDir: String): Long = {
    val rows = ChatParser.uploadDialect(ChatLines.read(spark, chatPath))
      .select("group_name", "date_time", "sender", "message")
    // count THIS batch (the reference's inserted_rows counter), not the
    // cumulative table after append
    val inserted = rows.count()
    rows.write.mode(SaveMode.Append).parquet(dataDir(spark, tableDir))
    inserted
  }

  /** S6: research-config insert with a server-side created_at stamp. */
  def saveResearchConfig(config: DataFrame, tableDir: String): Unit =
    config
      .withColumn("created_at", current_timestamp())
      .write.mode(SaveMode.Append)
      .parquet(dataDir(config.sparkSession, tableDir))

  /** The known research-form fields the reference projects out of the
    * client's free dict (backend/main.py:407-414).
    */
  private val FormFields =
    Seq("name", "description", "start_date", "end_date", "message_limit")

  /** S6, dynamic payloads (SURVEY §1.5; reference backend/main.py:397-422):
    * `/save-form` accepts a free dict, so fields arrive with whatever JSON
    * type and keys the client sent. Model: the payload is a
    * `map<string,string>` column; the known fields are projected to
    * columns (absent → null, `message_limit` keeps the client's raw
    * string form — the reference stores whatever type arrived), and the
    * complete payload survives in an `extras` map column so arbitrary
    * client fields are never dropped by the fixed parquet schema.
    */
  def saveResearchForm(payloads: DataFrame, tableDir: String,
      payloadCol: String = "payload"): Unit = {
    val projected = FormFields.foldLeft(payloads) { (df, k) =>
      df.withColumn(k, element_at(col(payloadCol), lit(k)))
    }
    saveResearchConfig(
      projected.withColumn("extras", col(payloadCol)).drop(payloadCol),
      tableDir)
  }

  /** S7: user insert with generated uuid ids; F8: reject rows whose email
    * already exists (left_anti against the current table).
    */
  def registerUsers(spark: SparkSession, newUsers: DataFrame, tableDir: String): Long = {
    val existing = currentOrEmpty(spark, tableDir)
    // F8 also holds within a batch: one row per email (reference inserts
    // one at a time, so a duplicate in the same batch would be rejected)
    val batch = newUsers.dropDuplicates("email")
    val accepted = (if (existing.isEmpty) batch
                    else batch.join(broadcast(existing.select("email")), Seq("email"), "left_anti"))
      .localCheckpoint(true)
    // count from the materialized batch BEFORE generating uuids: counting a
    // lazy plan after the write would re-run the anti-join (a second job)
    // and draw fresh non-deterministic uuids on the way
    val inserted = accepted.count()
    accepted.withColumn("user_id", expr("uuid()"))
      .write.mode(SaveMode.Append).parquet(dataDir(spark, tableDir))
    inserted
  }

  /** S8: point lookup. */
  def findByEmail(spark: SparkSession, tableDir: String, email: String): DataFrame =
    readTable(spark, tableDir).filter(col("email") === email).limit(1)

  /** S9: point update — non-null new fields win (coalesce merge), the rest
    * of the table passes through. Rewrites the table (copy-on-write).
    */
  def updateUser(spark: SparkSession, tableDir: String, userId: String,
      fields: Map[String, String]): Unit = {
    val cur = readTable(spark, tableDir)
    val updated = cur.columns.foldLeft(cur) { (df, c) =>
      fields.get(c) match {
        case Some(v) =>
          // keep the column's type: a bare string literal would coerce the
          // whole column (and the rewritten table) to StringType
          val typed = lit(v).cast(cur.schema(c).dataType)
          df.withColumn(c, when(col("user_id") === userId, typed).otherwise(col(c)))
        case None => df
      }
    }
    overwrite(updated, tableDir)
  }

  /** Generic MERGE INTO over the versioned-table layer: applies
    * [[graft.ops.Merge.mergeFrames]] (conditional UPDATE/DELETE on match,
    * conditional INSERT on no-match — the lakehouse upsert statement) to
    * the table's current version and commits the result through the same
    * copy-on-write protocol every other rewrite uses (rename-swap or
    * version-pointer, per filesystem). `updateUser`/`deleteUser` are
    * single-row instances of this. Source must be key-unique (the SQL
    * MERGE contract); re-applying an idempotent merge (upsert whose SET
    * writes the same values) commits a new version with identical content.
    */
  def mergeInto(spark: SparkSession, tableDir: String, source: DataFrame,
      keys: Seq[String],
      matched: Seq[graft.ops.Merge.WhenMatched] = Nil,
      notMatched: Option[graft.ops.Merge.WhenNotMatched] = None): Unit =
    overwrite(graft.ops.Merge.mergeFrames(
      readTable(spark, tableDir), source, keys, matched, notMatched), tableDir)

  /** S10: point delete (anti-join rewrite). */
  def deleteUser(spark: SparkSession, tableDir: String, userId: String): Unit =
    overwrite(readTable(spark, tableDir).filter(col("user_id") =!= userId), tableDir)

  /** Public read of the table's current committed state (the pointer's
    * version for versioned tables, the table dir otherwise).
    */
  def readCurrent(spark: SparkSession, tableDir: String): DataFrame =
    readTable(spark, tableDir)

  /** S11: capped scan with projection. */
  def listUsers(spark: SparkSession, tableDir: String, n: Int = 100): DataFrame =
    readTable(spark, tableDir).select("user_id", "name", "email").limit(n)

  /** S4 (table form): drop a table and every artifact either commit
    * protocol may have left — the data dir, rename-swap leftovers
    * (.staging/.old), the version pointer, and all version dirs. Without
    * this, deleting just the data dir of a versioned table would leave a
    * live pointer resurrecting stale versions on the next access.
    */
  def dropTable(spark: SparkSession, tableDir: String): Unit = {
    val f = fs(spark, tableDir)
    val parent = hPath(tableDir).getParent
    val name = hPath(tableDir).getName
    if (f.exists(parent)) {
      f.listStatus(parent).map(_.getPath).foreach { p =>
        val n = p.getName
        val isVersion = n.startsWith(name + ".v") &&
          n.drop(name.length + 2).forall(_.isDigit)
        val isClaim = n.startsWith(name + ".v") &&
          (n.endsWith(".claim") || n.contains(".claim.sweep."))
        if (n == name || isVersion || isClaim ||
          n == name + ".current" || n == name + ".staging" || n == name + ".old" ||
          n.startsWith(name + ".current.tmp"))
          f.delete(p, true)
      }
    }
  }

  /** All path handling goes through the Hadoop FileSystem API — a 100 TB
    * table lives on HDFS/S3/GCS, where `java.io.File`/`java.nio` paths
    * simply do not resolve. `FileSystem.get(uri, conf)` picks the scheme's
    * implementation (local fs included, so tests run unchanged).
    */
  private def fs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hPath(p: String) = new org.apache.hadoop.fs.Path(p)

  /** Filesystems whose single-directory rename is atomic. Everywhere else
    * (s3a, gs, wasb, abfs, oss, …) a directory "rename" is a per-object
    * copy+delete: a crash mid-rename leaves a PARTIAL directory that looks
    * present, which would make the rename-swap protocol silently serve (and
    * then "repair" by deleting the only complete copies of) half a table.
    * Those schemes use the version-pointer protocol instead — no directory
    * rename anywhere on the commit path.
    */
  private val AtomicRenameSchemes = Set("file", "hdfs", "viewfs")

  /** Test hook: forces the version-pointer protocol on filesystems whose
    * rename IS atomic, so the object-store path is exercised end-to-end by
    * local specs. Never set in production code.
    */
  private[chat] var forceVersionedProtocol = false

  /** Test seam for the vacuum-vs-writer race: invoked after [[vacuum]]
    * reads the pointer + committed list and before it sweeps, so a spec
    * can commit a new version in the window and prove the sweep never
    * touches it (it is above the stale pointer vacuum captured, and
    * above-pointer dirs are never deleted). No-op in production.
    */
  private[chat] var vacuumAfterListHook: () => Unit = () => ()

  /** Test seam for the writer-vs-writer race: invoked by the versioned
    * commit after it reads the current version and before it claims the
    * next one, so a spec can land a full competing commit in the window
    * and prove the slower writer fails cleanly (never clobbers the
    * winner). No-op in production.
    */
  private[chat] var overwriteAfterVersionReadHook: () => Unit = () => ()

  /** A version claim with no completed data dir older than this is a
    * crashed writer's debris and may be swept by the next committer
    * (claims are written immediately before the version dir). Spec knob.
    */
  private[chat] var claimStaleMs: Long = 15L * 60 * 1000

  /** RETENTION each versioned commit enforces: keep the newest
    * `commitKeepLast` committed versions (current included), GC the
    * rest. The default 2 (current + one grace copy for in-flight
    * readers) is the bound a continuous-ingest table wants; raise it to
    * give [[versions]]/[[readVersion]]/[[changeFeed]] a deeper
    * time-travel window — e.g. keepLast=6 lets a downstream consumer
    * diff v(n−5)→v(n) after five more commits. [[vacuum]] prunes
    * explicitly below whatever this leaves. Minimum honored is 2: the
    * grace copy is part of the reader contract, not retention policy.
    */
  @volatile var commitKeepLast: Int = 2

  private def pointer(tableDir: String) = hPath(tableDir + ".current")
  private def versionDir(tableDir: String, v: Long) = s"$tableDir.v$v"

  /** A table is versioned if its pointer file exists (it was committed via
    * the pointer protocol before — the protocol is sticky per table) or the
    * filesystem cannot rename directories atomically.
    */
  private def useVersioned(f: org.apache.hadoop.fs.FileSystem, tableDir: String): Boolean =
    forceVersionedProtocol || f.exists(pointer(tableDir)) ||
      !AtomicRenameSchemes.contains(Option(f.getUri.getScheme).getOrElse("file"))

  /** One pointer read attempt. Failure modes are deliberately distinct:
    * an UNPARSEABLE read (empty/garbage — the torn-write window) returns
    * None so the caller can retry/fall back; a genuine IO error (transient
    * store outage, permission failure) PROPAGATES — treating it as "no
    * pointer" would silently serve whatever stale version the recovery
    * scan finds. A pointer deleted between the caller's exists() and our
    * open() (concurrent dropTable) is the one IO case that legitimately
    * means "no pointer", so FileNotFound maps to None.
    */
  private def readPointerOnce(
      f: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path): Option[Long] = {
    val text =
      try {
        val in = f.open(p)
        try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    text.flatMap(t => scala.util.Try(t.trim.toLong).toOption)
  }

  /** Highest on-disk `<table>.v<N>` directory — the recovery target when
    * the pointer object is unreadable. Prefers versions carrying the
    * committer's `_SUCCESS` marker (a version without it is a partial
    * write); if no marked version exists (marker generation disabled),
    * falls back to the highest dir present. May resurface an orphan
    * version whose pointer commit never happened — acceptable for a
    * RECOVERY path whose alternative is failing every read of the table.
    */
  private def highestVersionDir(
      f: org.apache.hadoop.fs.FileSystem, tableDir: String): Option[Long] = {
    val name = hPath(tableDir).getName
    val parent = hPath(tableDir).getParent
    val versions = scala.util.Try(f.listStatus(parent)).toOption
      .getOrElse(Array.empty).map(_.getPath)
      .filter { p =>
        val suffix = p.getName.stripPrefix(name + ".v")
        p.getName.startsWith(name + ".v") && suffix.nonEmpty && suffix.forall(_.isDigit)
      }
    def v(p: org.apache.hadoop.fs.Path) = p.getName.stripPrefix(name + ".v").toLong
    val complete = versions.filter(p => f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
    (if (complete.nonEmpty) complete else versions).map(v).sorted.lastOption
  }

  /** Current committed version, if the pointer file exists.
    *
    * Defensive against a torn pointer: on stores where [[writePointer]]
    * cannot rename atomically the commit is truncate-then-write, so a
    * concurrent reader can observe an empty/partial object (so can a
    * pointer file copied over from another store mid-flight). An
    * unparseable read is retried once — the write window is microseconds —
    * and then falls back to the highest complete version directory rather
    * than throwing `NumberFormatException` into every subsequent read.
    */
  private def currentVersion(
      f: org.apache.hadoop.fs.FileSystem, tableDir: String): Option[Long] = {
    val p = pointer(tableDir)
    if (!f.exists(p)) None
    else readPointerOnce(f, p)
      .orElse { Thread.sleep(50); readPointerOnce(f, p) }
      .orElse {
        val recovered = highestVersionDir(f, tableDir)
        // the recovery path may resurface an orphaned never-committed
        // version — make every use of it visible in the logs
        log.warn(s"pointer $p unparseable after retry; recovering from " +
          s"highest version dir (${recovered.fold("none found")(v => s"v$v")})")
        recovered
      }
  }

  /** Commit = publish one small pointer object. On atomic-rename
    * filesystems (local, HDFS) the pointer is written to a temp file and
    * renamed over the destination — readers see old-or-new, never a
    * truncated in-between. Object stores get a direct single-object PUT,
    * which is atomic there (and where rename would be copy+delete).
    */
  private def writePointer(
      f: org.apache.hadoop.fs.FileSystem, tableDir: String, v: Long): Unit = {
    val bytes = v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val dst = pointer(tableDir)
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
    if (AtomicRenameSchemes.contains(scheme)) {
      // unique tmp per committer: a FIXED tmp name lets two concurrent
      // commits clobber each other between write and rename (publishing
      // the loser's version under the winner's name); crash-orphaned tmps
      // are swept by dropTable's `.current.tmp` prefix rule
      val tmp = hPath(tableDir + s".current.tmp.${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(bytes) finally out.close()
      // FileContext.rename(OVERWRITE) is the atomic replace primitive on
      // these schemes (plain FileSystem.rename refuses an existing dest)
      try org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, f.getConf)
        .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // no AbstractFileSystem binding for this scheme: fall back to
          // delete+rename (non-atomic, but rename-failure-checked)
          f.delete(dst, false)
          if (!f.rename(tmp, dst))
            throw new java.io.IOException(s"pointer commit failed: $tmp -> $dst")
      }
    } else {
      val out = f.create(dst, true)
      try out.write(bytes) finally out.close()
    }
  }

  /** Physical directory currently holding the table's data: the pointed-to
    * version dir for versioned tables, the table dir itself otherwise
    * (including versioned-protocol tables that have only ever been appended
    * to — the pointer appears at their first copy-on-write rewrite).
    */
  private def dataDir(spark: SparkSession, tableDir: String): String =
    currentVersion(fs(spark, tableDir), tableDir)
      .map(versionDir(tableDir, _)).getOrElse(tableDir)

  /** Time travel: all COMPLETE versions of a versioned table, ascending,
    * with the currently-committed one flagged. Every row here is readable
    * via [[readVersion]] — the audit/debug/rollback affordance a
    * versioned store owes its operators. Retention is bounded twice
    * over: each [[overwrite]] commit GCs versions below the v(N−1)
    * grace copy, and [[vacuum]] prunes explicitly (the Delta/Iceberg
    * VACUUM shape) for tables whose history grew by other means.
    */
  def versions(spark: SparkSession, tableDir: String): Seq[(Long, Boolean)] = {
    val f = fs(spark, tableDir)
    val name = hPath(tableDir).getName
    val parent = hPath(tableDir).getParent
    val cur = currentVersion(f, tableDir)
    scala.util.Try(f.listStatus(parent)).toOption
      .getOrElse(Array.empty).map(_.getPath)
      .filter { p =>
        val suffix = p.getName.stripPrefix(name + ".v")
        p.getName.startsWith(name + ".v") && suffix.nonEmpty &&
          suffix.forall(_.isDigit) &&
          f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      }
      .map(p => p.getName.stripPrefix(name + ".v").toLong)
      .sorted.toSeq
      .map(v => (v, cur.contains(v)))
  }

  /** Time travel: read one specific committed version, bypassing the
    * pointer. Fails fast on a version that does not exist or never
    * completed (no `_SUCCESS`) instead of returning a partial frame.
    */
  def readVersion(spark: SparkSession, tableDir: String, version: Long): DataFrame = {
    val f = fs(spark, tableDir)
    val dir = versionDir(tableDir, version)
    require(f.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")),
      s"version $version of $tableDir does not exist or was never committed")
    spark.read.parquet(dir)
  }

  /** Retention for the versioned store — the VACUUM a continuous-ingest
    * table needs so its time-travel chain is bounded STORAGE, not an
    * append-forever log: keep the newest `keepLast` committed versions
    * (the currently-committed one is always kept, whatever `keepLast`
    * says), delete every older committed version dir, and sweep commit
    * leftovers — orphan version dirs BELOW the current pointer that
    * never completed (`_SUCCESS` absent: a crashed rewrite's debris,
    * unreachable forever since commits are monotonic), and, on
    * rename-swap tables, `.staging`/`.old` remnants after the standard
    * [[recover]] repair. Versions ABOVE the current pointer are never
    * touched, committed or not: they may be a concurrent writer's
    * in-flight commit or a roll-forward candidate.
    *
    * Time travel onto a vacuumed version fails fast with
    * [[readVersion]]'s existing require — never a partial frame.
    * Returns the version numbers whose directories were deleted.
    */
  def vacuum(spark: SparkSession, tableDir: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark, tableDir)
    if (!useVersioned(f, tableDir)) {
      // rename-swap protocol: recover() both repairs an interrupted swap
      // and deletes any .staging/.old leftovers; there is no version chain
      recover(spark, tableDir)
      return Seq.empty
    }
    val cur = currentVersion(f, tableDir)
    val committed = versions(spark, tableDir).map(_._1)
    // the keepLast quota counts only usable history — versions at or
    // below the current pointer. Committed-but-unpointed versions above
    // it (a crashed commit / roll-forward candidate) are never deleted
    // anyway, and letting them eat the quota would silently shrink the
    // below-current history kept (keepLast=2 with one crashed commit
    // above current kept only the current version)
    val keep = committed.filter(v => cur.forall(v <= _))
      .takeRight(keepLast).toSet ++ cur
    vacuumAfterListHook()
    val name = hPath(tableDir).getName
    val parent = hPath(tableDir).getParent
    val committedSet = committed.toSet
    val deleted = scala.collection.mutable.ArrayBuffer.empty[Long]
    scala.util.Try(f.listStatus(parent)).toOption.getOrElse(Array.empty)
      .map(_.getPath).foreach { p =>
        val suffix = p.getName.stripPrefix(name + ".v")
        val isVersion = p.getName.startsWith(name + ".v") &&
          suffix.nonEmpty && suffix.forall(_.isDigit)
        // a claim marker below the current pointer is spent (its version
        // is committed or abandoned forever — commits are monotonic):
        // sweep it with the history. Above-current claims may be a live
        // writer's and are left alone, like above-current versions.
        val claimDigits = suffix.stripSuffix(".claim")
        val isClaim = p.getName.startsWith(name + ".v") &&
          suffix.endsWith(".claim") && claimDigits.nonEmpty &&
          claimDigits.forall(_.isDigit)
        if (isClaim && cur.exists(claimDigits.toLong < _))
          f.delete(p, false)
        // a sweep tombstone (renamed-away stale claim) is ALWAYS debris:
        // its owner deletes it within the same call, so one that survived
        // to a vacuum belongs to a crashed sweeper. Deleting it under a
        // live sweeper is harmless — the content is never read and the
        // owner's own delete tolerates absence.
        if (p.getName.startsWith(name + ".v") &&
          suffix.contains(".claim.sweep.")) f.delete(p, false)
        if (isVersion) {
          val v = suffix.toLong
          val belowCurrent = cur.exists(v < _)
          val staleCommitted = committedSet.contains(v) && !keep.contains(v) &&
            belowCurrent
          val orphan = !committedSet.contains(v) && belowCurrent
          if (staleCommitted || orphan) {
            f.delete(p, true)
            deleted += v
          }
        }
      }
    deleted.sorted.toSeq
  }

  /** Reads a table, first repairing any interrupted rename-swap —
    * `spark.read.parquet` resolves the path eagerly, so a mid-swap table
    * would otherwise fail analysis before [[overwrite]]'s own recovery ran.
    * Versioned tables need no repair: an uncommitted rewrite is just an
    * orphan version dir the pointer never mentions.
    */
  private def readTable(spark: SparkSession, tableDir: String): DataFrame = {
    if (!useVersioned(fs(spark, tableDir), tableDir)) recover(spark, tableDir)
    spark.read.parquet(dataDir(spark, tableDir))
  }

  private def currentOrEmpty(spark: SparkSession, tableDir: String): DataFrame = {
    val f = fs(spark, tableDir)
    if (!useVersioned(f, tableDir)) recover(spark, tableDir)
    val d = dataDir(spark, tableDir)
    if (f.exists(hPath(d))) spark.read.parquet(d)
    else spark.emptyDataFrame
  }

  /** Repairs a table left mid-swap by a crashed [[overwrite]] — the
    * RENAME-SWAP protocol only, so "table dir exists" implies "table dir is
    * complete" (renames are atomic on the filesystems this protocol runs
    * on); versioned tables never enter here. The swap sequence is
    * stage-complete → table→.old → .staging→table → drop .old, so on
    * recovery:
    *  - table present: any leftover .staging/.old is from an uncommitted
    *    or fully-committed rewrite — the table is authoritative, drop them;
    *  - table absent + .staging present: the crash hit between the two
    *    moves; .staging holds the complete new version — roll forward;
    *  - table absent + only .old present: roll back to the old version.
    */
  private def recover(spark: SparkSession, tableDir: String): Unit = {
    val f = fs(spark, tableDir)
    val (table, stage, old) =
      (hPath(tableDir), hPath(tableDir + ".staging"), hPath(tableDir + ".old"))
    if (f.exists(table)) {
      if (f.exists(stage)) f.delete(stage, true)
      if (f.exists(old)) f.delete(old, true)
    } else if (f.exists(stage)) {
      f.rename(stage, table)
      if (f.exists(old)) f.delete(old, true)
    } else if (f.exists(old)) {
      f.rename(old, table)
    }
  }

  /** Copy-on-write table rewrite, protocol chosen per filesystem:
    *
    *  - **Atomic-rename fs** (local, HDFS): stage the new version beside the
    *    table, then swap directories. The swap has a crash window between
    *    the two renames (no directory-PAIR atomicity anywhere); [[recover]]
    *    rolls an interrupted swap forward on the next read or write. Sound
    *    because each single rename is atomic on these filesystems.
    *  - **Object stores** (s3a, gs, …): directory rename is a non-atomic
    *    per-object copy, so the swap protocol would be unsound — a crash
    *    mid-rename leaves a partial-but-present table dir. Instead each
    *    rewrite goes to a fresh `<table>.v<N>` directory and commits by
    *    overwriting the small `<table>.current` pointer object — a
    *    single-object PUT, atomic on every store. This is the same
    *    commit shape lakehouse table formats use (data immutable, one
    *    tiny mutable pointer). Crash before the pointer write leaves an
    *    orphan version dir the next rewrite clobbers; readers always see
    *    the last committed version. The immediately previous version is
    *    retained one rewrite as a grace copy for in-flight readers
    *    (single-writer assumed, as in the reference).
    *
    * Distributed end to end (no driver collect) — the lakehouse-table
    * pattern these point ops compile to at scale.
    */
  private def overwrite(df: DataFrame, tableDir: String): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, tableDir)
    if (useVersioned(f, tableDir)) {
      commitVersioned(df, tableDir)
    } else {
      recover(spark, tableDir)
      val (table, stage, old) =
        (hPath(tableDir), hPath(tableDir + ".staging"), hPath(tableDir + ".old"))
      df.write.mode(SaveMode.Overwrite).parquet(tableDir + ".staging")
      if (f.exists(old)) f.delete(old, true)
      if (f.exists(table)) f.rename(table, old)
      f.rename(stage, table)
      f.delete(old, true)
    }
  }

  /** One optimistic version-pointer commit, with MULTI-WRITER CONFLICT
    * DETECTION (the gap the vacuum-race test left open): two writers
    * that both read current = v must not both land v+1 — the second
    * `SaveMode.Overwrite` into the same version dir would clobber the
    * first writer's committed files while the pointer serves them.
    *
    * Protocol: after reading the current version, the committer CLAIMS
    * `v+1` by create-exclusive of a `<table>.v<N>.claim` marker (atomic
    * on local/HDFS; the one commit primitive object stores without
    * conditional PUT cannot give — there, pair this with an external
    * lock/catalog as every lakehouse format does). Claim failure means a
    * concurrent writer owns that version: the loser throws
    * `ConcurrentModificationException` WITHOUT writing anything — its
    * caller re-runs the whole read-modify-write against the winner's
    * commit (our snapshot was derived from a superseded version, so
    * blindly landing it as v+2 would silently drop the winner's
    * changes). Readers therefore see old-then-winner, never a blend,
    * and the loser's state never touches disk.
    *
    * A claim older than [[claimStaleMs]] is a crashed writer's debris —
    * complete version dir or not, the pointer write IS the commit and
    * never happened for it — so it is swept here (claim + unpublished
    * dir) and the claim retried once. The claim marker is removed after the pointer publish;
    * leftovers from a crash-after-publish are harmless (never parsed as
    * versions) and swept by GC below, [[vacuum]], and [[dropTable]].
    */
  private def commitVersioned(df: DataFrame, tableDir: String): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, tableDir)
    val cur = currentVersion(f, tableDir)
    overwriteAfterVersionReadHook()
    val next = cur.getOrElse(0L) + 1
    val claim = hPath(versionDir(tableDir, next) + ".claim")
    def tryClaim(): Boolean =
      try { val o = f.create(claim, false); o.close(); true }
      catch { case _: java.io.IOException => false }
    var claimed = tryClaim()
    if (!claimed) {
      // A claim older than the staleness window belongs to a crashed
      // writer — whether or not its version dir completed (_SUCCESS):
      // the POINTER write is the commit, and this version is above the
      // current pointer (next = cur + 1), so no reader has ever been
      // served from it; deleting claim + dir merely undoes a commit
      // that never happened. (Requiring _SUCCESS-absent here would
      // wedge the table forever on a writer that died between its
      // data write and its pointer publish.)
      val vDir = hPath(versionDir(tableDir, next))
      val stale = scala.util.Try(f.getFileStatus(claim)).toOption.exists(st =>
        System.currentTimeMillis() - st.getModificationTime > claimStaleMs)
      if (stale) {
        // Single-winner sweep: RENAME the stale claim to a unique
        // tombstone first (atomic on every scheme that supports the
        // claim protocol). Only the recoverer whose rename succeeds may
        // delete the debris — a plain delete-then-recover here is a
        // TOCTOU race where two recoverers both pass the staleness
        // check, and the slower one deletes the faster one's FRESH
        // claim and then its in-progress version directory. The
        // tombstone also keeps `tryClaim`'s create-exclusive meaningful
        // during the sweep (the claim path is vacant only after the
        // winner finished deleting).
        val tomb = hPath(versionDir(tableDir, next) +
          s".claim.sweep.${java.util.UUID.randomUUID()}")
        if (f.rename(claim, tomb)) {
          log.warn(s"sweeping stale claim $claim (crashed writer; " +
            s"unpublished v$next dir removed too)")
          // Re-read the pointer immediately before the destructive dir
          // delete: a "stale" claim can belong to a writer that DID
          // publish v<next> and crashed only before its claim cleanup —
          // then vDir is committed data and must survive. The advanced
          // pointer proves it; our own commit then backs off at the
          // post-claim validation below.
          if (currentVersion(f, tableDir) == cur && f.exists(vDir))
            f.delete(vDir, true)
          f.delete(tomb, false)
          claimed = tryClaim()
        }
      }
    }
    if (!claimed)
      throw new java.util.ConcurrentModificationException(
        s"commit conflict on $tableDir: version $next is claimed by a " +
          "concurrent writer — re-run the operation against the new current")
    // Post-claim validation closes the claim-recycling window: a faster
    // writer deletes its claim AFTER publishing, so a stale committer
    // can succeed in claiming a version that is already committed and
    // pointed-to — the pointer having moved since our read is the
    // proof. Back off without writing a byte.
    if (currentVersion(f, tableDir) != cur) {
      f.delete(claim, false)
      throw new java.util.ConcurrentModificationException(
        s"commit conflict on $tableDir: the current version advanced " +
          s"past the snapshot this rewrite was derived from — re-run " +
          "the operation against the new current")
    }
    // materializes the plan fully (reading the CURRENT data dir) before
    // any commit or cleanup below touches the filesystem
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(tableDir, next))
    writePointer(f, tableDir, next)
    f.delete(claim, false)
    // GC: the pre-versioned append dir (its content now lives in v<next>)
    // and every version below the [[commitKeepLast]] retention window
    // (default: only the v<next-1> grace copy survives), plus any
    // crash-orphaned claim markers down there. One parent LIST finds
    // them all — O(1) RPCs per rewrite regardless of version history,
    // and no crash pattern can strand a version below a gap (an
    // exists()-walk that stops at the first miss would).
    if (f.exists(hPath(tableDir))) f.delete(hPath(tableDir), true)
    val name = hPath(tableDir).getName
    val parent = hPath(tableDir).getParent
    val keepFloor = next - (commitKeepLast.max(2) - 1)
    f.listStatus(parent).map(_.getPath).foreach { p =>
      val raw = p.getName.stripPrefix(name + ".v")
      val digits = if (raw.endsWith(".claim")) raw.stripSuffix(".claim") else raw
      if (p.getName.startsWith(name + ".v") && digits.nonEmpty &&
        digits.forall(_.isDigit) && digits.toLong < keepFloor)
        f.delete(p, true)
      // crashed-sweeper tombstones (see the stale-claim recovery above)
      // are unconditionally debris — same rule as [[vacuum]]'s
      if (p.getName.startsWith(name + ".v") && raw.contains(".claim.sweep."))
        f.delete(p, false)
    }
  }

  /** Commits `df` through the VERSION-POINTER protocol regardless of
    * filesystem (first commit = v1 + pointer; the protocol is sticky per
    * table from then on). Use when the version chain itself is the
    * contract — e.g. [[forgetKeys]]' physical-erasure audit must be able
    * to enumerate and scan EVERY surviving version on any store.
    */
  def writeVersioned(df: DataFrame, tableDir: String): Unit =
    commitVersioned(df, tableDir)

  /** GDPR right-to-be-forgotten, PHYSICALLY, through the versioned
    * store: MERGE-delete every row whose `keyCol` appears in `keys`,
    * then [[vacuum]] the history down to the current version — so no
    * surviving version directory retains the forgotten rows (the grace
    * copy and any older versions are deleted, not just unpointed).
    * Compose with [[residualAudit]] to PROVE erasure rather than assume
    * it. The merge is one key-broadcast anti-join-shaped pass; the
    * vacuum is O(version dirs); nothing corpus-sized moves besides the
    * one copy-on-write rewrite every lakehouse delete pays.
    *
    * CASCADE: every zone-map/bloom copy registered for this table in the
    * skip-rewrite catalog is swept in the same call — delete commit on
    * the copy, grace generation physically erased, registration epoch
    * re-captured so the planner route re-enables over the reduced
    * content. Without the cascade a standing derived artifact would keep
    * serving (and physically retaining) the forgotten rows.
    */
  def forgetKeys(spark: SparkSession, tableDir: String, keyCol: String,
      keys: DataFrame): Unit = {
    mergeInto(spark, tableDir, keys.select(keyCol).distinct(), Seq(keyCol),
      matched = Seq(graft.ops.Merge.WhenMatched(delete = true)))
    vacuum(spark, tableDir, keepLast = 1)
    graft.plans.SkipRewrite.SkipCatalog.defs
      .filter(_.sourcePath.stripSuffix("/") == tableDir.stripSuffix("/"))
      .foreach { sd =>
        graft.ops.ZoneMap.delete(spark, sd.dir, sd.keyCol, keys, Seq(keyCol))
        graft.ops.VersionedIndex.sweepGrace(spark, sd.dir)
        graft.plans.SkipRewrite.register(spark, sd.sourcePath, sd.dir,
          sd.keyCol, sd.bloomCol)
      }
  }

  /** CHANGE DATA FEED between two committed versions — the CDC-out path
    * a lakehouse table exposes to downstream consumers: one null-safe
    * full-outer join of the two version snapshots on `keyCols`,
    * classifying each key as insert (new in `toV`), delete (gone from
    * `toV`), or update (any non-key column differs, compared null-safe);
    * unchanged keys are dropped inside the join projection, so the feed
    * is delta-sized on the wire. Column set = the shared non-key columns
    * of the two schemas (schema evolution between versions tolerated).
    */
  def changeFeed(spark: SparkSession, tableDir: String, fromV: Long,
      toV: Long, keyCols: Seq[String]): DataFrame = {
    val a = readVersion(spark, tableDir, fromV)
    val b = readVersion(spark, tableDir, toV)
    val shared = a.columns.toSet.intersect(b.columns.toSet) -- keyCols
    val aa = a.withColumn("_a_p", lit(true)).alias("a")
    val bb = b.withColumn("_b_p", lit(true)).alias("b")
    // null-safe key equality: a key NULL in both versions must MATCH
    // (plain === would leave both sides unmatched and emit a phantom
    // delete+insert for an unchanged row)
    val cond = keyCols.map(k => col(s"a.$k") <=> col(s"b.$k"))
      .reduce(_ && _)
    val changed = shared.toSeq.sorted
      .map(c => !(col(s"a.$c") <=> col(s"b.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    aa.join(bb, cond, "full_outer")
      .withColumn("op",
        when(col("a._a_p").isNull, "insert")
          .when(col("b._b_p").isNull, "delete")
          .when(changed, "update")
          .otherwise("unchanged"))
      .filter(col("op") =!= "unchanged")
      .select(col("op") +:
        keyCols.map(k => coalesce(col(s"b.$k"), col(s"a.$k")).as(k)): _*)
  }

  /** Physical-residue audit for [[forgetKeys]]: reads EVERY surviving
    * complete data directory of the table — the plain table dir if
    * present and every committed `<table>.v<N>` on disk, current or not
    * — and counts rows whose `keyCol` appears in `keys`. Returns
    * (directories scanned, matching rows found); erasure is proven only
    * by (n, 0). A logical delete that left the grace copy or any older
    * version in place reports its residue here.
    */
  def residualAudit(spark: SparkSession, tableDir: String, keyCol: String,
      keys: DataFrame): (Long, Long) = {
    val f = fs(spark, tableDir)
    val name = hPath(tableDir).getName
    val parent = hPath(tableDir).getParent
    val versionDirs = scala.util.Try(f.listStatus(parent)).toOption
      .getOrElse(Array.empty).map(_.getPath)
      .filter { p =>
        val suffix = p.getName.stripPrefix(name + ".v")
        p.getName.startsWith(name + ".v") && suffix.nonEmpty &&
          suffix.forall(_.isDigit) &&
          f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      }.map(_.toString)
    val dirs = (if (f.exists(hPath(tableDir))) Seq(tableDir) else Nil) ++
      versionDirs
    if (dirs.isEmpty) return (0L, 0L)
    val k = keys.select(keyCol).distinct().localCheckpoint(true)
    // ONE multi-path scan (all dirs share the table schema), not one
    // job per dir — an audit over a deep un-vacuumed history must not
    // pay O(versions) scheduler round trips
    val residue = spark.read.parquet(dirs: _*)
      .join(broadcast(k), Seq(keyCol), "left_semi").count()
    k.unpersist(blocking = false)
    (dirs.size.toLong, residue)
  }
}
