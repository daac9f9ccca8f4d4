package graft.chat

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ChatStoreSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_store").resolve("t").toString

  test("uploadChat writes the 4-column whatsapp_messages table (S5)") {
    val dir = tmp()
    val n = ChatStore.uploadChat(spark, fixture("chat/fixture1.txt"), dir)
    assert(n == 7)
    val t = spark.read.parquet(dir)
    assert(t.columns.toSeq == Seq("group_name", "date_time", "sender", "message"))
    assert(t.filter(col("sender") === "Bob").count() == 2)
    // A3: the return value is THIS batch's insert count, not cumulative
    assert(ChatStore.uploadChat(spark, fixture("chat/fixture1.txt"), dir) == 7)
    assert(spark.read.parquet(dir).count() == 14)
  }

  test("register/update/delete/list users (S7-S11, F8)") {
    import spark.implicits._
    val dir = tmp()
    val u1 = Seq(("Ada", "ada@x.io"), ("Bo", "bo@x.io")).toDF("name", "email")
    assert(ChatStore.registerUsers(spark, u1, dir) == 2)
    // duplicate email WITHIN a batch also collapses to one row (F8)
    val dupDir = tmp()
    val dupBatch = Seq(("A", "dup@x.io"), ("B", "dup@x.io")).toDF("name", "email")
    assert(ChatStore.registerUsers(spark, dupBatch, dupDir) == 1)
    // duplicate email rejected (F8 anti-join)
    val u2 = Seq(("Ada2", "ada@x.io"), ("Cy", "cy@x.io")).toDF("name", "email")
    assert(ChatStore.registerUsers(spark, u2, dir) == 1)
    assert(ChatStore.listUsers(spark, dir).count() == 3)

    val id = ChatStore.findByEmail(spark, dir, "bo@x.io")
      .select("user_id").collect().head.getString(0)
    ChatStore.updateUser(spark, dir, id, Map("name" -> "Bobby"))
    assert(ChatStore.findByEmail(spark, dir, "bo@x.io")
      .select("name").collect().head.getString(0) == "Bobby")

    ChatStore.deleteUser(spark, dir, id)
    assert(ChatStore.listUsers(spark, dir).count() == 2)
    assert(ChatStore.findByEmail(spark, dir, "bo@x.io").isEmpty)
  }

  test("mergeInto: update/delete/insert clauses commit through the versioned store, idempotent re-apply") {
    import spark.implicits._
    import graft.ops.Merge
    val dir = tmp()
    ChatStore.forceVersionedProtocol = true
    try {
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("k", "name", "bal").write.parquet(dir)
      // CDC batch: update k=1, delete k=2, insert k=9
      val cdc = Seq((1L, "U", 5.0), (2L, "D", 0.0), (9L, "I", 90.0))
        .toDF("k", "op", "amt")
      def applyCdc(): Unit = ChatStore.mergeInto(spark, dir, cdc, Seq("k"),
        matched = Seq(
          Merge.WhenMatched(Some(col("s.op") === "D"), delete = true),
          Merge.WhenMatched(Some(col("s.op") === "U"),
            set = Map("bal" -> lit(15.0)))),
        notMatched = Some(Merge.WhenNotMatched(Some(col("s.op") === "I"),
          values = Map("name" -> lit("nine"), "bal" -> col("s.amt")))))
      applyCdc()
      def state() = ChatStore.readVersion(spark, dir,
          ChatStore.versions(spark, dir).filter(_._2).head._1)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
      val after1 = state()
      assert(after1 == Map(
        1L -> (("a", 15.0)), 3L -> (("c", 30.0)), 9L -> (("nine", 90.0))))
      // idempotent re-apply: a new version commits with IDENTICAL content
      // (the update SET writes the same value; 2 already gone; 9 matches
      // now, hits no clause, passes through)
      val v1 = ChatStore.versions(spark, dir).filter(_._2).head._1
      applyCdc()
      val v2 = ChatStore.versions(spark, dir).filter(_._2).head._1
      assert(v2 == v1 + 1, "re-apply must commit a fresh version")
      assert(state() == after1, "idempotent re-apply changed the table")
    } finally ChatStore.forceVersionedProtocol = false
  }

  test("saveResearchConfig stamps created_at (S6/P8)") {
    import spark.implicits._
    val dir = tmp()
    val cfg = Seq(("study1", "desc", "2023-10-07", "2023-10-09", 50))
      .toDF("name", "description", "start_date", "end_date", "message_limit")
    ChatStore.saveResearchConfig(cfg, dir)
    val got = spark.read.parquet(dir)
    assert(got.count() == 1)
    assert(got.filter(col("created_at").isNotNull).count() == 1)
  }

  test("saveResearchForm keeps the client's free dict (S6 dynamic, SURVEY §1.5)") {
    import spark.implicits._
    val dir = tmp()
    // message_limit arrives as a STRING (the reference stores whatever JSON
    // type the client sent), plus a field the form never declared
    val payload = Seq(Map(
      "name" -> "study2", "message_limit" -> "50",
      "custom_flag" -> "yes")).toDF("payload")
    ChatStore.saveResearchForm(payload, dir)
    val got = spark.read.parquet(dir)
    assert(got.columns.toSet ==
      Set("name", "description", "start_date", "end_date", "message_limit",
        "extras", "created_at"))
    val r = got.collect().head
    assert(r.getAs[String]("name") == "study2")
    assert(r.getAs[String]("message_limit") == "50") // raw string preserved
    assert(r.getAs[String]("description") == null) // absent key -> null
    val extras = r.getAs[Map[String, String]]("extras")
    assert(extras("custom_flag") == "yes") // undeclared field survives
    // heterogeneous second payload appends into the same schema
    ChatStore.saveResearchForm(
      Seq(Map("message_limit" -> "none", "other" -> "1")).toDF("payload"), dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("interrupted copy-on-write swap recovers on next access") {
    import spark.implicits._
    val dir = tmp()
    val u = Seq(("Ada", "ada@x.io"), ("Bo", "bo@x.io")).toDF("name", "email")
    ChatStore.registerUsers(spark, u, dir)

    // simulate a crash between the two renames: table moved aside to .old,
    // .staging holds a complete new version (here: the table minus Bo)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    spark.read.parquet(dir).filter(col("email") =!= "bo@x.io")
      .write.parquet(dir + ".staging")
    fs.rename(p(dir), p(dir + ".old"))
    assert(!fs.exists(p(dir)))

    // next read rolls the swap forward to the staged version
    assert(ChatStore.listUsers(spark, dir).count() == 1)
    assert(!fs.exists(p(dir + ".staging")) && !fs.exists(p(dir + ".old")))

    // crash BEFORE any rename (stale .staging beside a live table): the
    // table is authoritative and the leftover is dropped
    spark.read.parquet(dir).limit(0).write.parquet(dir + ".staging")
    assert(ChatStore.listUsers(spark, dir).count() == 1)
    assert(!fs.exists(p(dir + ".staging")))
  }

  test("version-pointer protocol: rewrites commit without any directory rename") {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    ChatStore.forceVersionedProtocol = true
    try {
      val dir = tmp()
      val u = Seq(("Ada", "ada@x.io"), ("Bo", "bo@x.io"), ("Cy", "cy@x.io"))
        .toDF("name", "email")
      // appends before any rewrite land in the plain dir (no pointer yet)
      assert(ChatStore.registerUsers(spark, u, dir) == 3)
      assert(fs.exists(p(dir)) && !fs.exists(p(dir + ".current")))

      // first rewrite: data goes to .v1, commit is the pointer object, the
      // legacy append dir is absorbed; no .staging/.old ever appears
      val id = ChatStore.findByEmail(spark, dir, "bo@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.deleteUser(spark, dir, id)
      assert(fs.exists(p(dir + ".current")) && fs.exists(p(dir + ".v1")))
      assert(!fs.exists(p(dir)) && !fs.exists(p(dir + ".staging")) && !fs.exists(p(dir + ".old")))
      assert(ChatStore.listUsers(spark, dir).count() == 2)

      // appends after a rewrite follow the pointer into the version dir
      assert(ChatStore.registerUsers(spark,
        Seq(("Di", "di@x.io")).toDF("name", "email"), dir) == 1)
      assert(ChatStore.listUsers(spark, dir).count() == 3)

      // an ORPHAN staged version (crash before the pointer flip) is
      // invisible to readers and clobbered by the next rewrite
      spark.read.parquet(dir + ".v1").limit(0).write.parquet(dir + ".v2")
      assert(ChatStore.listUsers(spark, dir).count() == 3) // still v1

      val id2 = ChatStore.findByEmail(spark, dir, "ada@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.updateUser(spark, dir, id2, Map("name" -> "Ada2"))
      assert(ChatStore.findByEmail(spark, dir, "ada@x.io")
        .select("name").collect().head.getString(0) == "Ada2")
      assert(fs.exists(p(dir + ".v2")) && fs.exists(p(dir + ".v1"))) // v1 = grace copy

      // third rewrite GCs v1, keeps v2 as the new grace copy
      ChatStore.deleteUser(spark, dir, id2)
      assert(!fs.exists(p(dir + ".v1")) && fs.exists(p(dir + ".v2")) && fs.exists(p(dir + ".v3")))
      assert(ChatStore.listUsers(spark, dir).count() == 2)

      // crash-leftover GC: resurrect v1 (as if an old GC died mid-delete);
      // the next rewrite's downward walk removes BOTH stale versions
      spark.read.parquet(dir + ".v3").limit(0).write.parquet(dir + ".v1")
      val id3 = ChatStore.listUsers(spark, dir).select("user_id")
        .collect().head.getString(0)
      ChatStore.updateUser(spark, dir, id3, Map("name" -> "Renamed"))
      assert(fs.exists(p(dir + ".v4")) && fs.exists(p(dir + ".v3"))) // grace
      assert(!fs.exists(p(dir + ".v2")) && !fs.exists(p(dir + ".v1")))

      // drop removes the pointer and every version — nothing left to
      // resurrect stale data from
      ChatStore.dropTable(spark, dir)
      for (suffix <- Seq("", ".current", ".v1", ".v2", ".v3", ".v4", ".staging", ".old"))
        assert(!fs.exists(p(dir + suffix)), s"leftover: $suffix")
      // a fresh table under the same path starts clean
      assert(ChatStore.registerUsers(spark,
        Seq(("New", "new@x.io")).toDF("name", "email"), dir) == 1)
      assert(ChatStore.listUsers(spark, dir).count() == 1)
    } finally ChatStore.forceVersionedProtocol = false
  }

  test("time travel: versions() lists committed versions, readVersion reads any of them") {
    import spark.implicits._
    ChatStore.forceVersionedProtocol = true
    try {
      val dir = tmp()
      val u = Seq(("Ada", "ada@x.io"), ("Bo", "bo@x.io"), ("Cy", "cy@x.io"))
        .toDF("name", "email")
      assert(ChatStore.registerUsers(spark, u, dir) == 3)
      // two rewrites → two committed versions
      val idBo = ChatStore.findByEmail(spark, dir, "bo@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.deleteUser(spark, dir, idBo)
      val idCy = ChatStore.findByEmail(spark, dir, "cy@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.deleteUser(spark, dir, idCy)

      val vs = ChatStore.versions(spark, dir)
      assert(vs.map(_._1) == Seq(1L, 2L))
      assert(vs.filter(_._2).map(_._1) == Seq(2L), s"current flag wrong: $vs")
      // each version is a full readable snapshot
      assert(ChatStore.readVersion(spark, dir, 1L).count() == 2)
      assert(ChatStore.readVersion(spark, dir, 2L).count() == 1)
      // the live read still follows the pointer
      assert(ChatStore.listUsers(spark, dir).count() == 1)
      // nonexistent / never-committed versions fail fast
      intercept[IllegalArgumentException] {
        ChatStore.readVersion(spark, dir, 9L)
      }
    } finally ChatStore.forceVersionedProtocol = false
  }

  test("vacuum: prunes history and orphans, keeps current readable, vacuumed time travel fails fast") {
    import spark.implicits._
    ChatStore.forceVersionedProtocol = true
    try {
      val dir = tmp()
      val u = Seq(("Ada", "ada@x.io"), ("Bo", "bo@x.io"), ("Cy", "cy@x.io"))
        .toDF("name", "email")
      assert(ChatStore.registerUsers(spark, u, dir) == 3)
      val idBo = ChatStore.findByEmail(spark, dir, "bo@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.deleteUser(spark, dir, idBo) // v1
      ChatStore.updateUser(spark, dir,
        ChatStore.findByEmail(spark, dir, "cy@x.io")
          .select("user_id").collect().head.getString(0),
        Map("name" -> "Cyrus")) // v2 (v1 survives as the grace copy)
      // a crashed rewrite's orphan below current: v-dir without _SUCCESS
      // is indistinguishable from real debris (commits are monotonic, so
      // nothing can ever legitimately commit it)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s)
      // fake orphan cannot use v0 (stripPrefix-digit rule needs a dir
      // name the listing walk sees); recreate a deleted-looking v dir
      fs.mkdirs(p(dir + ".v1_orphan_probe"))   // non-version name: ignored
      val vsBefore = ChatStore.versions(spark, dir)
      assert(vsBefore.map(_._1) == Seq(1L, 2L))

      val removed = ChatStore.vacuum(spark, dir, keepLast = 1)
      assert(removed == Seq(1L), s"vacuum removed $removed")
      // current reads unchanged
      assert(ChatStore.listUsers(spark, dir).count() == 2)
      assert(ChatStore.versions(spark, dir).map(_._1) == Seq(2L))
      // vacuumed version fails fast, cleanly
      intercept[IllegalArgumentException] {
        ChatStore.readVersion(spark, dir, 1L)
      }
      // keepLast covering everything is a no-op
      assert(ChatStore.vacuum(spark, dir, keepLast = 5).isEmpty)
      assert(ChatStore.listUsers(spark, dir).count() == 2)
      fs.delete(p(dir + ".v1_orphan_probe"), true)
    } finally ChatStore.forceVersionedProtocol = false
  }

  test("vacuum: never touches versions above the current pointer (in-flight or roll-forward)") {
    import spark.implicits._
    ChatStore.forceVersionedProtocol = true
    try {
      val dir = tmp()
      assert(ChatStore.registerUsers(spark,
        Seq(("Ada", "ada@x.io")).toDF("name", "email"), dir) == 1)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s)
      // simulate a concurrent writer mid-commit: v9 data written (no
      // pointer yet), plus a committed-but-unpointed v8 (crash between
      // _SUCCESS and pointer write)
      fs.mkdirs(p(dir + ".v9"))
      fs.mkdirs(p(dir + ".v8"))
      fs.create(p(dir + ".v8/_SUCCESS"), true).close()
      assert(ChatStore.vacuum(spark, dir, keepLast = 1).isEmpty)
      assert(fs.exists(p(dir + ".v9")), "in-flight version deleted")
      assert(fs.exists(p(dir + ".v8")), "roll-forward candidate deleted")
    } finally ChatStore.forceVersionedProtocol = false
  }

  test("vacuum: above-pointer commits never eat the keepLast quota for usable history") {
    import spark.implicits._
    ChatStore.forceVersionedProtocol = true
    try {
      val dir = tmp()
      val u = Seq(("Ada", "ada@x.io"), ("Bo", "bo@x.io"), ("Cy", "cy@x.io"))
        .toDF("name", "email")
      assert(ChatStore.registerUsers(spark, u, dir) == 3) // v0, pointer=0
      val idBo = ChatStore.findByEmail(spark, dir, "bo@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.deleteUser(spark, dir, idBo) // v1, pointer=1
      ChatStore.updateUser(spark, dir,
        ChatStore.findByEmail(spark, dir, "cy@x.io")
          .select("user_id").collect().head.getString(0),
        Map("name" -> "Cyrus")) // v2, pointer=2
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s)
      // committed-but-unpointed v8 above the current pointer: a crashed
      // commit (died between _SUCCESS and the pointer write). Before the
      // fix, keepLast=2 counted {2, 8} as the kept tail and deleted v1 —
      // the crashed commit silently ate the quota meant for USABLE
      // (<= pointer) history.
      fs.mkdirs(p(dir + ".v8"))
      fs.create(p(dir + ".v8/_SUCCESS"), true).close()
      assert(ChatStore.vacuum(spark, dir, keepLast = 2).isEmpty,
        "keepLast=2 must keep both below-pointer versions (v1, v2)")
      assert(ChatStore.readVersion(spark, dir, 1L).count() == 2)
      assert(fs.exists(p(dir + ".v8")), "above-pointer commit deleted")
      // and the quota still prunes when it genuinely overflows
      assert(ChatStore.vacuum(spark, dir, keepLast = 1) == Seq(1L))
      assert(fs.exists(p(dir + ".v8")))
    } finally ChatStore.forceVersionedProtocol = false
  }

  test("vacuum racing an in-flight overwrite: the commit landing mid-sweep survives intact") {
    import spark.implicits._
    ChatStore.forceVersionedProtocol = true
    try {
      val dir = tmp()
      val u = Seq(("Ada", "ada@x.io"), ("Bo", "bo@x.io"), ("Cy", "cy@x.io"))
        .toDF("name", "email")
      assert(ChatStore.registerUsers(spark, u, dir) == 3) // v0
      val idBo = ChatStore.findByEmail(spark, dir, "bo@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.deleteUser(spark, dir, idBo) // v1, pointer=1
      // interleaving: vacuum captures pointer=1 and the committed list,
      // THEN (via the test seam) a concurrent writer commits v2 and
      // advances the pointer, THEN vacuum's sweep lists the directory —
      // which now contains the new version. The sweep works off the
      // STALE pointer, so v2 is "above current" and must survive, data
      // and pointer both.
      var raced = false
      ChatStore.vacuumAfterListHook = () => {
        ChatStore.updateUser(spark, dir,
          ChatStore.findByEmail(spark, dir, "cy@x.io")
            .select("user_id").collect().head.getString(0),
          Map("name" -> "Cyrus")) // commits v2, pointer=2
        raced = true
      }
      val removed = try ChatStore.vacuum(spark, dir, keepLast = 1)
        finally ChatStore.vacuumAfterListHook = () => ()
      assert(raced)
      // v0 was legitimately prunable under the stale view (pointer=1,
      // keepLast=1); the race outcome under test is v2's survival
      assert(!removed.contains(2L), s"racing commit swept: $removed")
      val after = ChatStore.listUsers(spark, dir)
      assert(after.count() == 2, "reader saw a partial/missing frame")
      assert(after.filter($"name" === "Cyrus").count() == 1,
        "racing commit's content lost")
      assert(ChatStore.versions(spark, dir).map(_._1).contains(2L))
    } finally {
      ChatStore.vacuumAfterListHook = () => ()
      ChatStore.forceVersionedProtocol = false
    }
  }

  test("two writers racing the same commit: the loser fails cleanly, the " +
    "winner's version is never clobbered, a re-run lands cleanly") {
    import spark.implicits._
    ChatStore.forceVersionedProtocol = true
    try {
      val dir = tmp()
      val u = Seq(("Ada", "ada@x.io"), ("Bo", "bo@x.io"), ("Cy", "cy@x.io"))
        .toDF("name", "email")
      assert(ChatStore.registerUsers(spark, u, dir) == 3)
      val idAda = ChatStore.findByEmail(spark, dir, "ada@x.io")
        .select("user_id").collect().head.getString(0)
      val idBo = ChatStore.findByEmail(spark, dir, "bo@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.updateUser(spark, dir, idAda, Map("name" -> "Ada1")) // v1
      // interleaving: the slow writer reads current=1, THEN (via the
      // seam) a fast writer commits v2 and advances the pointer, THEN
      // the slow writer tries to claim v2 — it must fail cleanly, never
      // overwrite the fast writer's committed v2 files.
      var raced = false
      ChatStore.overwriteAfterVersionReadHook = () => {
        if (!raced) {
          raced = true // the hook's own commit must not re-enter itself
          ChatStore.updateUser(spark, dir, idBo, Map("name" -> "BoFast"))
        }
      }
      val err = try {
        intercept[java.util.ConcurrentModificationException] {
          ChatStore.updateUser(spark, dir, idAda, Map("name" -> "AdaSlow"))
        }
      } finally ChatStore.overwriteAfterVersionReadHook = () => ()
      assert(raced)
      assert(err.getMessage.contains("conflict"))
      // the winner's commit is intact and current; no blend, no loser data
      val after = ChatStore.listUsers(spark, dir).collect()
        .map(_.getString(1)).toSet
      assert(after == Set("Ada1", "BoFast", "Cy"),
        s"winner clobbered or loser leaked: $after")
      assert(ChatStore.versions(spark, dir).map(_._1).max == 2L)
      // the loser re-runs against the winner's state and lands as v3
      ChatStore.updateUser(spark, dir, idAda, Map("name" -> "AdaSlow"))
      val retry = ChatStore.listUsers(spark, dir).collect()
        .map(_.getString(1)).toSet
      assert(retry == Set("AdaSlow", "BoFast", "Cy"))
      assert(ChatStore.versions(spark, dir).map(_._1).max == 3L)
      // no claim debris left behind by the committed writers
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val parent = new org.apache.hadoop.fs.Path(dir).getParent
      val claims = fs.listStatus(parent).map(_.getPath.getName)
        .filter(n => n.startsWith(new org.apache.hadoop.fs.Path(dir).getName)
          && n.endsWith(".claim"))
      assert(claims.isEmpty, s"claim debris: ${claims.toSeq}")
    } finally {
      ChatStore.overwriteAfterVersionReadHook = () => ()
      ChatStore.forceVersionedProtocol = false
    }
  }

  test("a crashed writer's stale claim is swept; a fresh claim blocks") {
    import spark.implicits._
    ChatStore.forceVersionedProtocol = true
    val oldStale = ChatStore.claimStaleMs
    try {
      val dir = tmp()
      val u = Seq(("Ada", "ada@x.io")).toDF("name", "email")
      ChatStore.registerUsers(spark, u, dir)
      val id = ChatStore.findByEmail(spark, dir, "ada@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.updateUser(spark, dir, id, Map("name" -> "A1")) // v1
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      // a crashed writer claimed v2 but never completed it
      val claim = new org.apache.hadoop.fs.Path(dir + ".v2.claim")
      fs.create(claim, false).close()
      // fresh claim (default threshold): the next writer must back off
      intercept[java.util.ConcurrentModificationException] {
        ChatStore.updateUser(spark, dir, id, Map("name" -> "A2"))
      }
      // stale claim (threshold 0): swept, and the commit proceeds
      ChatStore.claimStaleMs = 0L
      ChatStore.updateUser(spark, dir, id, Map("name" -> "A2"))
      assert(ChatStore.findByEmail(spark, dir, "ada@x.io")
        .select("name").collect().head.getString(0) == "A2")
      assert(ChatStore.versions(spark, dir).map(_._1).max == 2L)
      // a writer that died AFTER its data write (complete dir with
      // _SUCCESS) but BEFORE the pointer publish must also be swept
      // once stale — the pointer write IS the commit, and requiring an
      // incomplete dir here would wedge the table forever
      val orphan = new org.apache.hadoop.fs.Path(dir + ".v3")
      spark.range(1).toDF("x").write.parquet(orphan.toString)
      assert(fs.exists(new org.apache.hadoop.fs.Path(orphan, "_SUCCESS")))
      fs.create(new org.apache.hadoop.fs.Path(dir + ".v3.claim"), false).close()
      ChatStore.updateUser(spark, dir, id, Map("name" -> "A3"))
      assert(ChatStore.findByEmail(spark, dir, "ada@x.io")
        .select("name").collect().head.getString(0) == "A3")
      assert(ChatStore.versions(spark, dir).map(_._1).max == 3L)
      assert(ChatStore.listUsers(spark, dir).count() == 1,
        "orphan commit's content leaked into the committed v3")
    } finally {
      ChatStore.claimStaleMs = oldStale
      ChatStore.forceVersionedProtocol = false
    }
  }

  test("commitKeepLast retention: five commits at keepLast=4 leave a " +
    "4-deep time-travel window; changeFeed diffs across a 3-version gap; " +
    "forgetKeys still proves physical erasure") {
    import spark.implicits._
    ChatStore.forceVersionedProtocol = true
    val oldKeep = ChatStore.commitKeepLast
    try {
      ChatStore.commitKeepLast = 4
      val dir = tmp()
      def snap(rows: (Long, String)*) = rows.toSeq.toDF("k", "s")
      ChatStore.writeVersioned(snap(1L -> "a", 2L -> "b", 3L -> "c"), dir) // v1
      ChatStore.writeVersioned(
        snap(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d"), dir) // v2: upd 2, ins 4
      ChatStore.writeVersioned(snap(1L -> "a", 2L -> "b2", 4L -> "d"), dir) // v3: del 3
      ChatStore.writeVersioned(snap(1L -> "a4", 2L -> "b2", 4L -> "d"), dir) // v4: upd 1
      ChatStore.writeVersioned(
        snap(1L -> "a4", 2L -> "b2", 4L -> "d", 5L -> "e"), dir) // v5: ins 5
      assert(ChatStore.versions(spark, dir).map(_._1) == Seq(2L, 3L, 4L, 5L),
        "keepLast=4 must retain exactly v2..v5")
      // the cumulative diff across the retained 3-version gap equals the
      // replayed per-commit changes composed: upd 1, del 3, ins 5 (key 2
      // and 4 are unchanged between v2 and v5)
      val feed = ChatStore.changeFeed(spark, dir, 2L, 5L, Seq("k"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(feed == Set(("update", 1L), ("delete", 3L), ("insert", 5L)),
        s"changeFeed v2->v5 drifted: $feed")
      assert(ChatStore.readVersion(spark, dir, 2L).count() == 4)
      intercept[IllegalArgumentException] {
        ChatStore.readVersion(spark, dir, 1L) // GC'd below the window
      }
      // physical forget is unaffected by the deeper retention: its own
      // vacuum(keepLast=1) collapses the window before the audit
      ChatStore.forgetKeys(spark, dir, "k", Seq(2L).toDF("k"))
      val (nDirs, residue) =
        ChatStore.residualAudit(spark, dir, "k", Seq(2L).toDF("k"))
      assert(nDirs >= 1 && residue == 0,
        s"forgotten key survived in $residue rows across $nDirs dirs")
    } finally {
      ChatStore.commitKeepLast = oldKeep
      ChatStore.forceVersionedProtocol = false
    }
  }

  test("stale-claim sweep never deletes a COMMITTED version dir: a claim " +
    "orphaned by a crash-after-publish is swept without touching its data") {
    import spark.implicits._
    ChatStore.forceVersionedProtocol = true
    val oldStale = ChatStore.claimStaleMs
    try {
      val dir = tmp()
      val u = Seq(("Ada", "ada@x.io"), ("Bo", "bo@x.io")).toDF("name", "email")
      ChatStore.registerUsers(spark, u, dir)
      val idAda = ChatStore.findByEmail(spark, dir, "ada@x.io")
        .select("user_id").collect().head.getString(0)
      val idBo = ChatStore.findByEmail(spark, dir, "bo@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.updateUser(spark, dir, idAda, Map("name" -> "Ada1")) // v1
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      // interleaving: the slow writer reads current=1; via the seam a
      // fast writer commits v2 (pointer PUBLISHED — v2 is committed
      // data) and then "crashes" before its claim cleanup, leaving a
      // v2 claim behind. With staleness 0 the slow writer's sweep fires
      // immediately — the regression under test is that it must re-read
      // the pointer before the destructive delete and leave the
      // committed v2 directory alone (the pre-fix sweep deleted it).
      ChatStore.claimStaleMs = 0L
      var raced = false
      ChatStore.overwriteAfterVersionReadHook = () => {
        if (!raced) {
          raced = true
          ChatStore.updateUser(spark, dir, idBo, Map("name" -> "BoFast")) // v2
          fs.create(new org.apache.hadoop.fs.Path(dir + ".v2.claim"), false)
            .close() // crash-after-publish debris
        }
      }
      val err = try {
        intercept[java.util.ConcurrentModificationException] {
          ChatStore.updateUser(spark, dir, idAda, Map("name" -> "AdaSlow"))
        }
      } finally ChatStore.overwriteAfterVersionReadHook = () => ()
      assert(raced)
      assert(err.getMessage.contains("conflict"))
      // the committed v2 survived the sweep: pointer serves it, data intact
      val after = ChatStore.listUsers(spark, dir).collect()
        .map(_.getString(1)).toSet
      assert(after == Set("Ada1", "BoFast"),
        s"sweep destroyed or blended the committed v2: $after")
      assert(ChatStore.versions(spark, dir).map(_._1).max == 2L)
      // a crashed SWEEPER's tombstone is unconditionally swept by the
      // next commit's GC
      fs.create(new org.apache.hadoop.fs.Path(
        dir + ".v1.claim.sweep.deadbeef"), false).close()
      ChatStore.updateUser(spark, dir, idAda, Map("name" -> "Ada3")) // v3
      val parent = new org.apache.hadoop.fs.Path(dir).getParent
      val debris = fs.listStatus(parent).map(_.getPath.getName)
        .filter(n => n.contains(".claim"))
      assert(debris.isEmpty, s"claim/tombstone debris: ${debris.toSeq}")
    } finally {
      ChatStore.claimStaleMs = oldStale
      ChatStore.forceVersionedProtocol = false
    }
  }

  test("forgetKeys erases PHYSICALLY across the three chat tables: no " +
    "surviving version dir retains a forgotten key") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_gdpr_")
    def t(n: String) = root.resolve(n).toString
    // three tables under the version-pointer protocol, with history:
    // two commits each so a grace copy + vacuumable history exist
    val msgs = Seq(("g1", "1.1.2024", "Dana", "hi"),
      ("g1", "1.1.2024", "Omer", "yo"), ("g2", "2.1.2024", "Dana", "x"),
      ("g2", "2.1.2024", "Noa", "ok"))
      .toDF("group_name", "date_time", "sender", "message")
    ChatStore.writeVersioned(msgs, t("whatsapp_messages"))
    ChatStore.writeVersioned(msgs, t("whatsapp_messages")) // v2 + grace v1
    val users = Seq(("u1", "Dana", "dana@x.io"), ("u2", "Omer", "omer@x.io"),
      ("u3", "Noa", "noa@x.io")).toDF("user_id", "name", "email")
    ChatStore.writeVersioned(users, t("users"))
    ChatStore.writeVersioned(users, t("users"))
    val cfgs = Seq(("Dana", "study-a"), ("Noa", "study-b"))
      .toDF("owner", "name")
    ChatStore.writeVersioned(cfgs, t("research_configs"))
    ChatStore.writeVersioned(cfgs, t("research_configs"))
    // forget Dana everywhere (sender / name / owner key per table)
    val fSender = Seq("Dana").toDF("sender")
    val fName = Seq("Dana").toDF("name")
    val fOwner = Seq("Dana").toDF("owner")
    ChatStore.forgetKeys(spark, t("whatsapp_messages"), "sender", fSender)
    ChatStore.forgetKeys(spark, t("users"), "name", fName)
    ChatStore.forgetKeys(spark, t("research_configs"), "owner", fOwner)
    // logical state correct
    assert(ChatStore.readCurrent(spark, t("whatsapp_messages")).count() == 2)
    assert(ChatStore.readCurrent(spark, t("users")).count() == 2)
    assert(ChatStore.readCurrent(spark, t("research_configs")).count() == 1)
    // PHYSICAL proof: every surviving dir of every table scanned, zero
    // forgotten rows anywhere; history vacuumed to the current dir only
    val audits = Seq(
      ChatStore.residualAudit(spark, t("whatsapp_messages"), "sender", fSender),
      ChatStore.residualAudit(spark, t("users"), "name", fName),
      ChatStore.residualAudit(spark, t("research_configs"), "owner", fOwner))
    audits.foreach { case (nDirs, residue) =>
      assert(residue == 0L, s"forgotten rows survive physically: $audits")
      assert(nDirs == 1L, s"history not vacuumed to current: $audits")
    }
    // and the audit is a REAL detector: before-vacuum state would flag.
    // Re-insert + merge-delete WITHOUT vacuum: grace copy keeps the row
    val again = Seq(("g1", "1.1.2024", "Dana", "back"))
      .toDF("group_name", "date_time", "sender", "message")
    ChatStore.writeVersioned(
      ChatStore.readCurrent(spark, t("whatsapp_messages")).unionByName(again),
      t("whatsapp_messages"))
    ChatStore.mergeInto(spark, t("whatsapp_messages"), fSender,
      Seq("sender"), matched = Seq(graft.ops.Merge.WhenMatched(delete = true)))
    val (_, residueNoVacuum) = ChatStore.residualAudit(
      spark, t("whatsapp_messages"), "sender", fSender)
    assert(residueNoVacuum > 0L,
      "audit failed to detect the grace copy's surviving rows")
    ChatStore.vacuum(spark, t("whatsapp_messages"), keepLast = 1)
    val (_, residueAfter) = ChatStore.residualAudit(
      spark, t("whatsapp_messages"), "sender", fSender)
    assert(residueAfter == 0L)
  }

  test("changeFeed: insert/delete/update classified null-safely, " +
    "unchanged rows never leak into the feed") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_")
    val tbl = root.resolve("t").toString
    val v1 = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option("c")), (4L, Option("d"))).toDF("k", "v")
    ChatStore.writeVersioned(v1, tbl)
    // null -> value and value -> null must BOTH classify as update (a
    // non-null-safe compare drops them); 4 unchanged; 1 deleted; 5 new
    val v2 = Seq((2L, Option("x")), (3L, Option.empty[String]),
      (4L, Option("d")), (5L, Option("e"))).toDF("k", "v")
    ChatStore.writeVersioned(v2, tbl)
    val feed = ChatStore.changeFeed(spark, tbl, 1L, 2L, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(feed == Set("delete" -> 1L, "update" -> 2L, "update" -> 3L,
      "insert" -> 5L), s"got $feed")
  }

  test("torn/corrupt version pointer: reads recover via the highest complete version") {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    ChatStore.forceVersionedProtocol = true
    try {
      val dir = tmp()
      val u = Seq(("Ada", "ada@x.io"), ("Bo", "bo@x.io")).toDF("name", "email")
      assert(ChatStore.registerUsers(spark, u, dir) == 2)
      val id = ChatStore.findByEmail(spark, dir, "bo@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.deleteUser(spark, dir, id) // -> .v1 + pointer
      // local-fs pointer commits go through temp+rename: no tmp leftover
      assert(!fs.exists(p(dir + ".current.tmp")))

      // simulate a reader catching the pointer mid-truncate (or a partial
      // object-store copy): empty file, then garbage — both unparseable
      for (junk <- Seq("", "not-a-number\n")) {
        val out = fs.create(p(dir + ".current"), true)
        try out.write(junk.getBytes("UTF-8")) finally out.close()
        // read must NOT throw NumberFormatException; falls back to .v1
        assert(ChatStore.listUsers(spark, dir).count() == 1)
      }

      // the next rewrite re-derives the version from the fallback and
      // repairs the pointer on its commit
      val id2 = ChatStore.findByEmail(spark, dir, "ada@x.io")
        .select("user_id").collect().head.getString(0)
      ChatStore.updateUser(spark, dir, id2, Map("name" -> "Ada2"))
      assert(fs.exists(p(dir + ".v2")))
      assert(ChatStore.findByEmail(spark, dir, "ada@x.io")
        .select("name").collect().head.getString(0) == "Ada2")
      // pointer is healthy again: corrupting nothing, plain read works
      assert(ChatStore.listUsers(spark, dir).count() == 1)
    } finally ChatStore.forceVersionedProtocol = false
  }
}
