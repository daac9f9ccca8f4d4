package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ZoneMap]]: zone-routed serving equals the full-scan filter, pruning
  * is real (and visible), CDC rewrites only the touched buckets (mtime
  * pins), out-of-range delta keys clamp to the edge buckets, and a
  * commit killed before the pointer flip leaves the served artifact
  * byte-identical.
  */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("zm_spec_").toString

  private def table(n: Int) =
    (0 until n).map(i => (i.toLong, s"p$i", (i % 7).toLong))
      .toDF("k", "payload", "grp")

  test("rangeQuery equals the full-scan filter; selection is pruned") {
    val dir = freshDir()
    ZoneMap.build(table(1000), "k", dir, nBuckets = 16)
    val served = ZoneMap.rangeQuery(spark, dir, "k", 100, 199)
      .select("k", "payload", "grp").collect().map(_.toString).sorted
    val expected = table(1000).filter($"k".between(100, 199))
      .collect().map(_.toString).sorted
    assert(served.toSeq == expected.toSeq)
    val (hit, total) = ZoneMap.prunedSelection(spark, dir, 100, 199)
    assert(total == 16, s"expected 16 live buckets, got $total")
    assert(hit <= 3, s"a 10% range must route to <=3 of 16 buckets, hit $hit")
  }

  test("changeFeed equates NULL merge keys (null-safe join): a changed " +
    "NULL-key group is ONE update, not a delete plus an insert") {
    val dir = freshDir()
    val v1 = Seq((1L, Some("m1"), "a"), (2L, None, "b"), (3L, Some("m3"), "c"))
      .toDF("k", "mk", "x")
    ZoneMap.build(v1, "k", dir, nBuckets = 4)
    // v2: the NULL-mk group's payload changes
    ZoneMap.update(spark,  dir,
      Seq((2L, None: Option[String], "B")).toDF("k", "mk", "x"),
      "k", Seq("k", "mk"))
    val feed = ZoneMap.changeFeed(spark, dir, 1L, 2L, Seq("k", "mk"))
      .select("k", "op").as[(Long, String)].collect().toSeq.sorted
    assert(feed == Seq((2L, "update")),
      s"NULL merge key must diff as one update, got $feed")
  }

  private def skewed(n: Int) =
    (0 until n).map { i =>
      val k = if (i % 10 < 7) (i % 50).toLong else i.toLong
      (k, s"p$i", (i % 7).toLong, i.toLong)
    }.toDF("k", "payload", "grp", "rowid")

  test("equi-depth bounds the max-bucket share under a zipf-ish key " +
    "where fixed-width piles the mass") {
    def maxShare(dir: String): Double = {
      val rows = ZoneMap.readZones(spark, dir)
        .select("n_rows").collect().map(_.getLong(0))
      rows.max.toDouble / rows.sum
    }
    val fixedDir = freshDir()
    ZoneMap.build(skewed(10000), "k", fixedDir, nBuckets = 16)
    val depthDir = freshDir()
    ZoneMap.build(skewed(10000), "k", depthDir, nBuckets = 16,
      equiDepth = true)
    val (fs, ds) = (maxShare(fixedDir), maxShare(depthDir))
    // 70% of rows live in [0, 50) ⊂ one fixed-width 16th of [0, 10000)
    assert(fs > 0.5, s"fixture lost its skew (fixed max share $fs)")
    assert(ds < 0.15,
      s"equi-depth must spread the hot range (max share $ds vs ideal " +
        s"${1.0 / 16})")
  }

  test("equi-depth serve + CDC digest equal the scan replay; routing " +
    "stays manifest-driven") {
    val dir = freshDir()
    ZoneMap.build(skewed(10000), "k", dir, nBuckets = 16, equiDepth = true)
    def want(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      f(skewed(10000)).collect().map(_.toString).sorted.toSeq
    assert(ZoneMap.rangeQuery(spark, dir, "k", 10, 30)
      .select("k", "payload", "grp", "rowid")
      .collect().map(_.toString).sorted.toSeq ==
      want(_.filter($"k".between(10, 30))))
    // hot range routes to a strict subset of buckets even though the
    // key domain is tiny — the explicit bounds split the hot values
    val (hit, total) = ZoneMap.prunedSelection(spark, dir, 10, 30)
    assert(hit < total, s"equi-depth routing must prune ($hit of $total)")
    // CDC through the stored bounds: replace the k=33 group's payloads
    val delta = skewed(10000).filter($"k" === 33L)
      .withColumn("payload", concat(lit("u"), $"rowid"))
    ZoneMap.update(spark, dir, delta, "k", Seq("rowid"))
    val got = ZoneMap.rangeQuery(spark, dir, "k", 33, 33)
      .select("payload").as[String].collect().sorted.toSeq
    val exp = skewed(10000).filter($"k" === 33L)
      .select(concat(lit("u"), $"rowid")).as[String]
      .collect().sorted.toSeq
    assert(got == exp, "bounds-mode CDC must route and replace exactly")
  }

  test("TIMESTAMP-keyed layout: build, zones and serve run on the " +
    "epoch-micros integral form") {
    val dir = freshDir()
    val df = (0 until 500).map { i =>
      (java.sql.Timestamp.from(java.time.LocalDateTime
        .of(2024, 1, 1, 0, 0).plusHours(i)
        .toInstant(java.time.ZoneOffset.UTC)), i.toLong)
    }.toDF("ts", "x")
    ZoneMap.build(df, "ts", dir, nBuckets = 8)
    def micros(s: String) =
      java.time.LocalDateTime.parse(s).toInstant(
        java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val served = ZoneMap.rangeQuery(spark, dir, "ts",
        micros("2024-01-05T00:00"), micros("2024-01-07T00:00"))
      .agg(count(lit(1)), sum($"x")).head()
    // hours 96..144 inclusive = 49 rows
    assert(served.getLong(0) == 49L, s"got ${served.getLong(0)} rows")
    assert(served.getLong(1) == (96L to 144L).sum)
    val (hit, total) = ZoneMap.prunedSelection(spark, dir,
      micros("2024-01-05T00:00"), micros("2024-01-07T00:00"))
    assert(hit < total, s"timestamp routing must prune ($hit of $total)")
  }

  test("asOfVersion serves the pre-CDC bytes through the old manifest; " +
    "a version outside the retention window raises") {
    val dir = freshDir()
    ZoneMap.build(table(200), "k", dir, nBuckets = 8) // v1
    val before = ZoneMap.rangeQuery(spark, dir, "k", 0, 199)
      .select("k", "payload").collect().map(_.toString).sorted.toSeq
    ZoneMap.update(spark, dir, // v2: rewrite k=10's payload
      Seq((10L, "NEW", 3L)).toDF("k", "payload", "grp"), "k", Seq("k"))
    // v1 time travel = exactly the pre-update content; current = post
    val atV1 = ZoneMap.rangeQuery(spark, dir, "k", 0, 199,
        asOfVersion = Some(1L))
      .select("k", "payload").collect().map(_.toString).sorted.toSeq
    assert(atV1 == before, "as-of read must serve the old version's bytes")
    assert(ZoneMap.rangeQuery(spark, dir, "k", 10, 10)
      .select("payload").as[String].collect().toSeq == Seq("NEW"))
    // v3 pushes v1 out of the default keepLast=2 window -> clean error
    ZoneMap.update(spark, dir,
      Seq((11L, "X", 4L)).toDF("k", "payload", "grp"), "k", Seq("k"))
    intercept[IllegalStateException] {
      ZoneMap.rangeQuery(spark, dir, "k", 0, 199, asOfVersion = Some(1L))
        .collect()
    }
    // ...but v2 is the grace manifest and still serves
    assert(ZoneMap.rangeQuery(spark, dir, "k", 10, 10,
        asOfVersion = Some(2L))
      .select("payload").as[String].collect().toSeq == Seq("NEW"))
  }

  test("changeFeed classifies insert/update/delete between versions and " +
    "reads only the generation-changed buckets") {
    val dir = freshDir()
    ZoneMap.build(table(200), "k", dir, nBuckets = 8) // v1
    // v2: replace k=10's payload, add a brand-new key
    ZoneMap.update(spark, dir,
      Seq((10L, "NEW", 3L), (150L, "ADDED", 1L))
        .toDF("k", "payload", "grp"), "k", Seq("k"), keepLast = 3)
    // v3: delete k=11
    ZoneMap.delete(spark, dir, "k", Seq(Tuple1(11L)).toDF("k"), Seq("k"),
      keepLast = 3)
    val f12 = ZoneMap.changeFeed(spark, dir, 1L, 2L, Seq("k"))
      .as[(Long, String)].collect().toSet
    // k=150 already existed (payload p150) and was REPLACED -> update;
    // k=10 likewise; nothing inserted or deleted
    assert(f12 == Set((10L, "update"), (150L, "update")))
    val f23 = ZoneMap.changeFeed(spark, dir, 2L, 3L, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(f23 == Set((11L, "delete")))
    // footprint: only the buckets those keys route to differ (8 buckets
    // of 200 keys -> k=10/11 share bucket 0, k=150 is bucket 6)
    assert(ZoneMap.changedPartitions(spark, dir, 1L, 2L).size <= 2)
    assert(ZoneMap.changedPartitions(spark, dir, 2L, 3L).size == 1)
    // a true INSERT: v4 adds a key beyond the built range (clamps to
    // the edge bucket but is genuinely new)
    ZoneMap.update(spark, dir,
      Seq((500L, "FRESH", 0L)).toDF("k", "payload", "grp"), "k", Seq("k"),
      keepLast = 3)
    val f34 = ZoneMap.changeFeed(spark, dir, 3L, 4L, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(f34 == Set((500L, "insert")))
    // and the composed diff across three commits still reads deltas only
    val f14 = ZoneMap.changeFeed(spark, dir, 2L, 4L, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(f14 == Set((11L, "delete"), (500L, "insert")))
  }

  test("zone stats beat boundary math on sparse buckets") {
    // keys cluster in two islands; the static boundary span covers the
    // hole, the per-bucket min/max does not
    val df = ((0 until 100) ++ (900 until 1000)).map(_.toLong)
      .toDF("k").withColumn("payload", lit("x")).withColumn("grp", lit(0L))
    val dir = freshDir()
    ZoneMap.build(df, "k", dir, nBuckets = 8)
    // the hole [300, 600] overlaps several boundary ranges but ZERO
    // actual zones
    val (hit, _) = ZoneMap.prunedSelection(spark, dir, 300, 600)
    assert(hit == 0, s"hole must prune to zero buckets, hit $hit")
    assert(ZoneMap.rangeQuery(spark, dir, "k", 300, 600).count() == 0)
  }

  test("update rewrites only touched buckets; untouched mtimes pinned") {
    val dir = freshDir()
    ZoneMap.build(table(1000), "k", dir, nBuckets = 16)
    def paths(): Map[String, String] = {
      val (_, m) = VersionedIndex.readManifest(spark, dir)
      VersionedIndex.partitionPaths(dir, m, "data")
    }
    def mtimes(ps: Map[String, String]): Map[String, Long] = {
      val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      ps.map { case (pd, p) =>
        pd -> f.getFileStatus(new org.apache.hadoop.fs.Path(p))
          .getModificationTime }
    }
    val before = paths()
    val mtBefore = mtimes(before)
    // delta touches keys 100..119 — one or two buckets of sixteen
    val delta = (100 until 120).map(i => (i.toLong, s"NEW$i", 99L))
      .toDF("k", "payload", "grp")
    ZoneMap.update(spark, dir, delta, "k", Seq("k"))
    val after = paths()
    val changed = after.filter { case (pd, p) => before.get(pd) != Some(p) }
    assert(changed.nonEmpty && changed.size <= 2,
      s"delta of 20 adjacent keys must rewrite <=2 buckets, rewrote " +
        s"${changed.keys.toSeq.sorted}")
    val untouched = after.keySet -- changed.keySet
    val mtAfter = mtimes(after)
    untouched.foreach { pd =>
      assert(mtAfter(pd) == mtBefore(pd), s"untouched $pd was rewritten")
    }
    // served content = replayed merge
    val served = ZoneMap.rangeQuery(spark, dir, "k", 90, 130)
      .select("k", "payload").as[(Long, String)].collect().toMap
    (100 until 120).foreach(i => assert(served(i.toLong) == s"NEW$i"))
    assert(served(95L) == "p95" && served(125L) == "p125")
    // zones spliced: the touched bucket's stats reflect the merge
    val zoneSum = ZoneMap.readZones(spark, dir)
      .agg(sum("n_rows")).head().getLong(0)
    assert(zoneSum == 1000L, s"upsert must not change row count: $zoneSum")
  }

  test("out-of-range delta keys clamp to the edge buckets and serve") {
    val dir = freshDir()
    ZoneMap.build(table(100), "k", dir, nBuckets = 4)
    val delta = Seq((-5L, "low", 0L), (500L, "high", 0L))
      .toDF("k", "payload", "grp")
    ZoneMap.update(spark, dir, delta, "k", Seq("k"))
    val low = ZoneMap.rangeQuery(spark, dir, "k", -10, -1)
      .select("payload").as[String].collect()
    val high = ZoneMap.rangeQuery(spark, dir, "k", 400, 600)
      .select("payload").as[String].collect()
    assert(low.toSeq == Seq("low") && high.toSeq == Seq("high"))
    // clamped rows widen the edge zones, so routing still finds them
    val z = ZoneMap.readZones(spark, dir)
      .agg(min("zmin"), max("zmax")).head()
    assert(z.getLong(0) == -5L && z.getLong(1) == 500L)
  }

  test("empty CDC delta is a clean no-op (foreachBatch hands these)") {
    val dir = freshDir()
    ZoneMap.build(table(100), "k", dir, nBuckets = 8)
    val (v0, _) = VersionedIndex.readManifest(spark, dir)
    // regression: repartition(0, …) threw on the empty routed delta,
    // failing the streaming CDC query instead of no-opping
    ZoneMap.update(spark, dir, table(100).filter($"k" < 0), "k", Seq("k"))
    val (v1, _) = VersionedIndex.readManifest(spark, dir)
    assert(v1 == v0, "an empty delta must not publish a new version")
    assert(ZoneMap.rangeQuery(spark, dir, "k", 0, 99).count() == 100)
  }

  test("bloom candidates cover every true bucket and prune most others") {
    // secondary column v concentrates each value in FEW buckets of the
    // k-clustered layout: v = k div 100 lives in exactly the buckets
    // covering [v*100, v*100+99]
    val df = (0 until 1000).map(i => (i.toLong, i.toLong / 100, s"p$i"))
      .toDF("k", "v", "payload")
    val dir = freshDir()
    ZoneMap.build(df, "k", dir, nBuckets = 16, bloomCol = Some("v"))
    val cand = ZoneMap.bloomCandidates(spark, dir, 3L)
    // v=3 lives in keys 300..399 → buckets 300/63..399/63 = {4,5,6}
    val truth = (300 until 400).map(_ / 63).distinct.sorted
    assert(truth.forall(cand.contains),
      s"bloom lost a true bucket: true=$truth cand=$cand")
    assert(cand.size <= truth.size + 2,
      s"bloom passed too many false buckets: true=$truth cand=$cand")
    val served = ZoneMap.pointLookup(spark, dir, "v", 3L)
      .select("k").as[Long].collect().sorted
    assert(served.toSeq == (300L until 400L))
  }

  test("CDC rebuilds the touched buckets' blooms; lookups stay exact") {
    val df = (0 until 1000).map(i => (i.toLong, i.toLong / 100, s"p$i"))
      .toDF("k", "v", "payload")
    val dir = freshDir()
    ZoneMap.build(df, "k", dir, nBuckets = 16, bloomCol = Some("v"))
    // move keys 350..359 to a brand-new secondary value 777
    val delta = (350 until 360).map(i => (i.toLong, 777L, s"moved$i"))
      .toDF("k", "v", "payload")
    ZoneMap.update(spark, dir, delta, "k", Seq("k"))
    val c777 = ZoneMap.bloomCandidates(spark, dir, 777L)
    assert(c777.nonEmpty, "new value must pass its bucket's rebuilt bloom")
    val served = ZoneMap.pointLookup(spark, dir, "v", 777L)
      .select("k").as[Long].collect().sorted
    assert(served.toSeq == (350L until 360L))
    // untouched buckets' blooms survive: v=0 (keys 0..99) still routes
    val served0 = ZoneMap.pointLookup(spark, dir, "v", 0L).count()
    assert(served0 == 100L)
  }

  test("delete retracts exactly the keyed rows; emptied buckets drop " +
    "out of the manifest and zones resplice") {
    val dir = freshDir()
    ZoneMap.build(table(1000), "k", dir, nBuckets = 16) // step 63
    // ALL of bucket 0 (k 0..62) plus one interior row elsewhere
    val keys = ((0 until 63) :+ 500).map(_.toLong).toDF("k")
    ZoneMap.delete(spark, dir, "k", keys, Seq("k"))
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    assert(!m.parts("data").contains("zbucket=0"),
      "a fully-deleted bucket must leave the manifest")
    val served = ZoneMap.rangeQuery(spark, dir, "k", 0, 999)
      .select("k").as[Long].collect().sorted.toSeq
    assert(served == (63 until 1000).map(_.toLong).filterNot(_ == 500L))
    val z = ZoneMap.readZones(spark, dir)
    assert(z.filter($"zbucket" === 0).count() == 0,
      "the emptied bucket must have no zone row")
    assert(z.agg(sum("n_rows")).head().getLong(0) == 936L)
  }

  test("delete by a NON-key column visits buckets but stays exact") {
    val dir = freshDir()
    ZoneMap.build(table(100), "k", dir, nBuckets = 4)
    ZoneMap.delete(spark, dir, "k",
      Seq(3L).toDF("grp"), Seq("grp")) // grp = k % 7
    val served = ZoneMap.rangeQuery(spark, dir, "k", 0, 99)
    assert(served.count() == 100 - 14) // 14 keys with k % 7 == 3
    assert(served.filter($"grp" === 3L).count() == 0)
  }

  test("residualAudit proves physical erasure only after sweepGrace") {
    val dir = freshDir()
    ZoneMap.build(table(500), "k", dir, nBuckets = 8)
    val keys = (100 until 140).map(_.toLong).toDF("k")
    ZoneMap.delete(spark, dir, "k", keys, Seq("k"))
    // the delete commit keeps the one-version grace: the superseded
    // generation still physically holds the rows
    val (_, residueBefore) = ZoneMap.residualAudit(spark, dir, keys, Seq("k"))
    assert(residueBefore == 40L,
      s"grace generation must still hold the rows: $residueBefore")
    VersionedIndex.sweepGrace(spark, dir)
    val (dirsScanned, residue) = ZoneMap.residualAudit(spark, dir, keys, Seq("k"))
    assert(dirsScanned > 0 && residue == 0L,
      s"after the sweep the keys must appear in ZERO on-disk partitions: " +
        s"($dirsScanned, $residue)")
    // and the served content is unaffected by the sweep
    assert(ZoneMap.rangeQuery(spark, dir, "k", 0, 499).count() == 460L)
  }

  test("ChatStore.forgetKeys cascades into the registered zone-mapped " +
    "copy: delete commit + grace sweep + zero residue + epoch re-capture") {
    import graft.chat.ChatStore
    val tableDir = java.nio.file.Files
      .createTempDirectory("zm_forget_").toString + "/t"
    ChatStore.writeVersioned(table(300), tableDir)
    val idx = freshDir()
    ZoneMap.build(table(300), "k", idx, nBuckets = 8)
    graft.plans.SkipRewrite.register(spark, tableDir, idx, "k")
    val keys = Seq(10L, 11L, 12L).toDF("k")
    ChatStore.forgetKeys(spark, tableDir, "k", keys)
    // the table forgot them…
    val (tDirs, tRes) = ChatStore.residualAudit(spark, tableDir, "k", keys)
    assert(tDirs > 0 && tRes == 0L, s"table residue: ($tDirs, $tRes)")
    // …and the standing derived artifact did too, physically
    val (zDirs, zRes) = ZoneMap.residualAudit(spark, idx, keys, Seq("k"))
    assert(zDirs > 0 && zRes == 0L, s"zone-map residue: ($zDirs, $zRes)")
    assert(ZoneMap.rangeQuery(spark, idx, "k", 0, 299).count() == 297L)
  }

  test("a commit killed before the pointer flip leaves the index intact") {
    val dir = freshDir()
    ZoneMap.build(table(200), "k", dir, nBuckets = 4)
    val servedBefore = ZoneMap.rangeQuery(spark, dir, "k", 0, 199)
      .collect().map(_.toString).sorted.toSeq
    val delta = Seq((10L, "CRASH", 0L)).toDF("k", "payload", "grp")
    VersionedIndex.crashHook = {
      case "pre-pointer" => throw new RuntimeException("injected crash")
      case _ =>
    }
    try {
      intercept[RuntimeException] {
        ZoneMap.update(spark, dir, delta, "k", Seq("k"))
      }
    } finally VersionedIndex.crashHook = _ => ()
    val servedAfter = ZoneMap.rangeQuery(spark, dir, "k", 0, 199)
      .collect().map(_.toString).sorted.toSeq
    assert(servedAfter == servedBefore,
      "a killed commit must leave the served index byte-identical")
    // and the next committer recovers: the same update applies cleanly
    // (the crashed claim is this writer's own, below the staleness
    // window — sweep it eagerly for the test)
    VersionedIndex.claimStaleMs = 0L
    try ZoneMap.update(spark, dir, delta, "k", Seq("k"))
    finally VersionedIndex.claimStaleMs = 15L * 60 * 1000
    val served = ZoneMap.rangeQuery(spark, dir, "k", 10, 10)
      .select("payload").as[String].collect()
    assert(served.toSeq == Seq("CRASH"))
  }
}
