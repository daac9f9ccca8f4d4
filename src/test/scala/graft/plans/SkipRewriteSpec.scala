package graft.plans

import graft.SparkSpec
import graft.ops.ZoneMap
import org.apache.spark.sql.functions._

/** [[SkipRewrite]]: a plain filtered read of a registered base table is
  * rerouted onto the zone-mapped copy's bucket partitions exactly when
  * the contract allows — values always equal the base-scan filter, the
  * routed plan never touches the base path, and every near-miss shape
  * (un-zoned column, non-bare comparison, nondeterministic predicate,
  * stale epoch) keeps the base scan.
  */
class SkipRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toUri.getPath).mkString(",")
        }
    }

  private def table(n: Int) =
    (0 until n).map(i => (i.toLong, (i / 100).toLong, s"p$i"))
      .toDF("k", "v", "payload")

  // one registered layout shared by the tests that don't mutate the base
  private lazy val fixture: (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory("skip_base_").toString + "/t"
    table(1000).write.mode("overwrite").parquet(base)
    val idx = java.nio.file.Files.createTempDirectory("skip_zm_").toString
    ZoneMap.build(spark.read.parquet(base), "k", idx, nBuckets = 16,
      bloomCol = Some("v"))
    SkipRewrite.register(spark, base, idx, "k", Some("v"))
    (base, idx)
  }

  test("range filter reroutes to the zone-mapped copy and stays exact") {
    val (base, idx) = fixture
    val q = spark.read.parquet(base).filter($"k".between(100L, 199L))
    val scans = scansOf(q)
    assert(!scans.exists(_.contains(base)), s"base still scanned: $scans")
    assert(scans.nonEmpty && scans.forall(s =>
      s.startsWith(idx) && s.contains("zbucket=")),
      s"rewritten scan must read only routed bucket partitions: $scans")
    // a 10% range over 16 buckets routes to <= 3 partitions
    assert(scans.map(_.split(",").length).sum <= 3, s"routing too wide: $scans")
    val got = q.select("k", "v", "payload").collect().map(_.toString).sorted
    val want = table(1000).filter($"k".between(100L, 199L))
      .collect().map(_.toString).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("bloom point filter on the non-clustered axis reroutes; other " +
    "conjuncts ride along and re-apply exactly") {
    val (base, idx) = fixture
    val q = spark.read.parquet(base)
      .filter($"v" === 3L && $"payload" =!= "p300")
    val scans = scansOf(q)
    assert(!scans.exists(_.contains(base)), s"base still scanned: $scans")
    assert(scans.nonEmpty && scans.forall(_.startsWith(idx)))
    val got = q.select("k").as[Long].collect().sorted
    assert(got.toSeq == (301 until 400).map(_.toLong))
  }

  test("range + bloom conjuncts intersect their routing") {
    val (base, idx) = fixture
    val q = spark.read.parquet(base)
      .filter($"k" >= 300L && $"k" < 320L && $"v" === 3L)
    val scans = scansOf(q)
    assert(!scans.exists(_.contains(base)))
    assert(scans.map(_.split(",").length).sum <= 2,
      s"intersection must stay tight: $scans")
    assert(q.count() == 20)
  }

  test("a range with no overlapping zone plans an empty read, not a scan") {
    val (base, _) = fixture
    val q = spark.read.parquet(base).filter($"k" > 5000L)
    assert(!scansOf(q).exists(_.contains(base)))
    assert(q.count() == 0)
  }

  test("filter on an un-zoned column keeps the base scan") {
    val (base, _) = fixture
    val q = spark.read.parquet(base).filter($"payload" === "p5")
    assert(scansOf(q).exists(_.contains(base)),
      s"no routable conjunct — must keep the base scan: ${scansOf(q)}")
    assert(q.count() == 1)
  }

  test("non-bare key comparison keeps the base scan") {
    val (base, _) = fixture
    val q = spark.read.parquet(base).filter($"k" + 1L > 900L)
    assert(scansOf(q).exists(_.contains(base)))
  }

  test("a purely nondeterministic filter keeps the base scan; a mixed " +
    "one reroutes only its deterministic part and stays exact") {
    val (base, _) = fixture
    // Spark never merges nondeterministic conjuncts into a pushed filter,
    // so the only nondeterministic Filter node the rule can ever see is a
    // pure one — which has no routable conjunct AND fails the determinism
    // guard (defense in depth)
    val pure = spark.read.parquet(base).filter(rand() < 2.0)
    assert(scansOf(pure).exists(_.contains(base)))
    // mixed: the optimizer splits it; the deterministic sub-filter may
    // reroute (same row population — routing is a superset + exact
    // re-filter), the rand() conjunct stays above and sees those rows
    val mixed = spark.read.parquet(base)
      .filter($"k".between(0L, 10L) && rand() < 2.0)
    assert(mixed.count() == 11)
  }

  test("IN-list on the key reroutes to the union of matching buckets; " +
    "a non-literal element declines") {
    val (base, idx) = fixture
    val q = spark.read.parquet(base)
      .filter($"k".isin(5L, 250L, 990L))
    val scans = scansOf(q)
    assert(!scans.exists(_.contains(base)), s"base still scanned: $scans")
    assert(scans.nonEmpty && scans.forall(_.startsWith(idx)))
    // three points over 16 buckets of 1000 keys: at most 3 partitions
    assert(scans.map(_.split(",").length).sum <= 3,
      s"IN routing too wide: $scans")
    assert(q.select("k").as[Long].collect().sorted.toSeq ==
      Seq(5L, 250L, 990L))
    // near-miss: an element that is not a literal (column reference)
    val nm = spark.read.parquet(base).filter($"k".isin($"v" * 100L, lit(5L)))
    assert(scansOf(nm).exists(_.contains(base)),
      "a non-literal IN element must keep the base scan")
  }

  test("IN-list on the bloom column routes the union of per-value " +
    "candidates") {
    val (base, idx) = fixture
    val q = spark.read.parquet(base).filter($"v".isin(1L, 8L))
    val scans = scansOf(q)
    assert(!scans.exists(_.contains(base)), s"base still scanned: $scans")
    assert(scans.nonEmpty && scans.forall(_.startsWith(idx)))
    assert(q.count() == 200)
  }

  test("DATE-keyed layout routes a plain date-range filter") {
    val base = java.nio.file.Files
      .createTempDirectory("skip_based_").toString + "/t"
    (0 until 365)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate
        .of(2024, 1, 1).plusDays(i)), i.toLong))
      .toDF("day", "x")
      .write.mode("overwrite").parquet(base)
    val idx = java.nio.file.Files.createTempDirectory("skip_zmd_").toString
    ZoneMap.build(spark.read.parquet(base), "day", idx, nBuckets = 12)
    SkipRewrite.register(spark, base, idx, "day")
    val q = spark.read.parquet(base)
      .filter($"day".between(java.sql.Date.valueOf("2024-03-01"),
        java.sql.Date.valueOf("2024-03-31")))
    val scans = scansOf(q)
    assert(!scans.exists(_.contains(base)), s"base still scanned: $scans")
    assert(scans.nonEmpty && scans.forall(_.startsWith(idx)))
    assert(scans.map(_.split(",").length).sum <= 2,
      s"one month over 12 buckets must stay tight: $scans")
    assert(q.count() == 31)
    assert(q.agg(sum($"x")).head.getLong(0) ==
      (60L to 90L).sum) // Mar 1 2024 is day index 60 (leap year)
  }

  test("plan-time epoch is mtime-memoized: repeated matched queries " +
    "re-list at most once; an append still invalidates") {
    val (base, _) = fixture
    // warm: one compile to fill the memo
    spark.read.parquet(base).filter($"k".between(0L, 9L)).count()
    val before = SkipRewrite.fullListings.get()
    (1 to 5).foreach { i =>
      val q = spark.read.parquet(base).filter($"k".between(0L, 9L * i))
      assert(!scansOf(q).exists(_.contains(base)))
      q.count()
    }
    val grew = SkipRewrite.fullListings.get() - before
    assert(grew == 0,
      s"unchanged base must revalidate from the mtime memo, not " +
        s"re-list ($grew listings across 5 queries)")
  }

  test("a base append after registration declines the route; " +
    "re-registration over a rebuilt copy re-enables it") {
    val base = java.nio.file.Files
      .createTempDirectory("skip_base2_").toString + "/t"
    table(200).write.mode("overwrite").parquet(base)
    val idx = java.nio.file.Files.createTempDirectory("skip_zm2_").toString
    ZoneMap.build(spark.read.parquet(base), "k", idx, nBuckets = 8)
    SkipRewrite.register(spark, base, idx, "k")
    def q() = spark.read.parquet(base).filter($"k".between(0L, 49L))
    assert(!scansOf(q()).exists(_.contains(base)), "fresh copy must route")
    // append WITHOUT maintaining the copy: serving it would lose the row
    Seq((7L, 0L, "appended")).toDF("k", "v", "payload")
      .write.mode("append").parquet(base)
    assert(scansOf(q()).exists(_.contains(base)),
      "stale epoch must keep the base scan")
    assert(q().count() == 51, "the declined plan must see the appended row")
    // CDC the copy up to date, re-register → the route re-enables
    ZoneMap.update(spark, idx,
      spark.read.parquet(base).filter($"payload" === "appended"),
      "k", Seq("k", "payload"))
    SkipRewrite.register(spark, base, idx, "k")
    assert(!scansOf(q()).exists(_.contains(base)))
    assert(q().count() == 51)
  }
}
