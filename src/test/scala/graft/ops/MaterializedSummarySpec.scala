package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[MaterializedSummary]]: the refresh algebra (existing groups add,
  * new groups insert), equivalence to a from-scratch rebuild, the
  * crash-killed refresh serving the old generation, and the catalog
  * re-point after refresh.
  */
class MaterializedSummarySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("ms_spec_").toString

  private val dims = Seq("g")
  private val sums = Seq("v")

  test("refresh ≡ from-scratch rebuild over base ∪ delta") {
    val base = Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("g", "v")
    val delta = Seq(("a", 5L), ("c", 7L)).toDF("g", "v") // new group c
    val dir = freshDir()
    MaterializedSummary.build(spark, base, dir, dims, sums)
    MaterializedSummary.refresh(spark, dir, delta, dims, sums)
    val got = spark.read.parquet(
        MaterializedSummary.currentPath(spark, dir))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 8L, 3L), ("b", 1L, 10L, 1L),
      ("c", 1L, 7L, 1L)))
  }

  test("a refresh killed before the pointer flip serves the old summary") {
    val base = Seq(("a", 1L)).toDF("g", "v")
    val dir = freshDir()
    MaterializedSummary.build(spark, base, dir, dims, sums)
    val before = MaterializedSummary.currentPath(spark, dir)
    VersionedIndex.crashHook = {
      case "pre-pointer" => throw new RuntimeException("injected crash")
      case _ =>
    }
    try intercept[RuntimeException] {
      MaterializedSummary.refresh(spark, dir,
        Seq(("a", 9L)).toDF("g", "v"), dims, sums)
    } finally VersionedIndex.crashHook = _ => ()
    assert(MaterializedSummary.currentPath(spark, dir) == before)
    val got = spark.read.parquet(before)
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("a", 1L, 1L, 1L)))
    // and the retry applies cleanly
    MaterializedSummary.refresh(spark, dir,
      Seq(("a", 9L)).toDF("g", "v"), dims, sums)
    val after = spark.read.parquet(
      MaterializedSummary.currentPath(spark, dir))
      .as[(String, Long, Long, Long)].collect()
    assert(after.toSeq == Seq(("a", 2L, 10L, 2L)))
  }

  test("refreshSigned ≡ from-scratch rebuild after a delete-heavy batch " +
    "(min/max repaired, zero-count group evicted, inserts merged)") {
    val base = Seq(("a", 1L), ("a", 5L), ("a", 9L),
      ("b", 10L), ("b", 20L), ("c", 7L)).toDF("g", "v")
    val deletes = Seq(("a", 9L), ("c", 7L)).toDF("g", "v") // a's max; ALL of c
    val inserts = Seq(("a", 3L), ("d", 100L)).toDF("g", "v")
    val currentBase = base.exceptAll(deletes).unionAll(inserts)
    val dir = freshDir()
    MaterializedSummary.build(spark, base, dir, dims, sums, Seq("v"))
    MaterializedSummary.refreshSigned(spark, dir, inserts, deletes,
      currentBase, dims, sums, Seq("v"))
    val got = spark.read.parquet(
        MaterializedSummary.currentPath(spark, dir))
      .orderBy("g").as[(String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // ≡ summarize(currentBase): c evicted, a's max repaired to 5, d new
    assert(got == Seq(("a", 3L, 9L, 3L, 1L, 5L),
      ("b", 2L, 30L, 2L, 10L, 20L), ("d", 1L, 100L, 1L, 100L, 100L)))
  }

  test("refreshSigned rescans ONLY delete-affected groups (interior " +
    "deletes merge arithmetically)") {
    val base = Seq(("a", 1L), ("a", 5L), ("a", 9L),
      ("b", 10L), ("b", 20L), ("b", 30L)).toDF("g", "v")
    // a loses its MIN (affected -> rescan); b loses an INTERIOR value
    // (provably cannot move extremes -> no rescan)
    val deletes = Seq(("a", 1L), ("b", 20L)).toDF("g", "v")
    val inserts = Seq.empty[(String, Long)].toDF("g", "v")
    val currentBase = base.exceptAll(deletes)
    val dir = freshDir()
    MaterializedSummary.build(spark, base, dir, dims, sums, Seq("v"))
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft.mv.rescan.")) seen.put(name, row.getLong(0))
        }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val got = try {
      MaterializedSummary.refreshSigned(spark, dir, inserts, deletes,
        currentBase, dims, sums, Seq("v"))
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      spark.read.parquet(MaterializedSummary.currentPath(spark, dir))
        .orderBy("g").as[(String, Long, Long, Long, Long, Long)]
        .collect().toSeq
    } finally spark.listenerManager.unregister(listener)
    assert(got == Seq(("a", 2L, 14L, 2L, 5L, 9L),
      ("b", 2L, 40L, 2L, 10L, 30L)))
    val rescanned = seen.values().toArray(Array.empty[java.lang.Long])
      .map(_.longValue).sum
    // only a's 2 surviving rows — b's interior delete must not rescan
    assert(rescanned == 2L, s"expected 2 re-scanned rows, got $rescanned")
  }

  test("an all-null group's sum_x stays NULL through refresh and " +
    "refreshSigned (cnt_x decides — a coalesce-add would turn it to 0)") {
    val base = Seq(("a", Some(1L)), ("n", None), ("n", None))
      .toDF("g", "v")
    val dir = freshDir()
    MaterializedSummary.build(spark, base, dir, dims, sums)
    // delta: another null row for n (stays all-null), a null row for a
    // (sum unchanged, cnt up, cnt_v unchanged)
    MaterializedSummary.refresh(spark, dir,
      Seq(("n", Option.empty[Long]), ("a", Option.empty[Long]))
        .toDF("g", "v"), dims, sums)
    val got = spark.read.parquet(
        MaterializedSummary.currentPath(spark, dir))
      .orderBy("g").as[(String, Long, Option[Long], Long)].collect().toSeq
    assert(got == Seq(("a", 2L, Some(1L), 1L), ("n", 3L, None, 0L)))
    // signed: delete a's one non-null row — its sum_v must BECOME null
    MaterializedSummary.refreshSigned(spark, dir,
      Seq.empty[(String, Option[Long])].toDF("g", "v"),
      Seq(("a", Some(1L))).toDF("g", "v"),
      Seq(("a", Option.empty[Long]), ("n", Option.empty[Long]),
        ("n", Option.empty[Long]), ("n", Option.empty[Long]))
        .toDF("g", "v"),
      dims, sums)
    val after = spark.read.parquet(
        MaterializedSummary.currentPath(spark, dir))
      .orderBy("g").as[(String, Long, Option[Long], Long)].collect().toSeq
    assert(after == Seq(("a", 1L, None, 0L), ("n", 3L, None, 0L)))
  }

  test("readAt serves the pre-refresh summary; current serves the " +
    "refreshed one (time travel inside the retention window)") {
    val dir = freshDir()
    MaterializedSummary.build(spark,
      Seq(("a", 1L), ("b", 2L), ("b", 4L)).toDF("g", "v"), dir, dims, sums)
    MaterializedSummary.refresh(spark, dir,
      Seq(("b", 10L), ("c", 7L)).toDF("g", "v"), dims, sums)
    val v1 = MaterializedSummary.readAt(spark, dir, 1L)
      .select("g", "cnt", "sum_v").orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    assert(v1 == Seq(("a", 1L, 1L), ("b", 2L, 6L)),
      s"v1 must be the pre-refresh state, got $v1")
    val cur = spark.read.parquet(
        MaterializedSummary.currentPath(spark, dir))
      .select("g", "cnt", "sum_v").orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    assert(cur == Seq(("a", 1L, 1L), ("b", 3L, 16L), ("c", 1L, 7L)))
    // outside the window: version 99 was never committed
    val e = intercept[IllegalStateException] {
      MaterializedSummary.readAt(spark, dir, 99L)
    }
    assert(e.getMessage.contains("retention window"))
  }

  test("refresh on a summary that predates cnt_ columns fails with the " +
    "explicit rebuild diagnosis, not an opaque AnalysisException") {
    val dir = freshDir()
    // hand-build a legacy-schema summary (cnt + sum_v only) through the
    // same commit protocol
    val c = VersionedIndex.begin(spark, dir)
    Seq(("a", 2L, 3L)).toDF("g", "cnt", "sum_v")
      .coalesce(1).write.mode("overwrite").parquet(s"${c.gen}/summary")
    c.finish(VersionedIndex.Manifest(
      Map("summary" -> Map("-" -> c.genLabel)), Map.empty))
    val e = intercept[IllegalArgumentException] {
      MaterializedSummary.refresh(spark, dir,
        Seq(("a", 5L)).toDF("g", "v"), dims, sums)
    }
    assert(e.getMessage.contains("rebuild the summary"),
      s"wrong diagnosis: ${e.getMessage}")
  }

  test("registerCurrent re-points the rewrite at the refreshed generation") {
    val basePath = java.nio.file.Files
      .createTempDirectory("ms_base_").toString + "/t"
    Seq(("a", 1L), ("b", 2L)).toDF("g", "v")
      .write.mode("overwrite").parquet(basePath)
    val dir = freshDir()
    MaterializedSummary.build(spark, spark.read.parquet(basePath),
      dir, dims, sums)
    MaterializedSummary.registerCurrent(spark, basePath, dir,
      dims.toSet, sums.toSet)
    def served() = spark.read.parquet(basePath)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(served() == Seq(("a", 1L, 1L), ("b", 1L, 2L)))
    // append to base AND refresh+re-register: the same query text now
    // serves the new generation's numbers
    Seq(("b", 5L)).toDF("g", "v").write.mode("append").parquet(basePath)
    MaterializedSummary.refresh(spark, dir,
      Seq(("b", 5L)).toDF("g", "v"), dims, sums)
    MaterializedSummary.registerCurrent(spark, basePath, dir,
      dims.toSet, sums.toSet)
    assert(served() == Seq(("a", 1L, 1L), ("b", 2L, 7L)))
  }
}
