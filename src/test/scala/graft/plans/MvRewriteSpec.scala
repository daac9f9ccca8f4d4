package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[MvRewrite]]: the optimized plan scans the summary (not the base
  * table) exactly when the contract allows, values match the base
  * aggregate, and every near-miss shape keeps the base scan.
  */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val basePath = {
    val p = java.nio.file.Files.createTempDirectory("mv_base_").toString
    (0 until 1000).map(i =>
        (i.toLong, s"g${i % 3}", s"s${i % 2}", (i % 7).toLong, i * 1.5))
      .toDF("id", "dim_a", "dim_b", "v", "d")
      .write.mode("overwrite").parquet(p)
    p
  }

  private lazy val registered: Unit = {
    val mvPath = java.nio.file.Files.createTempDirectory("mv_sum_").toString
    spark.read.parquet(basePath)
      .groupBy("dim_a", "dim_b")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .coalesce(1).write.mode("overwrite").parquet(mvPath)
    org.apache.spark.sql.GraftRegistrar.register(spark)
    MvRewrite.register(spark, basePath, mvPath,
      dims = Set("dim_a", "dim_b"), sumCols = Set("v"))
  }

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toUri.getPath).mkString(",")
        }
    }

  test("matching aggregate reads the summary and returns exact values") {
    registered
    val q = spark.read.parquet(basePath)
      .filter($"dim_b" === "s1")
      .groupBy("dim_a")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("dim_a")
    assert(!scansOf(q).exists(_.contains(basePath)),
      s"base table still scanned: ${scansOf(q)}")
    // truth computed locally from the generator — independent of every
    // Spark plan, rewritten or not
    val rows = (0 until 1000).filter(i => i % 2 == 1)
      .groupBy(i => s"g${i % 3}").toSeq.sortBy(_._1)
      .map { case (g, is) => (g, is.size.toLong,
        is.map(i => (i % 7).toLong).sum) }
    assert(q.as[(String, Long, Long)].collect().toSeq == rows)
  }

  test("HAVING (filter above the aggregate) is served from the summary " +
    "through preserved output ids") {
    registered
    val q = spark.read.parquet(basePath)
      .groupBy("dim_a", "dim_b")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .filter($"n" > 160L && $"sv" >= 400L)
      .orderBy("dim_a", "dim_b")
    assert(!scansOf(q).exists(_.contains(basePath)),
      s"base table still scanned under HAVING: ${scansOf(q)}")
    val rows = (0 until 1000)
      .groupBy(i => (s"g${i % 3}", s"s${i % 2}")).toSeq.sortBy(_._1)
      .map { case ((a, b), is) =>
        (a, b, is.size.toLong, is.map(i => (i % 7).toLong).sum) }
      .filter { case (_, _, n, sv) => n > 160L && sv >= 400L }
    assert(q.as[(String, String, Long, Long)].collect().toSeq == rows)
  }

  test("two summaries over one source: the tightest that answers wins; " +
    "the coarse one still serves what the tight one cannot") {
    registered
    // a SECOND, coarser-keyed but TIGHTER (fewer dims) summary: for a
    // dim_a-only aggregate it re-aggregates 3 rows instead of 6
    val tight = java.nio.file.Files.createTempDirectory("mv_sum_a_").toString
    spark.read.parquet(basePath)
      .groupBy("dim_a")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .coalesce(1).write.mode("overwrite").parquet(tight)
    MvRewrite.register(spark, basePath, tight,
      dims = Set("dim_a"), sumCols = Set("v"))
    try {
      val qa = spark.read.parquet(basePath)
        .groupBy("dim_a").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val sa = scansOf(qa)
      assert(sa.exists(_.contains(tight)),
        s"dim_a aggregate must pick the fewest-dims summary: $sa")
      assert(!sa.exists(_.contains(basePath)))
      // a dim_b grouping is NOT answerable by the dim_a summary — the
      // original two-dim summary must serve it
      val qb = spark.read.parquet(basePath)
        .groupBy("dim_b").agg(count(lit(1)).as("n"))
      val sb = scansOf(qb)
      assert(!sb.exists(_.contains(basePath)) &&
        !sb.exists(_.contains(tight)),
        s"dim_b aggregate must fall through to the two-dim summary: $sb")
      // values stay exact through the tight route
      val rows = (0 until 1000).groupBy(i => s"g${i % 3}").toSeq
        .sortBy(_._1)
        .map { case (g, is) => (g, is.size.toLong,
          is.map(i => (i % 7).toLong).sum) }
      assert(qa.orderBy("dim_a").as[(String, Long, Long)]
        .collect().toSeq == rows)
    } finally {
      // drop the extra summary so later tests see the original catalog
      MvRewrite.MvCatalog.mvs = MvRewrite.MvCatalog.mvs
        .filterNot(_.artifactId == tight)
    }
  }

  test("non-dim grouping keeps the base scan") {
    registered
    val q = spark.read.parquet(basePath)
      .groupBy("v").agg(count(lit(1)).as("n"))
    assert(scansOf(q).exists(_.contains(basePath)))
  }

  test("non-dim filter keeps the base scan") {
    registered
    val q = spark.read.parquet(basePath).filter($"id" > 10)
      .groupBy("dim_a").agg(count(lit(1)).as("n"))
    assert(scansOf(q).exists(_.contains(basePath)))
  }

  test("double-typed sum keeps the base scan") {
    registered
    val q = spark.read.parquet(basePath)
      .groupBy("dim_a").agg(sum("d").as("sd"))
    assert(scansOf(q).exists(_.contains(basePath)))
  }

  test("distinct aggregate keeps the base scan") {
    registered
    val q = spark.read.parquet(basePath)
      .groupBy("dim_a").agg(countDistinct("v").as("nd"))
    assert(scansOf(q).exists(_.contains(basePath)))
  }

  test("nondeterministic filter keeps the base scan (references no " +
    "columns, so the dim check alone would admit it)") {
    registered
    val q = spark.read.parquet(basePath).filter(rand() < 0.5)
      .groupBy("dim_a").agg(count(lit(1)).as("n"))
    assert(scansOf(q).exists(_.contains(basePath)))
  }

  test("global (ungrouped) aggregate keeps the base scan") {
    registered
    val q = spark.read.parquet(basePath)
      .agg(count(lit(1)).as("n"))
    assert(scansOf(q).exists(_.contains(basePath)))
  }

  test("multi-path scan including the registered source keeps the base " +
    "scan (rewriting would silently drop the other path's rows)") {
    registered
    val other = java.nio.file.Files.createTempDirectory("mv_other_").toString
    Seq((9999L, "g0", "s0", 1L, 0.0), (9998L, "g1", "s1", 2L, 0.0))
      .toDF("id", "dim_a", "dim_b", "v", "d")
      .write.mode("overwrite").parquet(other)
    val q = spark.read.parquet(basePath, other)
      .groupBy("dim_a").agg(count(lit(1)).as("n"))
    assert(scansOf(q).exists(_.contains(basePath)),
      s"multi-path scan was rewritten: ${scansOf(q)}")
    // and the union's rows are all counted
    assert(q.agg(sum("n")).first().getLong(0) == 1002L)
  }

  test("COUNT(NULL) keeps the base scan (it is 0 per group, not the " +
    "group size SUM(cnt) would produce)") {
    registered
    val q = spark.read.parquet(basePath)
      .groupBy("dim_a").agg(count(lit(null)).as("n"))
    assert(scansOf(q).exists(_.contains(basePath)))
    assert(q.select("n").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(0L))
  }

  test("COUNT(col) and AVG(integral col) are served from a summary " +
    "carrying cnt_ columns, exact on a null-bearing column") {
    val base3 = java.nio.file.Files
      .createTempDirectory("mv_avg_base_").toString + "/t"
    val rows = (0 until 100).map(i =>
      (i.toLong, s"g${i % 3}", if (i % 4 == 0) None else Some(i.toLong),
        i * 1.5))
    rows.toDF("id", "dim_a", "v", "d")
      .write.mode("overwrite").parquet(base3)
    val sdir = java.nio.file.Files.createTempDirectory("mv_avg_sum_")
      .toString
    graft.ops.MaterializedSummary.build(spark,
      spark.read.parquet(base3), sdir, Seq("dim_a"), Seq("v"))
    graft.ops.MaterializedSummary.registerCurrent(spark, base3, sdir,
      Set("dim_a"), Set("v"))
    val q = spark.read.parquet(base3)
      .groupBy("dim_a")
      .agg(count(lit(1)).as("n"), count($"v").as("nv"),
        avg($"v").as("av"))
      .orderBy("dim_a")
    assert(!scansOf(q).exists(_.contains(base3)),
      s"base table still scanned: ${scansOf(q)}")
    // truth from the generator: n = group size, nv = non-null count,
    // av = exact-sum / non-null-count in one double division
    val truth = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (g, rs) =>
      val vs = rs.flatMap(_._3)
      (g, rs.size.toLong, vs.size.toLong, vs.sum.toDouble / vs.size)
    }
    assert(q.as[(String, Long, Long, Double)].collect().toSeq == truth)
    // AVG over the DOUBLE column of the same base must keep the base
    // scan (double partial sums are not order-stable)
    val qd = spark.read.parquet(base3)
      .groupBy("dim_a").agg(avg($"d").as("ad"))
    assert(scansOf(qd).exists(_.contains(base3)),
      s"AVG over a double column was rewritten: ${scansOf(qd)}")
  }

  test("a summary registered without cnt_ columns declines COUNT(col) " +
    "and AVG (schema-checked, not assumed)") {
    registered // the shared handmade summary carries cnt + sum_v only
    val qc = spark.read.parquet(basePath)
      .groupBy("dim_a").agg(count($"v").as("nv"))
    assert(scansOf(qc).exists(_.contains(basePath)),
      s"COUNT(col) rewrote against a summary with no cnt_v: ${scansOf(qc)}")
    val qa = spark.read.parquet(basePath)
      .groupBy("dim_a").agg(avg($"v").as("av"))
    assert(scansOf(qa).exists(_.contains(basePath)),
      s"AVG rewrote against a summary with no cnt_v: ${scansOf(qa)}")
  }

  test("a base append after registration declines the rewrite; " +
    "re-registration over the new content re-enables it") {
    // own base dir — the shared fixture's epoch must stay valid
    val base2 = java.nio.file.Files.createTempDirectory("mv_base2_").toString
    (0 until 100).map(i => (i.toLong, s"g${i % 3}", i.toLong))
      .toDF("id", "dim_a", "v")
      .write.mode("overwrite").parquet(base2)
    val mv2 = java.nio.file.Files.createTempDirectory("mv_sum2_").toString
    def buildMv(): Unit = {
      spark.read.parquet(base2).groupBy("dim_a")
        .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
        .coalesce(1).write.mode("overwrite").parquet(mv2)
      MvRewrite.register(spark, base2, mv2,
        dims = Set("dim_a"), sumCols = Set("v"))
    }
    org.apache.spark.sql.GraftRegistrar.register(spark)
    buildMv()
    def q() = spark.read.parquet(base2)
      .groupBy("dim_a").agg(count(lit(1)).as("n"))
    assert(!scansOf(q()).exists(_.contains(base2)), "fresh MV must serve")
    // append to the base WITHOUT refreshing: serving the summary now
    // would return stale counts — the rule must decline
    Seq((1000L, "g0", 5L)).toDF("id", "dim_a", "v")
      .write.mode("append").parquet(base2)
    assert(scansOf(q()).exists(_.contains(base2)),
      "stale epoch must keep the base scan")
    assert(q().agg(sum("n")).first().getLong(0) == 101L,
      "the declined plan must see the appended row")
    // rebuild + re-register over the new content: the route re-enables
    buildMv()
    assert(!scansOf(q()).exists(_.contains(base2)))
    assert(q().agg(sum("n")).first().getLong(0) == 101L)
  }
}
