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
}
