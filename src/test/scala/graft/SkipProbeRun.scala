package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): the q318/q319 TRANSPARENT-skip scale probe for
  * the BASELINE.md record — a PLAIN filtered read of the base path (no
  * ZoneMap API in the query) at 1× and mult×, with and without the
  * registered skip rewrite, plus the optimized plan's scan footprint.
  * The claim under test: the rerouted serve tracks the ANSWER (one
  * range's buckets), not the corpus, while the unregistered plain read
  * pays the full scan.
  */
object SkipProbeRun {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.GraftRegistrar.register(spark)
    val li = relational.Tables.t(spark, sfDir, "lineitem") // full width
    def run(scale: String, df: org.apache.spark.sql.DataFrame,
        buckets: Int): Unit = {
      val base = java.nio.file.Files
        .createTempDirectory("graft_skipprobe_").toString + "/base"
      // SCRAMBLE the write order (deterministically): an arrival-ordered
      // or naturally-sorted base lets parquet's own row-group min/max
      // prune the plain range read too, hiding the layout's value — the
      // zone map exists for the base that ISN'T clustered on the key,
      // so the probe must measure that case
      df.orderBy(md5(concat_ws("|", col("l_linenumber"),
          col("l_partkey"), col("l_orderkey"))))
        .write.mode("overwrite").parquet(base)
      val n = spark.read.parquet(base).count()
      def q() = spark.read.parquet(base)
        .filter(col("l_orderkey").between(600L, 699L))
        .agg(count(lit(1)), sum("l_quantity"))
      val (_, tPlain) = time(q().collect())
      val idx = java.nio.file.Files
        .createTempDirectory("graft_skipprobe_zm_").toString
      val (_, tBuild) = time {
        ops.ZoneMap.build(spark.read.parquet(base), "l_orderkey", idx,
          nBuckets = buckets, bloomCol = Some("l_partkey"))
      }
      plans.SkipRewrite.register(spark, base, idx, "l_orderkey",
        Some("l_partkey"))
      val (_, tSkip) = time(q().collect())
      val scans = q().queryExecution.optimizedPlan.collectLeaves().collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              h.location.rootPaths.map(_.toUri.getPath)
          }
      }.flatten
      val routed = scans.count(_.contains("zbucket="))
      val (_, tBloom) = time {
        spark.read.parquet(base).filter(col("l_partkey") === 100L)
          .agg(count(lit(1))).collect()
      }
      println(f"SKIP scale=$scale n=$n plain=$tPlain%.2f build=$tBuild%.2f " +
        f"served=$tSkip%.2f bloom_point=$tBloom%.2f " +
        f"routed_parts=$routed/$buckets")
    }
    run("1x", li, 64)
    run(s"${mult}x", (0 until mult).map(k =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(k * 10000000L)))
      .reduce(_ unionAll _), 64 * mult)
    spark.stop()
  }
}
