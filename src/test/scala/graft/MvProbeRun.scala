package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): q314's MV-rewrite acceleration probe — the
  * same filter+group-by aggregate against a mult×-replicated base table,
  * with and without the registered summary, for the BASELINE.md record.
  */
object MvProbeRun {
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
    // mult×-replicated base, written once
    val base = java.nio.file.Files.createTempDirectory("mv_probe_base_")
      .toString + "/lineitem.parquet"
    val li = relational.Tables.t(spark, sfDir, "lineitem")
    (0 until mult).map(_ => li).reduce(_ unionAll _)
      .write.mode("overwrite").parquet(base)
    val n = spark.read.parquet(base).count()
    def q() = spark.read.parquet(base)
      .filter(col("l_linestatus") === "F")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("sk"))
      .orderBy("l_returnflag")
    val (_, tBase) = time { q().collect() }
    // build + register the summary, then the SAME query text re-plans
    // onto it
    val mv = java.nio.file.Files.createTempDirectory("mv_probe_sum_").toString
    val (_, tBuild) = time {
      spark.read.parquet(base).groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum("l_orderkey").as("sum_l_orderkey"),
          sum("l_suppkey").as("sum_l_suppkey"))
        .coalesce(1).write.mode("overwrite").parquet(mv)
    }
    org.apache.spark.sql.GraftRegistrar.register(spark)
    plans.MvRewrite.register(spark, base, mv,
      Set("l_returnflag", "l_linestatus"), Set("l_orderkey", "l_suppkey"))
    val (_, tMv) = time { q().collect() }
    println(f"MV n=$n base=$tBase%.2f mv_build=$tBuild%.2f served=$tMv%.3f")
    spark.stop()
  }
}
