package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): the round-18 skew + write-width probe for the
  * BASELINE.md record — the two scale-killer-class findings of the
  * round-17 verdict, measured rather than asserted:
  *
  *  1. EQUI-DEPTH vs FIXED-WIDTH bucketing over a zipf-ish key (70% of
  *     rows collapse into a 97-value hot range): prints each mode's
  *     max-bucket row share at 1× and at `mult`× — fixed-width must show
  *     the unbounded pile-up, equi-depth a bounded share.
  *  2. WRITE WIDTH: a SparkListener counts the tasks of every stage that
  *     ran during the build — the old `min(nBuckets, 32)` cap serialized
  *     100 TB builds through ≤32 tasks; the session-scaled range-
  *     partitioned write must show max stage width = the configured
  *     shuffle parallelism (> 32), with the serve digest unchanged
  *     between a 32-task and a wide build.
  *
  * `sbt "Test/runMain graft.ZoneSkewProbeRun [sfDir] [mult]"`
  */
object ZoneSkewProbeRun {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val width = sys.env.getOrElse("SPARK_GRAFT_PROBE_WIDTH", "96")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = relational.Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    def skew(df: org.apache.spark.sql.DataFrame) = df.withColumn("skew_key",
      when(col("l_orderkey") % 10 < 7, col("l_orderkey") % 97)
        .otherwise(col("l_orderkey")))
    val one = skew(li).persist(); val n1 = one.count()
    val big = skew((0 until mult).map(k => li.withColumn("l_orderkey",
        col("l_orderkey") + lit(k * 10000000L))).reduce(_ unionAll _))
      .persist()
    val nBig = big.count()

    def shares(df: org.apache.spark.sql.DataFrame, n: Long, buckets: Int,
        scale: String): Unit =
      Seq(false -> "fixed", true -> "depth").foreach { case (eq, mode) =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_zskew_${mode}_").toString
        val (_, tBuild) = time {
          ops.ZoneMap.build(df, "skew_key", dir, nBuckets = buckets,
            equiDepth = eq)
        }
        val rows = ops.ZoneMap.readZones(spark, dir)
          .select("n_rows").collect().map(_.getLong(0))
        val share = rows.max.toDouble / rows.sum
        val (hit, total) = ops.ZoneMap
          .prunedSelection(spark, dir, 10L, 50L)
        println(f"SKEW scale=$scale mode=$mode n=$n buckets=$buckets " +
          f"build=$tBuild%.2f max_share=$share%.4f hot_pruned=$hit/$total")
      }
    shares(one, n1, 64, "1x")
    shares(big, nBig, 64, s"${mult}x")

    // ---- write-width leg: count tasks per stage during the build ----
    val maxTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        maxTasks.updateAndGet(m => math.max(m, s.stageInfo.numTasks))
    }
    def digest(dir: String): String = {
      val r = ops.ZoneMap.rangeQuery(spark, dir, "skew_key", 10L, 50L)
        .agg(count(lit(1)), sum("l_quantity"), sum("skew_key")).head()
      s"${r.getLong(0)}|${r.getDouble(1)}|${r.getLong(2)}"
    }
    def widthRun(tasks: Option[Int], tag: String): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_zwidth_${tag}_").toString
      maxTasks.set(0)
      spark.sparkContext.addSparkListener(listener)
      val (_, t) = time {
        ops.ZoneMap.build(big, "skew_key", dir, nBuckets = 64,
          equiDepth = true, writeTasks = tasks)
      }
      spark.sparkContext.removeSparkListener(listener)
      val d = digest(dir)
      println(f"WIDTH tag=$tag n=$nBig max_stage_tasks=${maxTasks.get()} " +
        f"build=$t%.2f digest=$d")
      d
    }
    val dNarrow = widthRun(Some(32), "cap32")
    val dWide = widthRun(None, s"session$width")
    println(s"WIDTH digest_match=${dNarrow == dWide}")
    spark.stop()
  }
}
