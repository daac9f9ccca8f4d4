package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): the q309/q310 zone-map scale probe alone —
  * ScaleProbe's full sweep is hours; this reruns just the new entry for
  * the BASELINE.md record. Same shape as ScaleProbe.probeZoneMap.
  */
object ZoneMapProbeRun {
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
    val li = relational.Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val nLi = li.count()
    val liBig = (0 until mult).map(k =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(k * 10000000L)))
      .reduce(_ unionAll _).persist()
    val nBig = liBig.count()
    def run(scale: String, df: org.apache.spark.sql.DataFrame, n: Long,
        buckets: Int): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_zmprobe_").toString
      val (_, tBuild) = time {
        ops.ZoneMap.build(df, "l_orderkey", dir, nBuckets = buckets)
      }
      val (_, tServe) = time {
        ops.ZoneMap.rangeQuery(spark, dir, "l_orderkey", 1000L, 1399L)
          .agg(count(lit(1)), sum("l_quantity")).collect()
      }
      val (hit, total) = ops.ZoneMap.prunedSelection(spark, dir, 1000L, 1399L)
      val delta = df.filter(col("l_orderkey").between(1000, 1099))
        .withColumn("l_quantity", col("l_quantity") + lit(5.0))
      val (_, tCdc) = time {
        ops.ZoneMap.update(spark, dir, delta, "l_orderkey",
          Seq("l_orderkey", "l_linenumber"))
      }
      println(f"ZONEMAP scale=$scale n=$n build=$tBuild%.2f serve=$tServe%.2f" +
        f" cdc=$tCdc%.2f pruned=$hit/$total")
      // bloom leg: non-clustered point lookup on l_partkey
      val bdir = java.nio.file.Files
        .createTempDirectory("graft_zmprobe_bloom_").toString
      ops.ZoneMap.build(df.withColumn("l_partkey",
          col("l_orderkey") % 20000L), "l_orderkey", bdir,
        nBuckets = buckets, bloomCol = Some("l_partkey"))
      val (cand, tPoint) = time {
        ops.ZoneMap.bloomCandidates(spark, bdir, 100L).size
      }
      val (_, tLookup) = time {
        ops.ZoneMap.pointLookup(spark, bdir, "l_partkey", 100L)
          .agg(count(lit(1))).collect()
      }
      println(f"BLOOM scale=$scale n=$n route=$tPoint%.2f lookup=$tLookup%.2f" +
        f" candidates=$cand/$buckets")
    }
    run("1x", li, nLi, 64)
    run(s"${mult}x", liBig, nBig, 64 * mult)
    spark.stop()
  }
}
