package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): the q311 Bradley-Terry scale probe alone
  * (ScaleProbe.probePreference's shape) for the BASELINE.md record.
  */
object PreferenceProbeRun {
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
    val ev = relational.Tables.events(spark, sfDir)
      .select("user_id", "event_type", "value")
    val nEv = ev.count()
    def run(scale: String, df: org.apache.spark.sql.DataFrame,
        n: Long): Unit = {
      val ut = df.groupBy(col("user_id").as("rater"),
          col("event_type").as("item"))
        .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .cast("long").as("w"))
      val (rows, t) = time {
        ops.Preference.bradleyTerry(ops.Preference.winsMatrix(ut), 3)
          .collect().length.toLong
      }
      println(f"BT scale=$scale n=$n sec=$t%.2f items=$rows")
    }
    run("1x", ev, nEv)
    val big = (0 until mult).map(k =>
        ev.withColumn("user_id", col("user_id") + lit(k * 10000000L)))
      .reduce(_ unionAll _)
    run(s"${mult}x", big, nEv * mult)
    spark.stop()
  }
}
