package graft.tmp

import org.apache.spark.sql.SparkSession

// scratch single-query runner — not part of the library; delete before commit
object One {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    catch { case _: Throwable => }
    val reps = sys.env.getOrElse("REPS", "1").toInt
    for (n <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"ONE $n rep$r rows=$cnt time=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
