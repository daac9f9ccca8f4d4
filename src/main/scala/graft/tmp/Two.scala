package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch pagerank experiment — delete before commit
object Two {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val aqe = sys.env.getOrElse("AQE", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    catch { case _: Throwable => }
    import org.apache.spark.sql.types.LongType
    for (rep <- 1 to sys.env.getOrElse("REPS", "2").toInt) {
      val t0 = System.nanoTime()
      val edges = graft.ops.GlobalLag.withLag(
          graft.relational.Tables.events(spark, sfDir)
            .select("user_id", "ts_ns", "event_id"),
          Seq("ts_ns", "event_id"), "user_id", "prev")
        .filter(col("prev").isNotNull && col("prev") =!= col("user_id"))
        .select(col("prev").as("source"), col("user_id").as("target"))
      val edges2 = if (sys.env.get("PRECKPT").contains("1")) {
        val c = edges.localCheckpoint(true)
        println(f"TWO rep$rep upstream=${(System.nanoTime() - t0) / 1e9}%.3f")
        c
      } else edges
      val pr = graft.ops.Graph.pageRank(edges2, "source", "target", iters = 10,
        ckptEvery = sys.env.getOrElse("CKPT", "4").toInt)
      val t1 = System.nanoTime()
      val out = pr.agg(count(lit(1)).as("_n"), sum("rank").as("_s")).count()
      println(f"TWO rep$rep aqe=$aqe loop=${(t1 - t0) / 1e9}%.3f total=${(System.nanoTime() - t0) / 1e9}%.3f rows=$out")
    }
    spark.stop()
  }
}
