package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): time individual declared queries under the
  * Bench session shape (same master/shuffle/AQE contract) and dump their
  * `explain("formatted")` plans for the round's plans/ evidence files.
  *
  *   sbt "Test/runMain graft.BenchOne q192_link_prediction q229_sparse_cosine_pairs"
  *
  * Env knobs (all optional): SPARK_GRAFT_SF_DIR (default sf0.1),
  * SPARK_GRAFT_CPUS (default 32), GRAFT_PROF_REPS (default 3),
  * GRAFT_PLAN_OUT (a directory — when set, writes <name>.txt with the
  * formatted plan of each query).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_PROF_REPS", "3").toInt
    val planOut = sys.env.get("GRAFT_PLAN_OUT")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    catch { case _: Throwable => }
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[prof] no such query: $name")
        case Some(fn) =>
          val times = (1 to reps).map { i =>
            spark.sparkContext.setJobDescription(s"$name rep$i")
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            println(f"[prof] $name rep$i: $dt%.3f s ($n rows)")
            dt
          }
          println(f"[prof] $name min=${times.min}%.3f s")
          planOut.foreach { dir =>
            val p = java.nio.file.Paths.get(dir)
            java.nio.file.Files.createDirectories(p)
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(p.resolve(s"$name.txt"), plan)
            println(s"[prof] plan written: $dir/$name.txt")
          }
      }
    }
    spark.stop()
  }
}
