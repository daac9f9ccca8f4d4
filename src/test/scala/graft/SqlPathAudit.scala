package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): classifies every oracle by whether its SQL text
  * runs through Spark's parser/analyzer, and if not, which DuckDB-only
  * marker justifies the skip. Drives the SQL-path widening work — run with
  * `sbt "Test/runMain graft.SqlPathAudit"`.
  */
object SqlPathAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("sql-path-audit").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    SqlEntry.registerViews(spark, sf)
    var ok = 0
    val failed = scala.collection.mutable.ListBuffer.empty[(String, String)]
    Registry.all.filter(_.oracle.isDefined).foreach { q =>
      val sql = q.oracle.get
      try { SqlEntry.runSql(spark, sql).collect(); ok += 1 }
      catch { case e: Throwable =>
        failed += ((q.name, e.getMessage.linesIterator.take(2).mkString(" ").take(160)))
      }
    }
    println(s"RUNS: $ok / ${Registry.all.count(_.oracle.isDefined)}")
    println("=== FAILING (name | error head) ===")
    failed.foreach { case (n, m) => println(s"$n | $m") }
    spark.stop()
  }
}
