package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): run ad-hoc SQL statements (one per line of the
  * given file, `---`-separated blocks) against the registered views to
  * probe Spark-dialect support while porting oracles.
  */
object SparkTry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("spark-try").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SqlEntry.registerViews(spark, "/root/testdata/sf0.001")
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(0))))
    text.split("\n---\n").map(_.trim).filter(_.nonEmpty).foreach { sql =>
      try {
        val rows = spark.sql(sql).collect()
        println(s"OK (${rows.length} rows; head=${rows.take(3).mkString(" | ")})  <<${sql.linesIterator.next().take(60)}>>")
      } catch {
        case e: Throwable =>
          println(s"ERR ${e.getMessage.linesIterator.take(2).mkString(" ").take(180)}  <<${sql.linesIterator.next().take(60)}>>")
      }
    }
    spark.stop()
  }
}
