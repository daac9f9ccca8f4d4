package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): run one named oracle text through the SQL entry
  * and compare with its DataFrame form. `sbt "Test/runMain graft.SqlOne q77_resample"`.
  */
object SqlOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("sql-one").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    SqlEntry.registerViews(spark, sf)
    import org.apache.spark.sql.functions.col
    def norm(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toIndexedSeq.map(col)
      df.select(cols: _*).collect().map(_.toString).toSeq.sorted
    }
    args.foreach { name =>
      val q = Registry.all.find(_.name == name).getOrElse(sys.error(s"no $name"))
      try {
        val viaSql = norm(SqlEntry.runSql(spark, q.oracle.get))
        val viaDf = norm(q.fn(spark, sf))
        val same = viaSql == viaDf
        println(s"$name: sql=${viaSql.size} df=${viaDf.size} match=$same")
        if (!same) {
          viaSql.zipAll(viaDf, "<none>", "<none>").find { case (a, b) => a != b }
            .foreach { case (a, b) => println(s"  first diff:\n  sql=$a\n  df =$b") }
        }
      } catch { case e: Throwable =>
        println(s"$name: FAIL ${e.getMessage.linesIterator.take(4).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
