package graft.tmp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: stream-stream interval join wall time vs shuffle width.
  * sbt "Test/runMain graft.tmp.StreamWidthProbe"
  */
object StreamWidthProbe {
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val ev = graft.relational.Tables.events(s, d)

    // stage both sides: 3 time-ranged files each (q233's shape)
    def stage(df: DataFrame, tsCol: String, k: Int): java.nio.file.Path = {
      val src = df.persist()
      val b = src.agg(min(unix_micros(col(tsCol))), max(unix_micros(col(tsCol)))).collect().head
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val span = hi - lo + 1
      val dir = java.nio.file.Files.createTempDirectory("swp_")
      import scala.jdk.CollectionConverters._
      (0 until k).foreach { i =>
        def bound(j: Int): Long = lo + (span / k) * j + (span % k) * j / k
        val stage = java.nio.file.Files.createTempDirectory("swp_part")
        src.filter(unix_micros(col(tsCol)) >= bound(i) && unix_micros(col(tsCol)) < bound(i + 1))
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val f = java.nio.file.Files.list(stage).iterator().asScala
          .find(_.toString.endsWith(".parquet")).get
        val dst = dir.resolve(f"part$i%02d.parquet")
        java.nio.file.Files.move(f, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1000000000L + i * 60000L))
        deleteRecursively(stage)
      }
      src.unpersist()
      dir
    }
    val impDir = stage(ev.filter(col("event_type") === "view")
      .select(col("user_id").as("imp_user"), col("ts").as("imp_ts")), "imp_ts", 3)
    val clkDir = stage(ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts")), "click_ts", 3)

    def runOnce(width: Int): (Double, Long) = {
      val conf = s.sessionState.conf
      val old = conf.numShufflePartitions
      s.conf.set("spark.sql.shuffle.partitions", width)
      try {
        val t0 = System.nanoTime()
        def src(dir: java.nio.file.Path): DataFrame = {
          val schema = s.read.parquet(dir.toString).schema
          s.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir.toString)
        }
        val joined = graft.streaming.EventStream.attributeClicks(
          src(impDir), src(clkDir), windowSec = 86400, watermarkDelay = "1 day")
        val sink = "swp_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("swp_ckpt")
        val q = joined.writeStream.format("memory").queryName(sink)
          .outputMode("append").option("checkpointLocation", ckpt.toString).start()
        try { q.processAllAvailable() } finally { q.stop() }
        val n = s.table(sink).count()
        s.catalog.dropTempView(sink)
        deleteRecursively(ckpt)
        ((System.nanoTime() - t0) / 1e9, n)
      } finally s.conf.set("spark.sql.shuffle.partitions", old)
    }
    // warmup
    runOnce(32)
    Seq(32, 16, 8, 4, 2).foreach { w =>
      val times = (1 to 2).map(_ => runOnce(w))
      println(f"[swp] width=$w%2d  times=${times.map(_._1).map(t => f"$t%.2f").mkString(",")}  rows=${times.head._2}")
    }
    s.stop()
  }
}
