package graft.streaming

import graft.SparkSpec

/** Pins [[StreamQueries.streamWidthFor]]'s fallback contract: a staged
  * input directory the configured FileSystem cannot resolve (absent,
  * unreadable, wrong scheme) must yield the SESSION width — never the
  * floor width 4. The round-18 java.nio probe read 0 bytes for any
  * non-local path and would have collapsed every stream on a real
  * cluster to width 4.
  */
class StreamWidthSpec extends SparkSpec {

  private def withWidth(n: Int)(body: => Unit): Unit = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("absent input dir falls back to the session width, not the floor") {
    withWidth(32) {
      val w = StreamQueries.streamWidthFor(spark,
        Seq("/nonexistent/graft/staged/input"))
      assert(w == 32, s"expected session width 32, got $w")
    }
  }

  test("one absent dir among several still falls back to session width") {
    val real = java.nio.file.Files.createTempDirectory("sw").toString
    withWidth(32) {
      val w = StreamQueries.streamWidthFor(spark,
        Seq(real, "/nonexistent/graft/staged/input"))
      assert(w == 32, s"expected session width 32, got $w")
    }
  }

  test("tiny resolvable input sizes down to the floor; bytes >= advisory " +
    "scale the width up to the session cap") {
    val dir = java.nio.file.Files.createTempDirectory("sw2")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array.fill(1024)(1.toByte))
    withWidth(32) {
      assert(StreamQueries.streamWidthFor(spark, Seq(dir.toString)) == 4)
      val prevAdv =
        spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128")
      try {
        // 1024 bytes / 128-byte advisory = 8 partitions
        assert(StreamQueries.streamWidthFor(spark, Seq(dir.toString)) == 8)
      } finally prevAdv match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
    }
  }
}
