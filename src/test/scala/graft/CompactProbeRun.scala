package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (test scope): the auto-compaction policy probe for
  * BASELINE.md — sustained CDC against the standing text index, twin
  * dirs with and without `autoCompact`, reporting the hot partitions'
  * final file counts and the serve time after the batch train. The
  * number that must stay bounded is files-per-partition (every reader
  * pays one open+footer per file); the policy bounds it as a follow-on
  * commit, the knob-less twin accretes one file batch per commit.
  *
  * `sbt "Test/runMain graft.CompactProbeRun [sfDir] [batches]"`
  */
object CompactProbeRun {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val batches = if (args.length > 1) args(1).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = relational.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val dirs = Seq("auto" -> Some(4), "none" -> Option.empty[Int]).map {
      case (tag, knob) =>
        val d = java.nio.file.Files
          .createTempDirectory(s"compact_probe_$tag").toString
        ops.TextIndex.buildPhraseIndex(docs, "doc_id", "text", d,
          nBuckets = 16)
        (tag, knob, d)
    }
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    (1 to batches).foreach { i =>
      // each batch upserts a slice of existing docs (hot-bucket rewrites
      // from many tasks) plus fresh docs sharing one hot term
      val delta = docs.filter(col("doc_id") % 97 === i)
        .unionByName(spark.range(200).select(
          (col("id") + maxId + i * 1000L + 1L).as("doc_id"),
          lit("shared hot boilerplate term row").as("text")))
      dirs.foreach { case (_, knob, d) =>
        ops.TextIndex.updatePhraseIndex(spark, d, delta,
          spark.range(0).select(col("id").as("doc_id")),
          "doc_id", "text", autoCompact = knob)
      }
    }
    dirs.foreach { case (tag, _, d) =>
      def counts(artifact: String): Seq[Int] =
        ops.TextIndex.partitionPaths(spark, d, artifact).values.map(p =>
          new java.io.File(p).listFiles()
            .count(_.getName.endsWith(".parquet"))).toSeq
      val maxFiles = (counts("postings") ++ counts("doclen")).max
      def serve() = ops.TextIndex.bm25TopKFromIndex(spark, d,
        Seq("boilerplate", "hot"), 20).count()
      serve() // warm (JIT + codegen + FS metadata), then time
      val (rows, tServe) = time(serve())
      println(f"COMPACT tag=$tag batches=$batches max_files=$maxFiles " +
        f"serve=$tServe%.2f rows=$rows")
    }
    spark.stop()
  }
}
