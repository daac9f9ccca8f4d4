package graft.streaming

import graft.chat.{ChatLines, ChatParser, Network}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous chat ingestion (SURVEY.md §2.7): `readStream.text` over a
  * drop directory; each micro-batch contains *whole new files* (the file
  * source is file-granular), so the order-sensitive batch pipeline is
  * exact per batch — no cross-batch message state is needed. Edge weights
  * are commutative increments, logged per batch and merged on read: the
  * classic monoid-aggregate streaming design, which at scale becomes a
  * compacted table (MERGE) instead of a log scan.
  */
object ChatStream {

  /** Start incrementally building the interaction graph from files
    * appearing under `inputDir`. Edge increments append to `edgeLogDir`.
    */
  def incrementalGraph(
      spark: SparkSession, inputDir: String, edgeLogDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.text(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val lines = ChatLines.withLineNumbers(
            batch.withColumn("file", input_file_name()))
          val g = Network.analyze(ChatParser.analyzeDialect(lines))
          // foreachBatch is at-least-once: a batch retried after a crash
          // between write and checkpoint commit must not double-count.
          // Writing each batch to its batchId-keyed partition with
          // Overwrite makes the retry rewrite the same data in place.
          g.links.write.mode(SaveMode.Overwrite)
            .parquet(s"$edgeLogDir/batch=$batchId")
        }
      }
      .start()

  /** Current graph = monoid-merge of all logged edge increments. */
  def currentLinks(spark: SparkSession, edgeLogDir: String): DataFrame =
    spark.read.parquet(edgeLogDir)
      .groupBy("source", "target")
      .agg(sum("weight").as("weight"))
}
