package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming incremental dedup — the streaming form of
  * [[graft.ops.Dedup.dedupAgainst]]: every micro-batch of newly ingested
  * documents probes the STANDING corpus's LSH bucket table and emits the
  * doc ids that collide (near-dup suspects), with their collision counts.
  *
  * Shape notes for scale:
  *  - the stream side computes per-row minhash signatures + band buckets
  *    with pure expressions (no aggregation), so the probe is a
  *    stream-static LEFT SEMI join — supported by Structured Streaming
  *    with no watermark requirement, because the static side holds no
  *    stream state;
  *  - the static side is the persistable part: at 100 TB the corpus
  *    bucket table is computed once (or appended per ingest), stored
  *    bucket-partitioned, and re-read per restart — the same split as
  *    [[graft.ops.Similarity]]'s persisted IVF index;
  *  - the per-doc collision count is a keyed streaming aggregation
  *    (update mode). Its state is one counter per colliding doc id of the
  *    current ingest — bounded by ingest volume, not corpus size; wrap
  *    the input with a watermark on an event-time column if ingest ids
  *    must age out of state.
  */
object CorpusStream {

  /** Corpus-side bucket table for [[flagNearDups]] — compute once on the
    * static corpus, persist, re-read. (band, bucket) rows only. Built with
    * the per-row bucket form so its values match what the stream side
    * computes (the batch pipeline hashes band slices differently); the
    * corpus pass is one-off and offline, where the per-row form's
    * interpreted-HOF cost is paid once, not per ingest.
    */
  def corpusBuckets(corpus: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame =
    Dedup.bandedBucketsPerRow(corpus, idCol, textCol, numHashes, bands, shingleSize)
      .select("band", "bucket")

  /** Streaming probe: emits (`id`, `n_hits`) for newly ingested docs whose
    * band buckets collide with the corpus (update mode; non-colliding docs
    * emit nothing). The stream side MUST use the per-row bucket form —
    * windows and pre-aggregations are illegal mid-stream — so the static
    * index must be built with the same form (see [[corpusBuckets]]):
    * bucket values differ between the per-row and batch pipelines.
    */
  def flagNearDups(newDocs: DataFrame, corpusBuckets: DataFrame,
      idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame =
    Dedup.bandedBucketsPerRow(newDocs, idCol, textCol, numHashes, bands, shingleSize)
      .join(corpusBuckets, Seq("band", "bucket"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
}
