package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared per-(context, dataset) corpus-level builds — the
  * [[Graph.fromEvents]] protocol generalized: expensive artifacts that
  * several graded queries derive from (the corpus bigram LM for
  * q85/q109, the trained k-means quantizer for q104/q110) are built ONCE
  * per (applicationId, key) and eagerly checkpointed so (a) consumers'
  * plans see an O(1) opaque scan instead of re-optimizing the build, and
  * (b) the CacheManager cannot substitute the cached subtree into
  * unrelated plans (the shared-session hazard pinned in SparkSpec's
  * notes). Keys use `applicationId` — unique per SparkContext — never an
  * identity hash (see [[Graph]]'s cache-key note).
  *
  * At 100 TB these artifacts are exactly what a production pipeline
  * materializes to storage between stages (a trained quantizer, a corpus
  * LM); the in-session cache is the single-job equivalent, and the
  * checkpoint IS the materialization.
  */
object CorpusBuilds {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def cached(s: SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    cache.computeIfAbsent(s.sparkContext.applicationId + "|" + key, _ => {
      val df = build
      if (s.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    })

  /** Corpus bigram LM over the documents table ([[LanguageModel.bigramLm]]),
    * shared by every LM-scoring query (q85 scoring, q109 rebalancing).
    */
  def documentsBigramLm(s: SparkSession, dir: String): DataFrame =
    cached(s, s"bigram_lm|$dir") {
      LanguageModel.bigramLm(
        graft.relational.Tables.documents(s, dir), "doc_id", "text")
    }

  /** Trained k-means quantizer over the embeddings table
    * ([[Similarity.ivfCentroids]] on (vec_id→id, embedding→emb)), shared
    * by every quantizer consumer with the same (k, iters) — q104's
    * value-oracled trainer and q110's topic sampler. Deterministic
    * (decimal-bridged means), so sharing cannot change any oracle value.
    */
  def embeddingsCentroids(
      s: SparkSession, dir: String, k: Int, iters: Int): DataFrame =
    cached(s, s"kmeans|$k|$iters|$dir") {
      Similarity.ivfCentroids(
        graft.relational.Tables.embeddings(s, dir)
          .select(col("vec_id").as("id"), col("embedding").as("emb")),
        "id", "emb", k, iters)
    }

  /** q52's md5-banded near-dup canonical keep/drop set over the documents
    * table (star edges → connected-components fixpoint → canonicalize),
    * shared by q52 and q123's keeper selection — the component resolution
    * is the expensive part of both, and it is deterministic, so sharing
    * cannot change any oracle value. At 100 TB this IS the materialized
    * dedup manifest every downstream stage joins against.
    */
  def documentsCanonical(s: SparkSession, dir: String): DataFrame =
    cached(s, s"neardup_canonical|$dir") {
      Dedup.canonicalize(
        graft.relational.Tables.documents(s, dir).select("doc_id"),
        "doc_id", DedupQueries.starEdges(s, dir))
    }

  private val pathCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Persisted IVF-PQ index over the embeddings table
    * ([[Similarity.buildIvfPqIndex]] under a scratch dir, built once per
    * (applicationId, dataset)): coarse quantizer = the SAME shared
    * [[embeddingsCentroids]] artifact q104/q110/q120 train, residual-PQ
    * codebooks 16×16. The cached value is the index PATH — on-disk
    * parquet is the artifact itself here, which is exactly the 100 TB
    * protocol: the index is built by one job and served to every search
    * job after it.
    */
  def embeddingsIvfPqIndex(s: SparkSession, dir: String): String =
    pathCache.computeIfAbsent(
      s.sparkContext.applicationId + "|ivfpq|" + dir, _ => {
        val coarse = embeddingsCentroids(s, dir, k = 8, iters = 3)
        val idx =
          java.nio.file.Files.createTempDirectory("graft_ivfpq_").toString
        Similarity.buildIvfPqIndex(
          graft.relational.Tables.embeddings(s, dir), "vec_id", "embedding",
          coarse, idx, dim = 64, m = 16, kCent = 16, iters = 2)
        idx
      })

  private[graft] def clear(): Unit = { cache.clear(); pathCache.clear() }
}
