package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncation barrier with a fault-tolerance preference order —
  * the one protocol every multi-read / iterative kernel should use
  * (Dedup.connectedComponents and Graph pioneered it; this is the shared
  * form):
  *
  *  - when `spark.sparkContext.setCheckpointDir` is configured (a real
  *    cluster pointing at HDFS/S3), use reliable `checkpoint(true)` —
  *    blocks are REPLICATED to the checkpoint dir, so executor loss or
  *    dynamic-allocation scale-down recomputes nothing and loses nothing;
  *  - otherwise (tests, local mode) fall back to eager
  *    `localCheckpoint(true)`, whose executor-local blocks are fine in a
  *    single JVM and are ContextCleaner-reclaimed when the frame is GC'd
  *    (unlike a persist, which needs an explicit unpersist a
  *    lazily-returned frame can never schedule).
  *
  * An unconditional `localCheckpoint` is NOT this: it truncates lineage
  * into unreplicated executor-local blocks, so on a cluster an executor
  * loss makes the query unrecoverable where a plain persist would merely
  * have recomputed.
  */
object Ckpt {

  // reliable checkpoint files are reclaimed by the ContextCleaner ONLY
  // under spark.cleaner.referenceTracking.cleanCheckpoints (default
  // false) — without it every stage() call leaks its checkpoint files to
  // the checkpoint dir until cleaned externally. Warn once per JVM, not
  // per call: stage() sits inside per-query kernels (BM25, RAKE,
  // GlobalPrefixSum) that run hundreds of times per bench pass.
  private val warned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Materialize `df` eagerly and truncate its lineage, reliably when a
    * checkpoint dir is configured, executor-locally otherwise. On the
    * reliable path, checkpoint files are only ContextCleaner-reclaimed
    * under `spark.cleaner.referenceTracking.cleanCheckpoints=true`
    * (default false); [[stage]] warns when that flag is off so the leak
    * is observable, same as `Dedup.connectedComponents`.
    */
  def stage(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined) {
      if (!sc.getConf.getBoolean(
            "spark.cleaner.referenceTracking.cleanCheckpoints",
            defaultValue = false) &&
          warned.compareAndSet(false, true))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "Ckpt.stage is using reliable checkpoints but " +
            "spark.cleaner.referenceTracking.cleanCheckpoints is false: " +
            "checkpoint files will accumulate in " +
            sc.getCheckpointDir.get + " until cleaned externally")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }
}
