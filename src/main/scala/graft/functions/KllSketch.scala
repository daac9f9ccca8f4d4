package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Mergeable quantile sketches (Apache DataSketches KLL) — the quantile
  * member of the mergeable-sketch family (q41/q87 HLL cardinality, q84
  * CMS frequency, q75 single-pass approx-percentile). What KLL adds over
  * `percentile_approx` is the MAINTENANCE shape: per-shard sketches are
  * built independently (one linear pass per partition, no shuffle of
  * rows) and merge associatively, so a standing 100 TB corpus keeps one
  * small sketch per shard/day and answers any quantile after merging
  * O(shards) kilobyte-sized states — never re-scanning rows.
  *
  * Build is per-PARTITION via mapPartitions (one sketch per partition,
  * serialized once — not per-row heapify/serialize, which is the naive
  * UDAF-buffer trap); the merge input is #partitions rows of bytes, so
  * collecting it is aggregate maintenance, same contract as q84's
  * single-row sketch collect. KLL compaction is randomized (no seed
  * API), so estimates carry the documented ~1.65%/√(k/200) rank error —
  * consumers gate on rank accuracy, never on exact values.
  */
object KllSketch {

  /** One serialized KLL sketch per partition of `values`. */
  def partitionSketches(values: Dataset[Double], k: Int): Dataset[Array[Byte]] = {
    import values.sparkSession.implicits._
    values.mapPartitions { it =>
      val sk = KllDoublesSketch.newHeapInstance(k)
      it.foreach(sk.update)
      Iterator.single(sk.toByteArray)
    }
  }

  /** Associative merge of serialized sketches into one heap sketch. */
  def merge(sketches: Seq[Array[Byte]], k: Int): KllDoublesSketch = {
    val out = KllDoublesSketch.newHeapInstance(k)
    sketches.foreach(b => out.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
    out
  }
}
