package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

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

  /** Deserialize one sketch (the [[KllAggregator]] output). */
  def fromBytes(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))
}

/** Mutable KLL aggregation buffer whose JVM serialization rides the
  * sketch's own compact byte form. Between `reduce` calls the buffer is
  * a live heap object (per-row cost = one `sk.update`, no
  * serialization); Java serialization — which the typed-aggregation
  * path invokes only at partial-output / shuffle / state-store
  * boundaries — writes the kilobyte `toByteArray` image. This is what
  * keeps the aggregator out of the per-row heapify/serialize trap the
  * [[KllSketch]] scaladoc warns about.
  */
final class KllState(private var k: Int) extends java.io.Serializable {
  @transient var sk: KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.writeInt(k)
    val b = sk.toByteArray
    out.writeInt(b.length)
    out.write(b)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    k = in.readInt()
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    sk = KllDoublesSketch.heapify(Memory.wrap(b))
  }
}

/** KLL quantile sketch as a typed [[Aggregator]] — the form that runs
  * INSIDE an aggregation (batch or Structured Streaming), where
  * [[KllSketch.partitionSketches]] is the explicit-mapPartitions form.
  * Partial aggregation applies as to any UDAF: each map-side partial
  * (and in a stream, each micro-batch) reduces its rows into one local
  * sketch, and only kilobyte sketch states cross the shuffle or enter
  * the streaming state store — the mergeable-sketch maintenance shape
  * at the stream boundary. Output is the serialized sketch; read it
  * back with [[KllSketch.fromBytes]].
  */
final case class KllAggregator(k: Int)
    extends Aggregator[Double, KllState, Array[Byte]] {
  require(k >= 8, s"KLL k must be at least 8, got $k")

  override def zero: KllState = new KllState(k)

  override def reduce(b: KllState, v: Double): KllState = {
    b.sk.update(v); b
  }

  override def merge(a: KllState, b: KllState): KllState = {
    a.sk.merge(b.sk); a
  }

  override def finish(b: KllState): Array[Byte] = b.sk.toByteArray

  override def bufferEncoder: Encoder[KllState] =
    Encoders.javaSerialization[KllState]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
