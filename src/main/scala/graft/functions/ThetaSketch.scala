package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch,
  Sketches, UpdateSketch}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable THETA sketches (Apache DataSketches) — the SET-OPERATION
  * member of the mergeable-sketch family. What theta adds over HLL
  * (q41/q87/q171) is that the sketch RETAINS a k-th-minimum-value hash
  * SAMPLE of the set, not just a cardinality state — so two segment
  * sketches support INTERSECTION and DIFFERENCE estimates (the
  * audience-overlap report), which HLL's union-only algebra cannot
  * express. At 100 TB the maintenance shape is the same as KLL/HLL:
  * one kilobyte sketch per segment/shard built in a single pass with
  * map-side partial aggregation, merged associatively; A∩B / A∖B are
  * then computed between kilobyte states — never re-scanning rows.
  *
  * Estimates are deterministic (fixed default update seed, deterministic
  * hashing) but approximate; consumers gate with the sketch's own
  * standard-error bounds ([[bounds]]), never on exact values.
  *
  * Same buffer discipline as [[KllState]]: live heap sketch between
  * `reduce` calls, compact byte image only at serialization boundaries.
  */
object ThetaSketch {

  /** Deserialize a sketch produced by [[ThetaAggregator]] (or
    * [[toBytes]]).
    */
  def fromBytes(b: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(b))

  def toBytes(s: Sketch): Array[Byte] = s.compact().toByteArray

  /** Union of serialized sketches (associative merge). */
  def union(sketches: Seq[Array[Byte]], nomEntries: Int): CompactSketch = {
    val u = SetOperation.builder().setNominalEntries(nomEntries).buildUnion()
    sketches.foreach(b => u.union(fromBytes(b)))
    u.getResult
  }

  /** A ∩ B between two serialized sketches. */
  def intersect(a: Array[Byte], b: Array[Byte]): CompactSketch = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(fromBytes(a))
    i.intersect(fromBytes(b))
    i.getResult
  }

  /** A ∖ B between two serialized sketches. */
  def aNotB(a: Array[Byte], b: Array[Byte]): CompactSketch =
    SetOperation.builder().buildANotB()
      .aNotB(fromBytes(a), fromBytes(b))

  /** (estimate, lower, upper) at `numStdDev` standard deviations — the
    * gate consumers should use instead of comparing point estimates.
    */
  def bounds(s: Sketch, numStdDev: Int): (Double, Double, Double) =
    (s.getEstimate, s.getLowerBound(numStdDev), s.getUpperBound(numStdDev))
}

/** Mutable theta aggregation buffer; JVM serialization rides the
  * sketch's compact byte image (see [[KllState]] — identical shape).
  * Merging heapifies the incoming compact image into a Union.
  */
final class ThetaState(private var nomEntries: Int)
    extends java.io.Serializable {
  @transient var sk: UpdateSketch =
    UpdateSketch.builder().setNominalEntries(nomEntries).build()
  // a merged-in partner that no longer fits the update-sketch form;
  // folded lazily so the common single-partition path never unions
  @transient var pending: org.apache.datasketches.theta.Union = _

  def update(v: Long): Unit = sk.update(v)

  def mergeFrom(other: ThetaState): Unit = {
    if (pending == null)
      pending = SetOperation.builder().setNominalEntries(nomEntries)
        .buildUnion()
    pending.union(other.compactNow())
  }

  def compactNow(): CompactSketch =
    if (pending == null) sk.compact()
    else { pending.union(sk.compact()); pending.getResult }

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.writeInt(nomEntries)
    val b = compactNow().toByteArray
    out.writeInt(b.length)
    out.write(b)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    nomEntries = in.readInt()
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    sk = UpdateSketch.builder().setNominalEntries(nomEntries).build()
    pending = SetOperation.builder().setNominalEntries(nomEntries)
      .buildUnion()
    pending.union(Sketches.heapifySketch(Memory.wrap(b)))
  }
}

/** Theta sketch as a typed [[Aggregator]] over LONG keys — per-segment
  * distinct-sample state for the set-operation algebra. Partial
  * aggregation applies: each map-side partial reduces its rows into one
  * local sketch; only kilobyte compact images cross the shuffle. Output
  * is the serialized compact sketch; read with [[ThetaSketch.fromBytes]].
  */
final case class ThetaAggregator(nomEntries: Int)
    extends Aggregator[Long, ThetaState, Array[Byte]] {
  require(nomEntries >= 16 && (nomEntries & (nomEntries - 1)) == 0,
    s"nominal entries must be a power of two >= 16, got $nomEntries")

  override def zero: ThetaState = new ThetaState(nomEntries)

  override def reduce(b: ThetaState, v: Long): ThetaState = {
    b.update(v); b
  }

  override def merge(a: ThetaState, b: ThetaState): ThetaState = {
    a.mergeFrom(b); a
  }

  override def finish(b: ThetaState): Array[Byte] =
    b.compactNow().toByteArray

  override def bufferEncoder: Encoder[ThetaState] =
    Encoders.javaSerialization[ThetaState]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
