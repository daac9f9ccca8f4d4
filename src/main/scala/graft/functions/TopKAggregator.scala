package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation state (and output) for [[TopKAggregator]]: at most k
  * (value, id) pairs, ordered largest-value (then smallest-id) first. A
  * case class so both encoders ride the product Encoder (tungsten
  * rows), not kryo blobs; callers explode `.items`.
  */
final case class TopKBuf(items: Seq[(Double, Long)])

/** Bounded per-group top-k as a typed [[Aggregator]] — the UDAF
  * extension point (the engine's fourth custom-function class, next to
  * the codegen'd Expression, the optimizer Rule, and the custom
  * physical operator).
  *
  * Why an aggregator and not a window: `row_number() OVER (ORDER BY v)`
  * sorts EVERY row of every group before discarding all but k — at
  * 100 TB that is a full shuffle+sort of the corpus for a 5-row answer
  * per group. This aggregator keeps at most k (value, id) pairs per
  * partial, so the map side reduces each partition to k rows per group
  * before the shuffle (partial aggregation applies to UDAFs exactly as
  * to built-ins), and merge cost is O(k log k) per partial pair. Exact
  * and deterministic: ordering is (value desc, id asc).
  *
  * The buffer is a plain sorted Seq (largest first). For the k this is
  * meant for (single digits to low hundreds) insertion into a k-element
  * vector beats heap constant factors and stays Encoder-friendly.
  */
final case class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  // NaN sorts GREATEST (SQL DESC semantics, matching the row_number
  // oracle) and compares equal to itself — plain > / == would make
  // `better` non-total on NaN and the kept set partition-dependent
  private def gtVal(x: Double, y: Double): Boolean = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if (xn || yn) xn && !yn else x > y
  }

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    gtVal(a._1, b._1) || (!gtVal(b._1, a._1) && a._2 < b._2)

  override def zero: TopKBuf = TopKBuf(Seq.empty)

  override def reduce(buf: TopKBuf, x: (Double, Long)): TopKBuf =
    if (buf.items.size == k && better(buf.items.last, x)) buf
    else TopKBuf((buf.items :+ x).sortWith(better).take(k))

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.items ++ b.items).sortWith(better).take(k))

  override def finish(buf: TopKBuf): TopKBuf = buf

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]

  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
