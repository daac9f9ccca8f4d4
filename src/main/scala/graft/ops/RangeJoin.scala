package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join — the second classic operator Spark SQL has no
  * native form for. A naive inequality join plans as
  * BroadcastNestedLoopJoin (O(n·m), a non-starter at scale); this is the
  * standard bucketization rewrite: quantize time into `windowSec` buckets,
  * explode the left side to its two candidate buckets, equi-join on
  * (key, bucket) — hash join, one shuffle — then apply the exact range
  * predicate to the (tiny) candidate set.
  */
object RangeJoin {

  /** Ordered pairs (a, b) on the same key with
    * `a.ts < b.ts <= a.ts + windowSec` (epoch-second granularity).
    * Output: key, id_a, id_b, gap_s.
    */
  def timeWindowPairs(
      df: DataFrame, key: String, tsSec: String, idCol: String,
      windowSec: Int): DataFrame = {
    require(windowSec > 0)
    val bucket = floor(col(tsSec) / windowSec)
    val a = df.select(col(key), col(tsSec).as("a_sec"), col(idCol).as("id_a"),
      explode(array(bucket, bucket + 1)).as("_bk"))
    val b = df.select(col(key).as("_kb"), col(tsSec).as("b_sec"),
      col(idCol).as("id_b"), bucket.as("_bkb"))
    a.join(b, col(key) === col("_kb") && col("_bk") === col("_bkb"))
      .filter(col("b_sec") > col("a_sec") && col("b_sec") <= col("a_sec") + windowSec)
      .select(col(key), col("id_a"), col("id_b"),
        (col("b_sec") - col("a_sec")).as("gap_s"))
  }
}
