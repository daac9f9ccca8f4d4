package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Scalable lag over a GLOBAL order.
  *
  * `Window.orderBy(...)` with no partitionBy collapses the whole dataset
  * into ONE task — correct, but a non-starter at 100 TB. The scalable
  * shape of the same semantics:
  *
  *   1. `repartitionByRange` on the order columns — partitions are
  *      globally ordered ranges (one sampling pass + one shuffle);
  *   2. sort within each partition, lag locally with a carried value;
  *   3. patch partition boundaries: the first row of partition i needs the
  *      last value of partition i−1 — per-partition tails are a
  *      #partitions-sized collect, broadcast back.
  *
  * Determinism requires the order columns to be a total order (add a
  * unique tiebreaker). Used by the interaction-graph queries; the chat
  * engine proper never needs it (its windows partition by file).
  */
object GlobalLag {

  def withLag(df: DataFrame, orderCols: Seq[String], valueCol: String,
      out: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.conf.get("spark.sql.shuffle.partitions").toInt, 1)
    // persisted for the two passes (tails, then lag); MEMORY_AND_DISK so
    // big inputs spill instead of evicting. Spark's ContextCleaner
    // auto-unpersists once the plan is unreachable on the driver, so
    // repeated calls do not accumulate pinned storage.
    val sorted = df
      .repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vIdx = sorted.schema.fieldIndex(valueCol)

    // pass 1: last value of each non-empty partition (tiny)
    val tails = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var last: Any = null
      var has = false
      while (it.hasNext) { last = it.next().get(vIdx); has = true }
      if (has) Iterator.single((i, last)) else Iterator.empty
    }.collect().toMap

    // prev-for-partition i = tail of the nearest earlier non-empty partition
    val numParts = sorted.rdd.getNumPartitions
    var carried: Any = null
    val prevFor = (0 until numParts).map { i =>
      val p = i -> carried
      if (tails.contains(i)) carried = tails(i)
      p
    }.toMap
    val bc = spark.sparkContext.broadcast(prevFor)

    // pass 2: local lag with the patched seed
    val outSchema = sorted.schema.add(out, sorted.schema(vIdx).dataType, nullable = true)
    val rdd = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var prev: Any = bc.value.getOrElse(i, null)
      it.map { r =>
        val o = Row.fromSeq(r.toSeq :+ prev)
        prev = r.get(vIdx)
        o
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
