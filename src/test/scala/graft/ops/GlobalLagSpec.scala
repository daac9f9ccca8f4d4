package graft.ops

import graft.SparkSpec
import graft.relational.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalLagSpec extends SparkSpec {

  test("range-partitioned global lag == single-partition window lag (real events)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "ts_ns")

    val viaWindow = ev
      .withColumn("prev", lag("user_id", 1).over(Window.orderBy("ts_ns", "event_id")))
      .select("event_id", "prev").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap

    val viaGlobal = GlobalLag.withLag(ev, Seq("ts_ns", "event_id"), "user_id", "prev")
      .select("event_id", "prev").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap

    assert(viaGlobal == viaWindow)
    assert(viaGlobal.size == 1000)
    // the scalable plan runs over many partitions, not one
    assert(GlobalLag.withLag(ev, Seq("ts_ns", "event_id"), "user_id", "prev")
      .rdd.getNumPartitions > 1)
  }
}
