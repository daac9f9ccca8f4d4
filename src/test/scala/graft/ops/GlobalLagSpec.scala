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

    // The scalable plan runs over many partitions, not one. AQE rightly
    // coalesces 1000 rows into a single post-shuffle partition, so pin
    // coalescing off to observe the plan shape that holds at scale.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      assert(GlobalLag.withLag(ev, Seq("ts_ns", "event_id"), "user_id", "prev")
        .rdd.getNumPartitions > 1)
    } finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }

    // And it stays on the DataFrame layer: every window in the main path
    // partitions by the range-partition id (the only global window is the
    // #partitions-sized seeds frame — constant-size, never the data).
    val plan = GlobalLag.withLag(ev, Seq("ts_ns", "event_id"), "user_id", "prev")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(__graft_pid"),
      s"expected pid-partitioned window in:\n$plan")
  }

  test("tolerates non-numeric spark.sql.shuffle.partitions (AQE 'auto')") {
    // OSS Spark validates the conf at set() so "auto" can only reach the
    // operator on forks that accept it — the parse is tested directly
    assert(GlobalLag.parsePartitions("auto", 8) == 8)
    assert(GlobalLag.parsePartitions("32", 8) == 32)
    assert(GlobalLag.parsePartitions("0", 8) == 1) // never below 1
  }
}
