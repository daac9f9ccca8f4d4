package graft.ops

import graft.SparkSpec
import graft.sources.Io
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Plan-level proof of the two core 100 TB layout mechanisms. */
class BucketingSpec extends SparkSpec {

  test("co-bucketed join has no shuffle exchange on either side") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 4)

    val joined = Bucketing.coBucketedJoin(spark, "li_b", "o_b", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // and it's still correct
    val expect = li.join(o, "l_orderkey").count()
    assert(joined.count() == expect)
  }

  test("partitioned layout prunes non-matching partitions at scan time") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = Files.createTempDirectory("graft_part").resolve("docs").toString
    Io.writePartitioned(docs, dir, Seq("lang"))

    val scan = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning:\n$plan")
    assert(scan.count() == docs.filter(col("lang") === "en").count())
  }
}
