package graft.functions

import graft.SparkSpec
import graft.ops.Contamination
import org.apache.spark.sql.GraftRegistrar
import org.apache.spark.sql.functions._

class BloomMightContainSpec extends SparkSpec {
  import spark.implicits._

  test("bloom probe agrees with the filter object on hits and misses") {
    val keys = spark.range(0, 1000).select(xxhash64($"id").as("gh"))
    val bf = keys.stat.bloomFilter("gh", 1000, 0.01)
    // probe the SAME key derivation through the native expression
    val probe = GraftRegistrar.column(
      BloomMightContainLong(GraftRegistrar.expression(xxhash64($"id")), bf))
    val got = spark.range(0, 2000).select($"id", probe.as("hit")).collect()
    got.foreach { r =>
      val id = r.getLong(0); val hit = r.getBoolean(1)
      if (id < 1000) assert(hit, s"false negative for inserted id $id")
      // misses may false-positive (bounded by fpp) but must match the object
    }
    val fpRate = got.count(r => r.getLong(0) >= 1000 && r.getBoolean(1)) / 1000.0
    assert(fpRate < 0.05, s"false-positive rate $fpRate far above configured 0.01")
  }

  test("probe is null-safe and survives whole-stage codegen over parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").resolve("t").toString
    Seq(Some("alpha"), Some("beta"), None, Some("gamma"))
      .toDF("w").write.parquet(dir)
    val t = spark.read.parquet(dir)
    val bf = Seq("alpha", "gamma").toDF("w")
      .select(xxhash64($"w").as("gh")).stat.bloomFilter("gh", 10, 0.01)
    val probe = GraftRegistrar.column(
      BloomMightContainLong(GraftRegistrar.expression(xxhash64($"w")), bf))
    val rows = t.select($"w", probe.as("hit")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else Boolean.box(r.getBoolean(1)))).toMap
    assert(rows("alpha") == true && rows("gamma") == true)
    // xxhash64 hashes null to the seed, so via that child the probe never
    // sees a null; the expression's own null path needs a nullable LONG:
    val nullProbe = GraftRegistrar.column(
      BloomMightContainLong(
        GraftRegistrar.expression(when($"w".isNull, lit(null).cast("bigint"))
          .otherwise(xxhash64($"w"))), bf))
    val nullRow = t.filter($"w".isNull).select(nullProbe).first()
    assert(nullRow.isNullAt(0), "null key must yield null, not a probe")
  }

  test("ngramOverlapBloom plans the native probe, not a UDF, and matches exact") {
    val docs = (0 until 40).map { i =>
      val words = (0 until 20).map(k => s"w${(i * 7 + k) % 30}").mkString(" ")
      (i.toLong, words)
    }.toDF("doc_id", "text")
    val train = docs.filter($"doc_id" % 2 === 0)
    val eval = docs.filter($"doc_id" % 2 === 1)
    val bloom = Contamination.ngramOverlapBloom(train, eval, "doc_id", "text", n = 3)
    val plan = bloom.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"),
      s"native probe missing from plan:\n$plan")
    assert(!plan.contains("UDF"), s"UDF still present in plan:\n$plan")
    val exact = Contamination.ngramOverlap(train, eval, "doc_id", "text", n = 3)
    assert(bloom.orderBy("id").collect().toSeq ==
      exact.orderBy("id").collect().toSeq,
      "bloom path must be bit-identical to the exact path")
  }
}
