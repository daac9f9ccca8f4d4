package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[MaterializedSummary]]: the refresh algebra (existing groups add,
  * new groups insert), equivalence to a from-scratch rebuild, the
  * crash-killed refresh serving the old generation, and the catalog
  * re-point after refresh.
  */
class MaterializedSummarySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("ms_spec_").toString

  private val dims = Seq("g")
  private val sums = Seq("v")

  test("refresh ≡ from-scratch rebuild over base ∪ delta") {
    val base = Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("g", "v")
    val delta = Seq(("a", 5L), ("c", 7L)).toDF("g", "v") // new group c
    val dir = freshDir()
    MaterializedSummary.build(spark, base, dir, dims, sums)
    MaterializedSummary.refresh(spark, dir, delta, dims, sums)
    val got = spark.read.parquet(
        MaterializedSummary.currentPath(spark, dir))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 8L), ("b", 1L, 10L), ("c", 1L, 7L)))
  }

  test("a refresh killed before the pointer flip serves the old summary") {
    val base = Seq(("a", 1L)).toDF("g", "v")
    val dir = freshDir()
    MaterializedSummary.build(spark, base, dir, dims, sums)
    val before = MaterializedSummary.currentPath(spark, dir)
    VersionedIndex.crashHook = {
      case "pre-pointer" => throw new RuntimeException("injected crash")
      case _ =>
    }
    try intercept[RuntimeException] {
      MaterializedSummary.refresh(spark, dir,
        Seq(("a", 9L)).toDF("g", "v"), dims, sums)
    } finally VersionedIndex.crashHook = _ => ()
    assert(MaterializedSummary.currentPath(spark, dir) == before)
    val got = spark.read.parquet(before).as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("a", 1L, 1L)))
    // and the retry applies cleanly
    MaterializedSummary.refresh(spark, dir,
      Seq(("a", 9L)).toDF("g", "v"), dims, sums)
    val after = spark.read.parquet(
      MaterializedSummary.currentPath(spark, dir))
      .as[(String, Long, Long)].collect()
    assert(after.toSeq == Seq(("a", 2L, 10L)))
  }

  test("registerCurrent re-points the rewrite at the refreshed generation") {
    val basePath = java.nio.file.Files
      .createTempDirectory("ms_base_").toString + "/t"
    Seq(("a", 1L), ("b", 2L)).toDF("g", "v")
      .write.mode("overwrite").parquet(basePath)
    val dir = freshDir()
    MaterializedSummary.build(spark, spark.read.parquet(basePath),
      dir, dims, sums)
    MaterializedSummary.registerCurrent(spark, basePath, dir,
      dims.toSet, sums.toSet)
    def served() = spark.read.parquet(basePath)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(served() == Seq(("a", 1L, 1L), ("b", 1L, 2L)))
    // append to base AND refresh+re-register: the same query text now
    // serves the new generation's numbers
    Seq(("b", 5L)).toDF("g", "v").write.mode("append").parquet(basePath)
    MaterializedSummary.refresh(spark, dir,
      Seq(("b", 5L)).toDF("g", "v"), dims, sums)
    MaterializedSummary.registerCurrent(spark, basePath, dir,
      dims.toSet, sums.toSet)
    assert(served() == Seq(("a", 1L, 1L), ("b", 2L, 7L)))
  }
}
