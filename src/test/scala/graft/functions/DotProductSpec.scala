package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def registered(): Unit =
    org.apache.spark.sql.GraftRegistrar.register(spark)

  test("graft_dot matches the lambda formulation exactly (float arrays)") {
    registered()
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.5f), Array(2.0f, 2.0f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val got = df.select(
      Similarity.fastDot($"a", $"b").as("fast"),
      Similarity.dot($"a", $"b").as("slow")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(got(0).getDouble(0) == 32.0)
  }

  test("graft_dot null-safe and usable from SQL after registration") {
    registered()
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.selectExpr("graft_dot(a, b)").first().isNullAt(0))
    assert(spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .first().getDouble(0) == 11.0)
  }

  test("graft_dot matches lambda null semantics: length mismatch / null element → null") {
    registered()
    // parquet-backed so neither constant folding nor the local path hides codegen
    val dir = java.nio.file.Files.createTempDirectory("graft_dot").resolve("t").toString
    Seq(
      (1L, Array[java.lang.Float](1.0f), Array[java.lang.Float](1.0f, 2.0f)), // lengths differ
      (2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)), // null elem
      (3L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, 4.0f)) // clean
    ).toDF("id", "a", "b").write.parquet(dir)
    val t = spark.read.parquet(dir)
    val both = t.select($"id", Similarity.dot($"a", $"b").as("lam"),
        Similarity.fastDot($"a", $"b").as("nat"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2),
        if (r.isNullAt(2)) 0.0 else r.getDouble(2))).sortBy(_._1)
    both.foreach { case (id, lamNull, natNull, _) =>
      assert(lamNull == natNull, s"row $id: lambda null=$lamNull native null=$natNull")
    }
    assert(both(2)._4 == 11.0)
  }

  test("optimizer rule rewrites the lambda dot-product to DotProductF") {
    // parquet-backed input so constant folding can't collapse the plan
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lambdaForm = e.select(Similarity.dot($"embedding", $"embedding").as("d"))
    val optimized = lambdaForm.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"rule did not fire:\n$optimized")
    // and the rewritten plan computes the same values as the native form
    val a = lambdaForm.limit(20).collect().map(_.getDouble(0)).toSeq
    val b = e.select(Similarity.fastDot($"embedding", $"embedding").as("d"))
      .limit(20).collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }

  test("graft_dot survives whole-stage codegen over parquet float vectors") {
    registered()
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = e.limit(50)
      .select(
        Similarity.fastDot($"embedding", $"embedding").as("fast"),
        Similarity.dot($"embedding", $"embedding").as("slow"))
      .collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }
}
