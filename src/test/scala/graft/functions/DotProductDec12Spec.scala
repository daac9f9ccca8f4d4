package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bit-exactness contract of [[DotProductDec12F]]: the per-row decimal
  * bridge must equal the exploded `posexplode → join on i → SUM(CAST(x*y
  * AS DECIMAL(28,12)))` pipeline VALUE FOR VALUE — that pipeline is what
  * the DuckDB oracle replays for the whole embedding query family, so any
  * divergence here is an oracle-parity regression.
  */
class DotProductDec12Spec extends SparkSpec {
  import spark.implicits._

  private val decP = DecimalType(28, 12)

  private def dec12(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftRegistrar.column(
      DotProductDec12F(
        org.apache.spark.sql.GraftRegistrar.expression(a),
        org.apache.spark.sql.GraftRegistrar.expression(b)))

  /** The old pipeline, as a reference implementation over (id, a, b). */
  private def explodedDot(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ea = df.select(col("id"), posexplode(col("a")).as(Seq("i", "x")))
      .withColumn("x", col("x").cast(DoubleType))
    val eb = df.select(col("id").as("id_b"),
        posexplode(col("b")).as(Seq("i_b", "y")))
      .withColumn("y", col("y").cast(DoubleType))
    ea.join(eb, col("id") === col("id_b") && col("i") === col("i_b"))
      .groupBy("id")
      .agg(sum((col("x") * col("y")).cast(decP)).as("ref"))
  }

  test("dec12 dot equals the exploded Cast+Sum pipeline bit-for-bit " +
    "on real parquet float vectors (decimal AND double forms)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // self-dot (norms) and a shifted pairing (dots) over the whole table
    val pairs = e.select(col("vec_id").as("id"), col("embedding").as("a"))
      .join(e.select((col("vec_id") + 1).as("id"), col("embedding").as("b")),
        Seq("id"))
    val ref = explodedDot(pairs)
    val got = pairs.select(col("id"), dec12(col("a"), col("b")).as("got"))
    val joined = ref.join(got, Seq("id"))
      .select(col("id"), col("ref"), col("got"),
        col("ref").cast(DoubleType).as("refd"),
        col("got").cast(DoubleType).as("gotd"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getDecimal(1) == r.getDecimal(2),
        s"id ${r.getLong(0)}: decimal ${r.getDecimal(1)} != ${r.getDecimal(2)}")
      assert(r.getDouble(3) == r.getDouble(4),
        s"id ${r.getLong(0)}: double ${r.getDouble(3)} != ${r.getDouble(4)}")
    }
  }

  test("dec12 dot matches Spark's double->decimal cast rounding on " +
    "adversarial magnitudes (deterministic pseudo-random doubles)") {
    // values spanning 1e-13..1e6 exercise HALF_UP rounding at scale 12
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val scale = math.pow(10.0, (i % 20) - 13)
      (i.toLong,
        Array.fill(7)((rnd.nextDouble() - 0.5) * scale),
        Array.fill(7)((rnd.nextDouble() - 0.5) * scale))
    }
    val dir = java.nio.file.Files
      .createTempDirectory("dec12").resolve("t").toString
    rows.toDF("id", "a", "b").write.parquet(dir) // parquet: forces codegen path
    val t = spark.read.parquet(dir)
    val ref = explodedDot(t)
    val got = t.select(col("id"), dec12(col("a"), col("b")).as("got"))
    ref.join(got, Seq("id")).collect().foreach { r =>
      assert(r.getDecimal(1) == r.getDecimal(2), s"row ${r.getLong(0)}")
    }
  }

  test("dec12 dot null semantics mirror Cast+Sum: null elements skipped, " +
    "unmatched tail indices ignored, all-skipped -> null") {
    val dir = java.nio.file.Files
      .createTempDirectory("dec12n").resolve("t").toString
    Seq(
      (1L, Array[java.lang.Double](1.5, null, 2.0),
        Array[java.lang.Double](2.0, 3.0, 4.0)), // null elem -> term skipped
      (2L, Array[java.lang.Double](1.0),
        Array[java.lang.Double](1.0, 99.0)), // length mismatch: tail ignored
      (3L, Array[java.lang.Double](null),
        Array[java.lang.Double](1.0)) // every term skipped -> null sum
    ).toDF("id", "a", "b").write.parquet(dir)
    val t = spark.read.parquet(dir)
    val got = t.select(col("id"), dec12(col("a"), col("b")).as("g"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDecimal(1))).toMap
    assert(got(1) == new java.math.BigDecimal("11.000000000000"))
    assert(got(2) == new java.math.BigDecimal("1.000000000000"))
    assert(got(3) == null)
  }
}
