package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Production similarity search over an embedding column
  * (`array<float>`/`array<double>`), designed for scale:
  *
  *  - '''bruteForceTopK''' — broadcast the (small) query set, one pass over
  *    the corpus computing dots in fast double math, per-partition top-k
  *    via window after an AQE-coalesced shuffle on q_id. Exact; the
  *    baseline every ANN variant is measured against.
  *  - '''annBuckets / annTopK''' — sign-random-projection LSH: p
  *    deterministic ±1 hyperplanes (seeded hash bits, no RNG state to
  *    ship), bucket = p-bit signature, candidates only within the query's
  *    bucket (2^p-fold pair reduction; probe neighboring buckets for
  *    recall if needed).
  *
  * Double (not decimal) arithmetic here: these are the fast operators;
  * bit-exact cross-engine parity lives in [[SimilarityQueries]].
  */
object Similarity {

  /** dot(a, b) in double math (sequential, deterministic per row) —
    * interpreted-lambda fallback; prefer [[fastDot]] where the graft_dot
    * native expression is registered.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Codegen'd native dot product (graft.functions.DotProductF). Requires
    * registration: GraftExtensions at build time or GraftRegistrar.register
    * on a live session (SparkEntry does this automatically).
    */
  def fastDot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm2(a: Column): Column = dot(a, a)

  /** Exact cosine top-k: for each row of `queries`, the k nearest corpus
    * rows (excluding identical ids).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("nrm", sqrt(norm2(col("emb"))))
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .withColumn("q_nrm", sqrt(norm2(col("q_emb"))))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("id"))
    c.join(broadcast(q), col("id") =!= col("q_id"))
      .withColumn("cosine", dot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "id", "rnk", "cosine")
  }

  /** Deterministic ±1 hyperplane p (dim components), seeded by md5 bits. */
  private[ops] def hyperplane(p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft:$p:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }

  /** Adds an LSH `bucket` column: p-bit sign signature. */
  def annBuckets(df: DataFrame, embCol: String, planes: Int = 8): DataFrame = {
    val dim = df.select(size(col(embCol))).first().getInt(0)
    val bits = (0 until planes).map { p =>
      val hp = array(hyperplane(p, dim).map(lit): _*)
      when(dot(col(embCol), hp) > 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)
    df.withColumn("bucket", bits)
  }

  /** Embedding-cosine near-dup pairs at scale: candidates only within an
    * LSH bucket (2^planes-fold pair reduction vs all-pairs), then exact
    * cosine threshold. The dedup-family member for embedding columns;
    * recall can be raised by unioning runs with different plane seeds.
    */
  def annNearDupPairs(
      df: DataFrame, idCol: String, embCol: String, threshold: Double,
      planes: Int = 8): DataFrame = {
    val b = annBuckets(df, embCol, planes)
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("bucket"))
      .withColumn("nrm", sqrt(norm2(col("emb"))))
    val x = b.select(col("id").as("id_a"), col("emb").as("emb_a"),
      col("nrm").as("nrm_a"), col("bucket"))
    val y = b.select(col("id").as("id_b"), col("emb").as("emb_b"),
      col("nrm").as("nrm_b"), col("bucket"))
    x.join(y, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", fastDot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** ANN top-k: exact cosine ranking restricted to the query's bucket. */
  def annTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, planes: Int = 8): DataFrame = {
    val c = annBuckets(corpus, embCol, planes)
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("bucket"))
      .withColumn("nrm", sqrt(norm2(col("emb"))))
    val q = annBuckets(queries, embCol, planes)
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"), col("bucket"))
      .withColumn("q_nrm", sqrt(norm2(col("q_emb"))))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("q_id"))
      .withColumn("cosine", dot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "id", "rnk", "cosine")
  }
}
