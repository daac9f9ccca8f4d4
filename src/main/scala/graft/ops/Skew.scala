package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (100 TB design note made concrete).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one join key dominates so heavily that even split
  * partitions of it won't fit an executor (the classic power-law actor in
  * an interaction graph). Technique: add a random salt 0..n-1 to the big
  * side's key, replicate the small side n× (one row per salt), join on
  * (key, salt) — the hot key's rows spread over n partitions.
  */
object Skew {

  /** Salted equi-join: `big ⋈ small` on `key`, with the big side's rows
    * scattered across `salts` sub-keys. Inner joins only (replication
    * would double-count outer rows).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = big.withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-k heavy-hitter keys by frequency — the diagnostic used to decide
    * whether salting is needed (run on a sample at scale).
    */
  def heavyHitters(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(k)
}
