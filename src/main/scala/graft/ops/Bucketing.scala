package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the mechanism that makes repeated fact-fact
  * joins shuffle-free at 100 TB: both sides pre-hash-partitioned (and
  * sorted) on the join key at write time, so SortMergeJoin reads
  * co-located buckets with NO Exchange on either side. The bench's
  * lineitem⋈orders style joins would be written this way in production;
  * BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed+sorted on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key. */
  def coBucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
