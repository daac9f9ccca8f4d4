package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-quality constraint auditing (the Deequ/Great-Expectations shape)
  * — the validation gate a training-data pipeline runs before a corpus
  * version is allowed downstream: completeness, uniqueness, row-level
  * consistency, value ranges, and cross-table referential integrity,
  * each reported as (check_name, n_checked, n_violations, passed).
  *
  * Scale shape: ALL single-table checks fuse into ONE aggregation pass
  * over the table (each check is an aggregate expression — a violation
  * counter — evaluated in the same map-side-combined agg), then explode
  * to one row per check; N checks never cost N scans. Referential
  * checks are one anti-join each (child-keyed shuffle, parent side
  * broadcast when small). Everything is exact integer counting.
  */
object Audit {

  /** One constraint: `violations` must be an AGGREGATE expression
    * counting violating rows (e.g. `sum(when(cond, 1))`).
    */
  final case class Check(name: String, violations: Column)

  /** Uniqueness violations = rows − distinct keys. */
  def unique(name: String, key: Column): Check =
    Check(name, count(lit(1)) - count_distinct(key))

  /** Completeness violations = null rows. */
  def complete(name: String, c: Column): Check =
    Check(name, sum(when(c.isNull, 1L).otherwise(0L)))

  /** Row-predicate violations (consistency / range rules). */
  def satisfies(name: String, pred: Column): Check =
    Check(name, sum(when(!pred, 1L).otherwise(0L)))

  /** Run all checks in ONE aggregation pass over `df`. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = count(lit(1)).as("_n") +:
      checks.zipWithIndex.map { case (c, i) => c.violations.as(s"_v$i") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check_name"),
          col("_n").cast(LongType).as("n_checked"),
          coalesce(col(s"_v$i"), lit(0L)).cast(LongType).as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.check_name"), col("r.n_checked"), col("r.n_violations"),
        when(col("r.n_violations") === 0L, 1L).otherwise(0L).as("passed"))
  }

  /** Cross-table referential integrity: child keys with no parent.
    * One row, same schema as [[audit]]'s output.
    */
  def refCheck(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("n_checked"))
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
        "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    total.crossJoin(orphans)
      .select(lit(name).as("check_name"),
        col("n_checked").cast(LongType).as("n_checked"),
        col("n_violations").cast(LongType).as("n_violations"),
        when(col("n_violations") === 0L, 1L).otherwise(0L).as("passed"))
  }

  /** Merkle-style replica diff (anti-entropy repair's read path): find
    * WHERE two table replicas diverge while exchanging only O(buckets)
    * summary state, never the tables. Each side folds its rows into
    * per-bucket digests — (count, bit_xor of row digests, sum of row
    * digests): xor catches any single flip, count catches pure
    * adds/drops, and the sum makes a compensating double-flip require a
    * simultaneous md5 collision — then ONLY the mismatched buckets are
    * re-scanned row-level (one semi-join per side, partition-prunable
    * on a bucket-partitioned table) and keys categorized `only_a` /
    * `only_b` / `modified`. At 100 TB per replica the comparison moves
    * kilobytes of bucket digests plus the diverging buckets' rows; a
    * naive full-table except/anti-join would shuffle both corpora.
    *
    * `rowDigest` must be a deterministic BIGINT digest of the row's
    * key+payload (the md5-hex-to-long idiom); `keyCol` unique per side.
    * Returns (key, bucket, digest_a, digest_b, diff_type) for every
    * diverging key.
    */
  def merkleBucketDiff(a: DataFrame, b: DataFrame, keyCol: String,
      rowDigest: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def prep(df: DataFrame): DataFrame =
      df.select(col(keyCol).as("k"), rowDigest.cast(LongType).as("dg"),
        pmod(col(keyCol), lit(buckets.toLong)).as("bucket"))
    def summarize(df: DataFrame, tag: String): DataFrame =
      prep(df).groupBy("bucket").agg(
        count(lit(1)).as(s"n_$tag"),
        expr("bit_xor(dg)").as(s"x_$tag"),
        // DECIMAL sum: 60-bit digests summed over a bucket overflow
        // BIGINT under ANSI mode; the sum is a checksum, any exact
        // wide type serves
        sum(col("dg").cast("decimal(38,0)")).as(s"s_$tag"))
    val mismatched = summarize(a, "a")
      .join(summarize(b, "b"), Seq("bucket"), "full_outer")
      .filter(col("n_a").isNull || col("n_b").isNull ||
        col("n_a") =!= col("n_b") || col("x_a") =!= col("x_b") ||
        col("s_a") =!= col("s_b"))
      .select("bucket")
    val ra = prep(a).join(mismatched, Seq("bucket"), "left_semi")
    val rb = prep(b).join(mismatched, Seq("bucket"), "left_semi")
    ra.select(col("bucket"), col("k"), col("dg").as("digest_a"))
      .join(rb.select(col("bucket"), col("k"), col("dg").as("digest_b")),
        Seq("bucket", "k"), "full_outer")
      .filter(col("digest_a").isNull || col("digest_b").isNull ||
        col("digest_a") =!= col("digest_b"))
      .select(col("k"), col("bucket"), col("digest_a"), col("digest_b"),
        when(col("digest_b").isNull, "only_a")
          .when(col("digest_a").isNull, "only_b")
          .otherwise("modified").as("diff_type"))
  }
}
