package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Zone-map DATA SKIPPING over a range-clustered table copy — the
  * lakehouse file-pruning primitive (Delta/Iceberg column stats, ORC/
  * Parquet row-group min-max) as a standing, CDC-maintained artifact.
  *
  * Reference behavior: the POC answers every filter by scanning the whole
  * collection (`POC/backend/main.py` reads the full chat table and filters
  * in process). At 100 TB a selective range predicate must not touch the
  * ~all of the data at all: the table is laid out in key-range buckets and
  * a doc-count-independent ZONE TABLE (per-bucket min/max/count) routes
  * each query to the buckets whose actual [min,max] can intersect it —
  * IO scales with the answer, not the corpus.
  *
  * Layout (one [[VersionedIndex]] root — crash-atomic, multi-writer-safe,
  * grace-windowed like the text and IVF-PQ indexes):
  *  - `data`, partitioned by `zbucket` — the clustered table copy. Bucket
  *    boundaries are FIXED at build (lo + k·step, stored in stats) so CDC
  *    routing is stable; out-of-range keys clamp to the edge buckets.
  *  - `zones`, unpartitioned — one row per non-empty bucket: zmin, zmax,
  *    n_rows of the keys ACTUALLY present (tighter than the boundary
  *    math whenever buckets are sparse — that is the zone-map's edge
  *    over pure arithmetic routing).
  *
  * Serving reads `zones` (n_buckets rows — kilobytes at any corpus
  * size), collects the overlapping bucket ids (bounded by n_buckets,
  * never corpus-sized), and STATICALLY prunes the data read to those
  * partition directories: unselected buckets are never even listed.
  *
  * CDC ([[update]]) is upsert-by-key and delta-sized: only the buckets
  * the delta routes to are rewritten (standing rows merged with the
  * delta per bucket); `zones` — bucket-count-sized — is recomputed for
  * touched buckets and rewritten whole, inside the same commit, so a
  * reader can never pair new data with stale zone stats.
  */
object ZoneMap {

  /** Data artifact schema = key + payload columns + the partition column;
    * reconstructed for empty prunes from the manifest's column list.
    */
  private def dataSchema(cols: Seq[(String, String)]): StructType =
    StructType(cols.map { case (n, t) =>
      StructField(n, org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(t))
    })

  private def bucketExpr(keyCol: String, lo: Long, step: Long,
      nBuckets: Int) =
    // exact integer routing (div, never double division): keys below the
    // build-time range clamp to bucket 0, above it to the last bucket
    expr(s"CAST(least(${nBuckets - 1}L, greatest(0L, " +
      s"(CAST($keyCol AS BIGINT) - ${lo}L) div ${step}L)) AS INT)")

  /** Build and commit the clustered copy + zone table. `df` must carry a
    * numeric key column; every other column rides as payload. One pass
    * for the global range, one shuffled write clustered by bucket, one
    * bucket-count-sized aggregation for the zones.
    */
  def build(df: DataFrame, keyCol: String, dir: String,
      nBuckets: Int = 64): Unit = {
    val s = df.sparkSession
    val r = df.agg(min(col(keyCol).cast(LongType)),
      max(col(keyCol).cast(LongType))).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val step = math.max(1L, (hi - lo) / nBuckets + 1)
    val c = VersionedIndex.begin(s, dir)
    try {
      val bucketed = df
        .withColumn("zbucket", bucketExpr(keyCol, lo, step, nBuckets))
      bucketed
        .repartition(math.min(nBuckets, 32), col("zbucket"))
        .sortWithinPartitions(col("zbucket"), col(keyCol))
        .write.mode("overwrite").partitionBy("zbucket")
        .parquet(s"${c.gen}/data")
      // zones from the just-written copy: stats describe EXACTLY the
      // committed bytes (not the pre-shuffle plan), same discipline as
      // the text index's corpus stats
      zonesOf(s.read.parquet(s"${c.gen}/data"), keyCol)
        .coalesce(1).write.mode("overwrite").parquet(s"${c.gen}/zones")
      val parts = Map(
        "data" -> VersionedIndex.writtenPartDirs(s, s"${c.gen}/data")
          .map(_ -> c.genLabel).toMap,
        "zones" -> Map("-" -> c.genLabel))
      c.finish(VersionedIndex.Manifest(parts,
        Map("n_buckets" -> nBuckets.toLong, "range_lo" -> lo,
          "step" -> step)))
    } catch { case e: Throwable => c.abort(); throw e }
  }

  private def zonesOf(data: DataFrame, keyCol: String): DataFrame =
    data.groupBy(col("zbucket").cast(IntegerType).as("zbucket"))
      .agg(min(col(keyCol).cast(LongType)).as("zmin"),
        max(col(keyCol).cast(LongType)).as("zmax"),
        count(lit(1)).as("n_rows"))

  /** The committed zone table (bucket-count-sized). */
  def readZones(spark: SparkSession, dir: String): DataFrame = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    VersionedIndex.readArtifact(spark, dir, m, "zones", None,
      dataSchema(Seq("zbucket" -> "INT", "zmin" -> "BIGINT",
        "zmax" -> "BIGINT", "n_rows" -> "BIGINT")))
  }

  /** Full-scan view of the committed data (tests, rebuild comparisons). */
  def readData(spark: SparkSession, dir: String): DataFrame = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    VersionedIndex.readArtifact(spark, dir, m, "data", None,
      throw new IllegalStateException("built index cannot be empty"))
  }

  /** Serve `lo <= key <= hi`: zone-routed, statically pruned. Returns
    * the matching DATA rows (payload included); the caller aggregates/
    * projects. The zone read and the bucket-id collect are both bounded
    * by n_buckets — driver-safe at any corpus size.
    */
  def rangeQuery(spark: SparkSession, dir: String, keyCol: String,
      lo: Long, hi: Long): DataFrame = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    val zones = VersionedIndex.readArtifact(spark, dir, m, "zones", None,
      dataSchema(Seq("zbucket" -> "INT", "zmin" -> "BIGINT",
        "zmax" -> "BIGINT", "n_rows" -> "BIGINT")))
    val hit = zones.filter(col("zmin") <= hi && col("zmax") >= lo)
      .select("zbucket").collect().map(_.getInt(0)).toSeq
    val sel = hit.map(b => s"zbucket=$b").toSet
    val empty = dataSchemaFromManifest(spark, dir, m)
    VersionedIndex.readArtifact(spark, dir, m, "data", Some(sel), empty)
      .filter(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** Partition directories [[rangeQuery]] would read for [lo, hi] — the
    * test/probe view of the pruning decision.
    */
  def prunedSelection(spark: SparkSession, dir: String, lo: Long,
      hi: Long): (Int, Int) = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    val zones = VersionedIndex.readArtifact(spark, dir, m, "zones", None,
      dataSchema(Seq("zbucket" -> "INT", "zmin" -> "BIGINT",
        "zmax" -> "BIGINT", "n_rows" -> "BIGINT")))
    val hit = zones.filter(col("zmin") <= hi && col("zmax") >= lo).count()
    (hit.toInt, m.parts("data").size)
  }

  private def dataSchemaFromManifest(spark: SparkSession, dir: String,
      m: VersionedIndex.Manifest): StructType = {
    // any live partition's footer carries the payload schema; the
    // partition column is re-added as INT (one footer read, not a scan)
    val (pd, g) = m.parts("data").head
    val one = spark.read.parquet(s"$dir/$g/data/$pd").schema
    StructType(one.fields :+ StructField("zbucket", IntegerType))
  }

  /** Upsert `delta` (same payload schema, keyed by `mergeKeys`) into the
    * standing artifact: ONE commit rewriting only the buckets the delta
    * routes to. Standing rows in touched buckets whose merge key matches
    * a delta row are replaced; all other standing rows ride along
    * unchanged; untouched buckets keep their files and mtimes.
    */
  def update(spark: SparkSession, dir: String, delta: DataFrame,
      keyCol: String, mergeKeys: Seq[String]): Unit = {
    val c = VersionedIndex.begin(spark, dir)
    try {
      val m = c.baseManifest
      val lo = m.stats("range_lo")
      val step = m.stats("step")
      val nBuckets = m.stats("n_buckets").toInt
      val routed = delta
        .withColumn("zbucket", bucketExpr(keyCol, lo, step, nBuckets))
      val touched = routed.select("zbucket").distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      val sel = touched.map(b => s"zbucket=$b").toSet
      val standing = VersionedIndex.readArtifact(spark, dir, m, "data",
        Some(sel), dataSchemaFromManifest(spark, dir, m))
      val kept = standing.join(
        broadcast(routed.select(mergeKeys.map(col): _*).distinct()),
        mergeKeys, "left_anti")
      val merged = kept.unionByName(routed)
      merged.repartition(math.min(touched.size, 32), col("zbucket"))
        .sortWithinPartitions(col("zbucket"), col(keyCol))
        .write.mode("overwrite").partitionBy("zbucket")
        .parquet(s"${c.gen}/data")
      val written = VersionedIndex.writtenPartDirs(spark, s"${c.gen}/data")
      require(written.toSet.subsetOf(sel),
        s"update wrote outside its touched buckets: $written vs $sel")
      val dataParts = m.parts("data") ++ written.map(_ -> c.genLabel)
      // zones: recompute the touched buckets from the just-written data,
      // splice into the standing zone rows, rewrite whole (bucket-count-
      // sized) in the SAME commit
      val oldZones = VersionedIndex.readArtifact(spark, dir, m, "zones",
        None, dataSchema(Seq("zbucket" -> "INT", "zmin" -> "BIGINT",
          "zmax" -> "BIGINT", "n_rows" -> "BIGINT")))
      val newTouched = zonesOf(
        spark.read.parquet(s"${c.gen}/data"), keyCol)
      oldZones.filter(!col("zbucket").isin(touched: _*))
        .unionByName(newTouched)
        .coalesce(1).write.mode("overwrite").parquet(s"${c.gen}/zones")
      c.finish(VersionedIndex.Manifest(
        m.parts.updated("data", dataParts)
          .updated("zones", Map("-" -> c.genLabel)),
        m.stats))
    } catch { case e: Throwable => c.abort(); throw e }
  }
}
