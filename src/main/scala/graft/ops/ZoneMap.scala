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
  *    boundaries are FIXED at build and stored in the manifest stats so
  *    CDC routing is stable — either fixed-width (lo + k·step) or
  *    EQUI-DEPTH (explicit key-quantile bounds, the skew-proof mode: a
  *    zipfian key gets near-equal rows per bucket where fixed-width
  *    piles the mass into a few); out-of-range keys clamp to the edge
  *    buckets. Keys may be integral, DATE or TIMESTAMP (routing runs on
  *    the integral epoch form recorded in `key_kind`).
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

  /** Integral form of the clustering key, by the `key_kind` stat the
    * build records: integral columns cast, DATE keys become epoch days
    * (matching the Int a Catalyst DateType literal carries), TIMESTAMP
    * keys epoch micros (matching the Long a TimestampType literal
    * carries). NTZ timestamps route through a cast — exact under the
    * UTC session every entry point pins.
    */
  private[graft] def keyKindOf(dt: DataType): Long = dt match {
    case DateType => 1L
    case TimestampType => 2L
    case _: org.apache.spark.sql.types.TimestampNTZType => 3L
    case ByteType | ShortType | IntegerType | LongType => 0L
    case other => throw new IllegalArgumentException(
      s"zone-map key must be integral, DATE or TIMESTAMP, got $other")
  }

  private[graft] def intKeySql(kind: Long, keyCol: String): String =
    kind match {
      // unix_date returns INT — widen so zone stats, range args and the
      // routing arithmetic are uniformly BIGINT across key kinds
      case 1L => s"CAST(unix_date($keyCol) AS BIGINT)"
      case 2L => s"unix_micros($keyCol)"
      case 3L => s"unix_micros(CAST($keyCol AS TIMESTAMP))"
      case _ => s"CAST($keyCol AS BIGINT)"
    }

  /** Explicit equi-depth bucket bounds from the manifest stats (sorted
    * ascending; bucket i covers keys in [bound(i-1), bound(i)) with the
    * open edges clamping to buckets 0 and n-1).
    */
  private def depthBounds(stats: Map[String, Long]): Seq[Long] =
    (0 until stats("n_bounds").toInt).map(i => stats(f"bound_$i%04d"))

  /** Manifest-driven bucket routing: FIXED-WIDTH mode routes by the
    * build-time (lo, step) arithmetic; EQUI-DEPTH mode counts the stored
    * explicit bounds ≤ key (a literal-array filter — codegen-friendly,
    * n_buckets-sized). Both clamp out-of-range keys to the edge buckets,
    * so CDC routing is total and stable under any later key range.
    */
  private[graft] def bucketExpr(stats: Map[String, Long], keyCol: String) = {
    val k = intKeySql(stats.getOrElse("key_kind", 0L), keyCol)
    if (stats.getOrElse("mode_depth", 0L) == 1L) {
      val bs = depthBounds(stats)
      if (bs.isEmpty) expr("CAST(0 AS INT)")
      else expr(s"CAST(size(filter(array(${bs.mkString("L, ")}L), " +
        s"b -> b <= $k)) AS INT)")
    } else {
      val (lo, step) = (stats("range_lo"), stats("step"))
      val nBuckets = stats("n_buckets").toInt
      // exact integer routing (div, never double division): keys below
      // the build-time range clamp to bucket 0, above it to the last
      expr(s"CAST(least(${nBuckets - 1}L, greatest(0L, " +
        s"($k - ${lo}L) div ${step}L)) AS INT)")
    }
  }

  /** Shuffle width for the clustered writes: the session's shuffle
    * parallelism (cluster-scaled — thousands on a real cluster, never a
    * hard-coded ceiling), overridable per build. Combined with RANGE
    * partitioning on (zbucket, key), write tasks split proportionally to
    * bucket row mass: a hot bucket spans many tasks (multiple files per
    * partition — the manifest and compaction already support that),
    * while cold buckets coalesce into shared tasks.
    */
  private def writeWidth(spark: SparkSession,
      explicit: Option[Int] = None): Int =
    explicit.getOrElse(math.max(1, spark.sessionState.conf.numShufflePartitions))

  /** Bloom sizing: ~10 bits/key (k = 4 double-hashed probes → ~1.2% FP).
    * Hashes are Spark's xxhash64 with two seeds — evaluated as ordinary
    * codegen'd expressions, never a UDF.
    */
  private val BloomBitsPerKey = 10
  private val BloomK = 4

  /** Probe i of the double-hash family, overflow-safe: both hashes
    * reduce mod m before combining. Shared verbatim by the build and
    * lookup sides so the bit positions agree exactly.
    */
  private def bloomProbe(valueSql: String, i: Int, mSql: String) =
    expr(s"pmod(pmod(xxhash64($valueSql, 1), $mSql) + " +
      s"$i * pmod(xxhash64($valueSql, 2), $mSql), $mSql)")

  /** Per-bucket bloom words over `bloomCol`: (zbucket, idx, word) rows,
    * m bits per bucket = next multiple of 64 ≥ bits/key · bucket rows
    * (per-bucket m rides in the zone table). Word mass is corpus/6.4
    * bits, so the artifact is PARTITIONED by zbucket and maintained
    * exactly like `data` — touched buckets only.
    */
  private def bloomWordsOf(data: DataFrame, bloomCol: String,
      zones: DataFrame): DataFrame = {
    val withM = data.join(
      broadcast(zones.select(col("zbucket"), col("bloom_m"))), Seq("zbucket"))
    // hash the BIGINT form: xxhash64 is type-sensitive, and the lookup
    // side probes with a BIGINT literal — both sides must hash 8 bytes.
    // Each hash reduces mod m BEFORE the double-hash combine: the raw
    // h1 + i·h2 wraps int64 (ANSI overflow); the reduced form stays
    // below (BloomK+1)·m and is the same probe sequence
    val probes = (0 until BloomK).map(i => bloomProbe(
      s"CAST($bloomCol AS BIGINT)", i, "bloom_m").as(s"p$i"))
    withM.select(col("zbucket") +: probes: _*)
      .select(col("zbucket"),
        explode(array((0 until BloomK).map(i => col(s"p$i")): _*)).as("pos"))
      .select(col("zbucket"), expr("pos div 64").cast(IntegerType).as("idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy("zbucket", "idx")
      .agg(expr("bit_or(bit)").as("word"))
  }

  private def zonesWithBloomM(data: DataFrame, keyCol: String,
      keyKind: Long): DataFrame =
    zonesOf(data, keyCol, keyKind).withColumn("bloom_m",
      expr(s"CAST(((n_rows * $BloomBitsPerKey + 63) div 64) * 64 AS BIGINT)"))

  /** Equi-depth bucket bounds for `df`'s key: nBuckets−1 interior
    * quantiles via the Greenwald–Khanna sketch (`approxQuantile` — ONE
    * distributed pass with constant per-partition state, the 100 TB-safe
    * form; an exact global rank would need a full sort). Approximation
    * never touches correctness: routing is total for any bounds, zones
    * carry the ACTUAL per-bucket min/max, and serves re-filter exactly —
    * bounds quality only affects bucket balance, where ±0.1% of rank is
    * noise. Duplicate quantiles (a single key value holding >1/nBuckets
    * of the mass) collapse: that value's rows are one bucket by
    * construction, the irreducible floor of any value-clustered layout.
    */
  private def equiDepthBounds(df: DataFrame, keyCol: String,
      keyKind: Long, nBuckets: Int): Seq[Long] = {
    val intKey = df.select(expr(intKeySql(keyKind, keyCol)).as("_ik"))
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    intKey.stat.approxQuantile("_ik", probs, 0.001)
      .map(_.toLong).distinct.sorted.toSeq
  }

  /** Build and commit the clustered copy + zone table (+ optional bloom
    * artifact over a secondary, non-clustered column — the point-lookup
    * companion to the zone map's range routing). `df` must carry an
    * integral/DATE/TIMESTAMP key column; every other column rides as
    * payload.
    *
    * `equiDepth = false` (default): fixed-width bucket bounds over the
    * global [min, max] — one cheap agg pass, ideal for uniform keys.
    * `equiDepth = true`: DISTRIBUTION-AWARE bounds (nBuckets−1 key
    * quantiles, stored explicitly in the manifest stats) — a zipfian or
    * hot-range key gets near-equal rows per bucket where fixed-width
    * would pile the mass into a few hot buckets (no pruning inside the
    * hot range, hot write partitions at CDC time). Routing, CDC, serve
    * and the rewrite rule all read the mode from the manifest — callers
    * never re-state it.
    *
    * Writes are RANGE-partitioned on (zbucket, key) at the session's
    * shuffle width (`writeTasks` overrides): task allocation follows row
    * mass, so a hot bucket splits across many tasks/files and the write
    * has no fixed ceiling (the old 32-task cap serialized 100 TB builds).
    */
  def build(df: DataFrame, keyCol: String, dir: String,
      nBuckets: Int = 64, bloomCol: Option[String] = None,
      equiDepth: Boolean = false, writeTasks: Option[Int] = None): Unit = {
    val s = df.sparkSession
    val kind = keyKindOf(df.schema(keyCol).dataType)
    val stats: Map[String, Long] =
      if (equiDepth) {
        val bs = equiDepthBounds(df, keyCol, kind, nBuckets)
        Map("n_buckets" -> (bs.size + 1L), "mode_depth" -> 1L,
          "key_kind" -> kind, "n_bounds" -> bs.size.toLong) ++
          bs.zipWithIndex.map { case (b, i) => f"bound_$i%04d" -> b }
      } else {
        val r = df.agg(min(expr(intKeySql(kind, keyCol))),
          max(expr(intKeySql(kind, keyCol)))).head()
        val (lo, hi) = (r.getLong(0), r.getLong(1))
        Map("n_buckets" -> nBuckets.toLong, "range_lo" -> lo,
          "step" -> math.max(1L, (hi - lo) / nBuckets + 1),
          "key_kind" -> kind)
      }
    val c = VersionedIndex.begin(s, dir)
    try {
      bloomCol.foreach(bc => writeBloomCol(s, dir, bc))
      val width = writeWidth(s, writeTasks)
      df.withColumn("zbucket", bucketExpr(stats, keyCol))
        .repartitionByRange(width, col("zbucket"), col(keyCol))
        .sortWithinPartitions(col("zbucket"), col(keyCol))
        .write.mode("overwrite").partitionBy("zbucket")
        .parquet(s"${c.gen}/data")
      // zones from the just-written copy: stats describe EXACTLY the
      // committed bytes (not the pre-shuffle plan), same discipline as
      // the text index's corpus stats
      val committed = s.read.parquet(s"${c.gen}/data")
      val zones = zonesWithBloomM(committed, keyCol, kind)
      zones.coalesce(1).write.mode("overwrite").parquet(s"${c.gen}/zones")
      bloomCol.foreach { bc =>
        bloomWordsOf(committed, bc,
            s.read.parquet(s"${c.gen}/zones"))
          .repartitionByRange(width, col("zbucket"), col("idx"))
          .sortWithinPartitions(col("zbucket"), col("idx"))
          .write.mode("overwrite").partitionBy("zbucket")
          .parquet(s"${c.gen}/blooms")
      }
      val parts = Map(
        "data" -> VersionedIndex.writtenPartDirs(s, s"${c.gen}/data")
          .map(_ -> c.genLabel).toMap,
        "zones" -> Map("-" -> c.genLabel)) ++
        bloomCol.map(_ => "blooms" -> VersionedIndex
          .writtenPartDirs(s, s"${c.gen}/blooms")
          .map(_ -> c.genLabel).toMap)
      c.finish(VersionedIndex.Manifest(parts, stats))
    } catch { case e: Throwable => c.abort(); throw e }
  }

  private def zonesOf(data: DataFrame, keyCol: String,
      keyKind: Long): DataFrame =
    data.groupBy(col("zbucket").cast(IntegerType).as("zbucket"))
      .agg(min(expr(intKeySql(keyKind, keyCol))).as("zmin"),
        max(expr(intKeySql(keyKind, keyCol))).as("zmax"),
        count(lit(1)).as("n_rows"))

  /** The committed zone table (bucket-count-sized). */
  def readZones(spark: SparkSession, dir: String): DataFrame = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    VersionedIndex.readArtifact(spark, dir, m, "zones", None,
      dataSchema(Seq("zbucket" -> "INT", "zmin" -> "BIGINT",
        "zmax" -> "BIGINT", "n_rows" -> "BIGINT", "bloom_m" -> "BIGINT")))
  }

  /** Full-scan view of the committed data (tests, rebuild comparisons). */
  def readData(spark: SparkSession, dir: String): DataFrame = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    VersionedIndex.readArtifact(spark, dir, m, "data", None,
      throw new IllegalStateException("built index cannot be empty"))
  }

  /** Zone rows collected once per committed version — the planner-side
    * rule ([[graft.plans.SkipRewrite]]) routes every matching query
    * through these, so the n_buckets-bounded collect must not re-run per
    * query compile. Keyed by (dir, version): a CDC commit bumps the
    * version and naturally invalidates; superseded entries are dropped
    * so a long-lived session doesn't accumulate one array per commit.
    */
  private val zoneCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), Array[(Int, Long, Long)]]()

  private[graft] def zoneRows(spark: SparkSession, dir: String, version: Long,
      m: VersionedIndex.Manifest): Array[(Int, Long, Long)] = {
    val got = zoneCache.computeIfAbsent((dir, version), _ =>
      VersionedIndex.readArtifact(spark, dir, m, "zones", None,
          dataSchema(Seq("zbucket" -> "INT", "zmin" -> "BIGINT",
            "zmax" -> "BIGINT", "n_rows" -> "BIGINT", "bloom_m" -> "BIGINT")))
        .select("zbucket", "zmin", "zmax").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))))
    zoneCache.keySet.removeIf(k => k._1 == dir && k._2 < version)
    got
  }

  /** Bucket-routed UNFILTERED data for the conjunction of an optional
    * key range, an optional key IN-list, and an optional bloom-column
    * IN-list — the planner-facing serve [[graft.plans.SkipRewrite]]
    * substitutes for a base-table scan (the exact predicate re-applies
    * on top, so routing only has to be a superset of the matching rows).
    * None = that side unbounded. All values are in the key's integral
    * form (the Catalyst literal representation — epoch days/micros for
    * DATE/TIMESTAMP keys). Routing cost: the IN intersection is an
    * n_buckets × |values| driver loop over the cached zone rows; the
    * bloom probe is ONE (n_buckets × k × |values|)-bounded job.
    */
  def routedData(spark: SparkSession, dir: String, lo: Option[Long],
      hi: Option[Long], bloomValues: Option[Seq[Long]],
      inValues: Option[Seq[Long]] = None): DataFrame = {
    val (v, m) = VersionedIndex.readManifest(spark, dir)
    val zones = zoneRows(spark, dir, v, m)
    val rangeHit = zones
      .filter { case (_, zmin, zmax) =>
        zmin <= hi.getOrElse(Long.MaxValue) &&
          zmax >= lo.getOrElse(Long.MinValue) }
      .map(_._1).toSet
    val inHit = inValues.fold(rangeHit) { vals =>
      val sorted = vals.sorted.toArray
      // a bucket survives iff some IN value falls inside its ACTUAL
      // [zmin, zmax] — binary search per bucket, never per row
      rangeHit.filter { b =>
        zones.find(_._1 == b).exists { case (_, zmin, zmax) =>
          val i = java.util.Arrays.binarySearch(sorted, zmin)
          val at = if (i >= 0) i else -i - 1
          at < sorted.length && sorted(at) <= zmax
        }
      }
    }
    val hit = bloomValues match {
      case Some(values) => inHit.intersect(
        bloomCandidates(spark, dir, values).toSet)
      case None => inHit
    }
    val sel = hit.map(b => s"zbucket=$b")
    VersionedIndex.readArtifact(spark, dir, m, "data", Some(sel),
      dataSchemaFromManifest(spark, dir, m))
  }

  /** Serve `lo <= key <= hi`: zone-routed, statically pruned. Returns
    * the matching DATA rows (payload included); the caller aggregates/
    * projects. The zone read and the bucket-id collect are both bounded
    * by n_buckets — driver-safe at any corpus size.
    *
    * `asOfVersion` serves the layout AS OF an older committed version —
    * TIME TRAVEL over the standing artifact, valid for any version the
    * retention window ([[VersionedIndex.begin]]'s `keepLast`) still
    * holds: the old manifest's partition directories are immutable and
    * GC keeps them until keepLast later commits, so the read is exactly
    * the bytes that version served when it was current. Zones AND data
    * resolve through the same old manifest — the routing can never mix
    * generations.
    */
  def rangeQuery(spark: SparkSession, dir: String, keyCol: String,
      lo: Long, hi: Long, asOfVersion: Option[Long] = None): DataFrame = {
    val m = asOfVersion match {
      case Some(v) => VersionedIndex.readManifestAt(spark, dir, v)
        .getOrElse(throw new IllegalStateException(
          s"$dir holds no manifest v$v — outside the retention window"))
      case None => VersionedIndex.readManifest(spark, dir)._2
    }
    val zones = VersionedIndex.readArtifact(spark, dir, m, "zones", None,
      dataSchema(Seq("zbucket" -> "INT", "zmin" -> "BIGINT",
        "zmax" -> "BIGINT", "n_rows" -> "BIGINT", "bloom_m" -> "BIGINT")))
    val hit = zones.filter(col("zmin") <= hi && col("zmax") >= lo)
      .select("zbucket").collect().map(_.getInt(0)).toSeq
    val sel = hit.map(b => s"zbucket=$b").toSet
    val empty = dataSchemaFromManifest(spark, dir, m)
    val ik = expr(intKeySql(m.stats.getOrElse("key_kind", 0L), keyCol))
    VersionedIndex.readArtifact(spark, dir, m, "data", Some(sel), empty)
      .filter(ik >= lo && ik <= hi)
  }

  /** Partition directories [[rangeQuery]] would read for [lo, hi] — the
    * test/probe view of the pruning decision.
    */
  def prunedSelection(spark: SparkSession, dir: String, lo: Long,
      hi: Long): (Int, Int) = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    val zones = VersionedIndex.readArtifact(spark, dir, m, "zones", None,
      dataSchema(Seq("zbucket" -> "INT", "zmin" -> "BIGINT",
        "zmax" -> "BIGINT", "n_rows" -> "BIGINT", "bloom_m" -> "BIGINT")))
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
    *
    * CONTRACT: `delta` must carry at most one row per merge key — the
    * upsert replaces-by-key, so duplicate delta keys would both land
    * (the same contract as ChatStore's MERGE and the text index's doc
    * upsert; callers dedupe upstream where sources can repeat).
    */
  def update(spark: SparkSession, dir: String, delta: DataFrame,
      keyCol: String, mergeKeys: Seq[String], keepLast: Int = 2,
      autoCompact: Option[Int] = None): Unit = {
    val c = VersionedIndex.begin(spark, dir, keepLast)
    val committed =
      try {
        val m = c.baseManifest
        val routed = delta
          .withColumn("zbucket", bucketExpr(m.stats, keyCol))
        val touched = routed.select("zbucket").distinct()
          .collect().map(_.getInt(0)).toSeq.sorted
        // empty micro-batch (foreachBatch CDC hands these): nothing to
        // commit — abort cleanly instead of repartition(0, …) throwing
        if (touched.isEmpty) { c.abort(); false }
        else {
          applyUpdate(spark, dir, c, m, routed, touched, keyCol, mergeKeys)
          true
        }
      } catch { case e: Throwable => c.abort(); throw e }
    // auto-compaction policy: follow-on commit collapsing any bucket
    // whose file count exceeded the threshold (no-op when none did).
    // Skipped entirely when the upsert aborted as a no-op. CONTRACT: an
    // exception from here on means the upsert COMMITTED and only this
    // follow-on maintenance commit failed — the layout is consistent and
    // a retry may simply re-run compact().
    if (committed) autoCompact.foreach(n => compact(spark, dir, n, keepLast))
  }

  /** COMPACTION (see [[VersionedIndex.compactPartitioned]]): collapse
    * data/bloom bucket partitions holding more than `targetFiles`
    * parquet files to one file each as one crash-safe commit;
    * conforming partitions keep their generation dirs and mtimes.
    * Returns partitions compacted.
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 1,
      keepLast: Int = 2): Int =
    VersionedIndex.compactPartitioned(spark, dir,
      Seq("data" -> "zbucket", "blooms" -> "zbucket"), targetFiles,
      keepLast)

  private def applyUpdate(spark: SparkSession, dir: String,
      c: VersionedIndex.Commit, m: VersionedIndex.Manifest,
      routed: DataFrame, touched: Seq[Int], keyCol: String,
      mergeKeys: Seq[String]): Unit = {
    // failures abort in the caller's catch (this runs inside update's try)
    {
      val sel = touched.map(b => s"zbucket=$b").toSet
      val standing = VersionedIndex.readArtifact(spark, dir, m, "data",
        Some(sel), dataSchemaFromManifest(spark, dir, m))
      // null-safe key match (<=>): a NULL merge-key component is a legal
      // payload value, and a plain equi-anti-join would KEEP the standing
      // row a NULL-keyed delta row replaces — duplicating the group
      val dKeys = routed.select(mergeKeys.map(col): _*).distinct().alias("D")
      val kept = standing.alias("S")
        .join(broadcast(dKeys),
          mergeKeys.map(k => col(s"S.$k") <=> col(s"D.$k")).reduce(_ && _),
          "left_anti")
      val merged = kept.unionByName(routed)
      merged.repartitionByRange(writeWidth(spark),
          col("zbucket"), col(keyCol))
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
          "zmax" -> "BIGINT", "n_rows" -> "BIGINT", "bloom_m" -> "BIGINT")))
      val newTouched = zonesWithBloomM(
        spark.read.parquet(s"${c.gen}/data"), keyCol,
        m.stats.getOrElse("key_kind", 0L))
      oldZones.filter(!col("zbucket").isin(touched: _*))
        .unionByName(newTouched)
        .coalesce(1).write.mode("overwrite").parquet(s"${c.gen}/zones")
      // blooms (when built): a bloom cannot subtract a replaced key, so
      // each TOUCHED bucket's words rebuild from its merged rows — the
      // rebuild is bucket-sized, the same budget as the data rewrite it
      // rides with; untouched buckets keep their word files
      val bloomParts = m.parts.get("blooms").map { standingBlooms =>
        val bc = bloomColOf(spark, dir, m)
        bloomWordsOf(spark.read.parquet(s"${c.gen}/data"),
            bc, spark.read.parquet(s"${c.gen}/zones")
              .filter(col("zbucket").isin(touched: _*)))
          .repartitionByRange(writeWidth(spark), col("zbucket"), col("idx"))
          .sortWithinPartitions(col("zbucket"), col("idx"))
          .write.mode("overwrite").partitionBy("zbucket")
          .parquet(s"${c.gen}/blooms")
        standingBlooms ++ VersionedIndex
          .writtenPartDirs(spark, s"${c.gen}/blooms")
          .map(_ -> c.genLabel)
      }
      c.finish(VersionedIndex.Manifest(
        m.parts.updated("data", dataParts)
          .updated("zones", Map("-" -> c.genLabel)) ++
          bloomParts.map("blooms" -> _),
        m.stats))
    }
  }

  /** DELETE CDC: remove every data row whose `matchCols` tuple appears
    * in `keys`, as ONE crash-atomic commit. Routing follows the match
    * columns: a key-column match routes through the bucket expression
    * (delta-sized — only the buckets the keys map to are rewritten);
    * any other match column must visit every live bucket (the layout
    * cannot prove absence on a column it is not clustered on), but the
    * rewrite is still per-bucket and the commit shape identical. Zones
    * for touched buckets are recomputed from the surviving rows and
    * blooms rebuilt (a bloom cannot subtract); a bucket whose rows are
    * ALL deleted drops out of the manifest entirely — readers stop
    * listing it. Superseded generations keep the usual one-commit grace;
    * forget flows chain [[VersionedIndex.sweepGrace]] for physical
    * erasure and [[residualAudit]] to PROVE it.
    */
  def delete(spark: SparkSession, dir: String, keyCol: String,
      keys: DataFrame, matchCols: Seq[String],
      keepLast: Int = 2): Unit = {
    val c = VersionedIndex.begin(spark, dir, keepLast)
    try {
      val m = c.baseManifest
      val k = keys.select(matchCols.map(col): _*).distinct()
      val live = m.parts.getOrElse("data", Map.empty).keys
        .map(_.stripPrefix("zbucket=").toInt).toSeq.sorted
      val touched: Seq[Int] =
        if (matchCols.contains(keyCol)) {
          val routed = k.withColumn("zbucket", bucketExpr(m.stats, keyCol))
            .select("zbucket").distinct()
            .collect().map(_.getInt(0)).toSet
          live.filter(routed)
        } else live
      if (touched.isEmpty) { c.abort() }
      else {
        val sel = touched.map(b => s"zbucket=$b").toSet
        val standing = VersionedIndex.readArtifact(spark, dir, m, "data",
          Some(sel), dataSchemaFromManifest(spark, dir, m))
        // null-safe for the same reason as update's anti-join: a NULL
        // match-column value must be deletable, not silently immortal
        val remaining = standing.alias("S")
          .join(broadcast(k.alias("D")),
            matchCols.map(c => col(s"S.$c") <=> col(s"D.$c")).reduce(_ && _),
            "left_anti")
        remaining
          .repartitionByRange(writeWidth(spark), col("zbucket"), col(keyCol))
          .sortWithinPartitions(col("zbucket"), col(keyCol))
          .write.mode("overwrite").partitionBy("zbucket")
          .parquet(s"${c.gen}/data")
        val written = VersionedIndex.writtenPartDirs(spark, s"${c.gen}/data")
        require(written.toSet.subsetOf(sel),
          s"delete wrote outside its touched buckets: $written vs $sel")
        // emptied buckets: in sel but not re-written → out of the manifest
        val dataParts = (m.parts("data") -- sel) ++
          written.map(_ -> c.genLabel)
        val oldZones = VersionedIndex.readArtifact(spark, dir, m, "zones",
          None, dataSchema(Seq("zbucket" -> "INT", "zmin" -> "BIGINT",
            "zmax" -> "BIGINT", "n_rows" -> "BIGINT", "bloom_m" -> "BIGINT")))
          .filter(!col("zbucket").isin(touched: _*))
        val zones =
          if (written.isEmpty) oldZones
          else oldZones.unionByName(
            zonesWithBloomM(spark.read.parquet(s"${c.gen}/data"), keyCol,
              m.stats.getOrElse("key_kind", 0L)))
        zones.coalesce(1).write.mode("overwrite").parquet(s"${c.gen}/zones")
        val bloomParts = m.parts.get("blooms").map { standingBlooms =>
          if (written.nonEmpty) {
            val bc = bloomColOf(spark, dir, m)
            bloomWordsOf(spark.read.parquet(s"${c.gen}/data"), bc,
                spark.read.parquet(s"${c.gen}/zones")
                  .filter(col("zbucket").isin(touched: _*)))
              .repartitionByRange(writeWidth(spark),
                col("zbucket"), col("idx"))
              .sortWithinPartitions(col("zbucket"), col("idx"))
              .write.mode("overwrite").partitionBy("zbucket")
              .parquet(s"${c.gen}/blooms")
          }
          (standingBlooms -- sel) ++ VersionedIndex
            .writtenPartDirs(spark, s"${c.gen}/blooms")
            .map(_ -> c.genLabel)
        }
        c.finish(VersionedIndex.Manifest(
          m.parts.updated("data", dataParts)
            .updated("zones", Map("-" -> c.genLabel)) ++
            bloomParts.map("blooms" -> _),
          m.stats))
      }
    } catch { case e: Throwable => c.abort(); throw e }
  }

  /** CHANGE DATA FEED between two committed versions of the layout —
    * the CDC-OUT side of the protocol (downstream consumers subscribe
    * to a standing artifact's changes without replaying the inputs):
    * row-level (op ∈ insert/delete/update) diff keyed by `mergeKeys`,
    * computed by reading ONLY the partitions whose generation differs
    * between the two manifests. Both manifests must still be inside the
    * retention window ([[VersionedIndex.begin]]'s keepLast). Cost is
    * touched-partition-sized: an untouched bucket is never listed, and
    * identical rows inside rewritten buckets are dropped by a null-safe
    * payload compare — the same shape as ChatStore.changeFeed, lifted
    * onto the partitioned manifest so the diff scales with the delta,
    * not the corpus.
    */
  def changeFeed(spark: SparkSession, dir: String, vFrom: Long, vTo: Long,
      mergeKeys: Seq[String]): DataFrame = {
    def manifestAt(v: Long) = VersionedIndex.readManifestAt(spark, dir, v)
      .getOrElse(throw new IllegalStateException(
        s"$dir holds no manifest v$v — outside the retention window"))
    val (mA, mB) = (manifestAt(vFrom), manifestAt(vTo))
    val pa = mA.parts.getOrElse("data", Map.empty)
    val pb = mB.parts.getOrElse("data", Map.empty)
    val changed = (pa.keySet ++ pb.keySet)
      .filter(pd => pa.get(pd) != pb.get(pd))
    val schema = dataSchemaFromManifest(spark, dir,
      if (pb.nonEmpty) mB else mA)
    val payload = schema.fields.map(_.name)
      .filterNot(n => mergeKeys.contains(n) || n == "zbucket")
    // per-key payload MULTISET (order-free via sort_array): repeated
    // merge keys are legal in the layout (the upsert replaces the whole
    // key group), so the diff compares each key's row multiset rather
    // than pairing rows — a key-equi-join would cross-pair duplicates
    // and report unchanged ride-along rows as updates
    def side(m: VersionedIndex.Manifest, tag: String) =
      VersionedIndex.readArtifact(spark, dir, m, "data", Some(changed),
          schema)
        .groupBy(mergeKeys.map(col): _*)
        .agg(sort_array(collect_list(struct(payload.map(col): _*)))
          .as(s"_$tag"))
    // null-safe key equality (<=>): NULL merge keys are legal payload
    // values in the layout, and a plain equi-join would never equate a
    // NULL key group present in both versions — misreporting an update
    // as a delete plus an insert
    val (a, b) = (side(mA, "a").alias("A"), side(mB, "b").alias("B"))
    val on = mergeKeys.map(k => col(s"A.$k") <=> col(s"B.$k"))
      .reduce(_ && _)
    a.join(b, on, "full_outer")
      .filter(!(col("_a") <=> col("_b")))
      .select(mergeKeys.map(k =>
        when(col("_a").isNull, col(s"B.$k"))
          .otherwise(col(s"A.$k")).as(k)) :+
        when(col("_b").isNull, lit("delete"))
          .when(col("_a").isNull, lit("insert"))
          .otherwise(lit("update")).as("op"): _*)
  }

  /** Data-partition directories whose generation differs between two
    * in-window versions — the test/probe view of [[changeFeed]]'s read
    * footprint (manifest-sized to compute).
    */
  def changedPartitions(spark: SparkSession, dir: String, vFrom: Long,
      vTo: Long): Set[String] = {
    def parts(v: Long) = VersionedIndex.readManifestAt(spark, dir, v)
      .getOrElse(throw new IllegalStateException(s"no manifest v$v"))
      .parts.getOrElse("data", Map.empty)
    val (pa, pb) = (parts(vFrom), parts(vTo))
    (pa.keySet ++ pb.keySet).filter(pd => pa.get(pd) != pb.get(pd))
  }

  /** Physical-residue audit for delete/forget flows: reads EVERY data
    * partition directory physically present under the index root — any
    * generation, manifest-reachable or not — and counts rows whose
    * `matchCols` tuple appears in `keys`. Returns (partition dirs
    * scanned, matching rows found); erasure is proven only by (n, 0).
    * A delete that left the grace generation in place (no
    * [[VersionedIndex.sweepGrace]]) reports its residue here.
    */
  def residualAudit(spark: SparkSession, dir: String,
      keys: DataFrame, matchCols: Seq[String]): (Long, Long) = {
    val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    val partDirs = scala.util.Try(f.listStatus(root)).toOption
      .getOrElse(Array.empty).map(_.getPath)
      .filter(p => p.getName.startsWith("g") &&
        p.getName.drop(1).forall(_.isDigit))
      .flatMap { g =>
        val dataDir = new org.apache.hadoop.fs.Path(g, "data")
        scala.util.Try(f.listStatus(dataDir)).toOption
          .getOrElse(Array.empty).map(_.getPath)
          .filter(_.getName.startsWith("zbucket="))
      }.map(_.toString).sorted
    if (partDirs.isEmpty) return (0L, 0L)
    val k = keys.select(matchCols.map(col): _*).distinct()
      .localCheckpoint(true)
    // one multi-path scan over every on-disk generation's partitions
    val residue = partDirs.groupBy(p => p.split("/").dropRight(1).mkString("/"))
      .toSeq.sortBy(_._1).map { case (base, ps) =>
        spark.read.option("basePath", base).parquet(ps.toSeq: _*)
      }.reduce(_.unionByName(_))
      .join(broadcast(k), matchCols, "left_semi").count()
    k.unpersist(blocking = false)
    (partDirs.length.toLong, residue)
  }

  /** The bloom column name, from the one-line `bloom_col` sidecar the
    * build writes — maintenance must probe the SAME column the build
    * hashed, and the artifact should be self-describing rather than
    * trusting every update call site to repeat the right name. The
    * sidecar is immutable config (written at build, never rotated), so
    * it lives outside the versioned manifest.
    */
  private def bloomColOf(spark: SparkSession, dir: String,
      m: VersionedIndex.Manifest): String = {
    val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val in = f.open(new org.apache.hadoop.fs.Path(s"$dir/bloom_col"))
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8).trim
    finally in.close()
  }

  private[graft] def writeBloomCol(spark: SparkSession, dir: String,
      bloomCol: String): Unit = {
    val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$dir/bloom_col"), true)
    try out.write(bloomCol.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Bucket ids whose bloom PASSES `value` on the bloom column — the
    * candidate set of a point lookup (exact matches always pass; ~1.2%
    * of non-matching buckets false-positive through). The probe-word
    * read is (n_buckets × k)-bounded: only the probed `idx` words of
    * each bucket's bloom partition are needed, and parquet row-group
    * stats on the idx column prune inside each partition file.
    */
  def bloomCandidates(spark: SparkSession, dir: String,
      value: Long): Seq[Int] = bloomCandidates(spark, dir, Seq(value))

  /** Multi-value form (an IN-list on the bloom column): the candidate
    * set is the UNION of per-value candidates — a bucket survives when
    * ALL k probe bits of AT LEAST ONE value are set. Still ONE job, now
    * (n_buckets × k × |values|)-bounded.
    */
  def bloomCandidates(spark: SparkSession, dir: String,
      values: Seq[Long]): Seq[Int] = {
    require(values.nonEmpty, "bloomCandidates needs at least one value")
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    require(m.parts.contains("blooms"), s"$dir was built without a bloom")
    val zones = VersionedIndex.readArtifact(spark, dir, m, "zones", None,
      dataSchema(Seq("zbucket" -> "INT", "zmin" -> "BIGINT",
        "zmax" -> "BIGINT", "n_rows" -> "BIGINT", "bloom_m" -> "BIGINT")))
    val probes = zones.select(col("zbucket"), col("bloom_m"),
        explode(array(values.map(v => struct(lit(v).as("v"),
          array((0 until BloomK).map(i => bloomProbe(
            s"CAST($v AS BIGINT)", i, "bloom_m")): _*).as("ps"))): _*))
          .as("vp"))
      .select(col("zbucket"), col("vp.v").as("v"),
        explode(col("vp.ps")).as("pos"))
      .select(col("zbucket"), col("v"),
        expr("pos div 64").cast(IntegerType).as("idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
    // push the probed word ids into the bloom scan: every partition must
    // be CONSULTED (each bucket gets a verdict) but only ~k words of it
    // are NEEDED — the words are written sorted by idx, so the pushed
    // isin over the (n_buckets × k)-bounded id union lets parquet
    // row-group stats skip the unprobed word mass inside each partition
    // (without this, a point lookup reads the whole corpus/6.4-bit
    // artifact)
    val probedIdx = probes.select("idx").distinct()
      .collect().map(_.getInt(0)).toSeq
    val words = VersionedIndex.readArtifact(spark, dir, m, "blooms", None,
      dataSchema(Seq("idx" -> "INT", "word" -> "BIGINT",
        "zbucket" -> "INT")))
      .filter(col("idx").isin(probedIdx: _*))
    // per (bucket, value): ALL k bits set → that value passes; a bucket
    // is a candidate when ANY value passes (max over values of the
    // per-value min)
    probes.join(words, Seq("zbucket", "idx"), "left")
      .groupBy("zbucket", "v")
      .agg(min(when(coalesce(col("word"), lit(0L))
        .bitwiseAND(col("bit")) === col("bit"), 1).otherwise(0)).as("pass"))
      .groupBy("zbucket").agg(max(col("pass")).as("pass"))
      .filter(col("pass") === 1)
      .select("zbucket").collect().map(_.getInt(0)).toSeq.sorted
  }

  /** Point lookup on the BLOOM column (the non-clustered axis): bloom-
    * route to candidate buckets, statically prune the data read to them,
    * filter exactly. Zone routing cannot help here — the clustered key
    * is a different column — so without the bloom this is a full scan.
    */
  def pointLookup(spark: SparkSession, dir: String, bloomCol: String,
      value: Long): DataFrame = {
    val (_, m) = VersionedIndex.readManifest(spark, dir)
    val cand = bloomCandidates(spark, dir, value)
    val sel = cand.map(b => s"zbucket=$b").toSet
    VersionedIndex.readArtifact(spark, dir, m, "data", Some(sel),
        dataSchemaFromManifest(spark, dir, m))
      .filter(col(bloomCol) === value)
  }
}
