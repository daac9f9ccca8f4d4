package graft.sources

import graft.QueryDef
import graft.relational.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-gated source/sink format queries: promote [[Io]]'s CSV/JSONL
  * paths from spec-only coverage to a CORRECTNESS row, the way q63 did
  * for the image codecs — the engine's own write→read round trip must
  * preserve the corpus EXACTLY, pinned by a per-language digest the
  * DuckDB oracle computes from the original parquet.
  */
object FormatQueries {

  private def rm(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(root))
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** documents → JSONL sink → JSONL source → CSV sink → CSV source →
    * digest. Any column the chain drops, re-types, null-corrupts, or
    * truncates changes (n, sum_chars, n_nulls, sum_ids, n_sources) for
    * its language and hash-fails against the parquet-direct oracle.
    * JSONL and CSV are the two interchange formats every corpus pipeline
    * still ingests from; both reads use the explicit schema ([[Io]]'s
    * contract — schema inference is a full extra pass at 100 TB).
    */
  val q148_format_roundtrip: QueryDef = QueryDef(
    "q148_format_roundtrip",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_fmt_").toString
      Io.writeJsonLines(Tables.documents(s, d), s"$dir/jsonl")
      Io.writeCsv(Io.readJsonLines(s, s"$dir/jsonl", docsSchema), s"$dir/csv")
      val res = Io.readCsv(s, s"$dir/csv", docsSchema)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).cast(LongType).as("sum_chars"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_nulls"),
          sum("doc_id").cast(LongType).as("sum_ids"),
          countDistinct("source").as("n_sources"))
        .orderBy("lang")
        // materialize the digest BEFORE the staged files go away (q153's
        // teardown discipline — repeated bench runs must not accumulate
        // full-corpus copies in /tmp)
        .localCheckpoint(true)
      rm(dir)
      res
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
      |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    "Format round trip: parquet -> JSONL -> CSV -> digest; the oracle " +
      "digests the original parquet, so any corruption hash-fails")

  /** ORC round trip — the third columnar interchange leg (q148 covers
    * JSONL/CSV): parquet → ORC sink → ORC source → the same per-language
    * digest vs the parquet-direct oracle. ORC is self-describing, so
    * the read needs no explicit schema; type fidelity (int64/strings
    * surviving the ORC writer) is what the digest pins. Same teardown
    * discipline: digest materialized before the staged files are
    * deleted.
    */
  val q201_orc_roundtrip: QueryDef = QueryDef(
    "q201_orc_roundtrip",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_orc_").toString
      Io.writeOrc(Tables.documents(s, d), s"$dir/orc")
      val res = Io.readOrc(s, s"$dir/orc")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).cast(LongType).as("sum_chars"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_nulls"),
          sum("doc_id").cast(LongType).as("sum_ids"),
          countDistinct("source").as("n_sources"))
        .orderBy("lang")
        .localCheckpoint(true)
      rm(dir)
      res
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
      |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    "ORC round trip: parquet -> ORC -> digest vs the parquet-direct " +
      "oracle — type fidelity of the third columnar format")

  /** Avro round trip — the fourth interchange leg (q148 JSONL/CSV, q201
    * ORC): parquet → Avro sink → Avro source → the same per-language
    * digest vs the parquet-direct oracle. Avro is the schema'd ROW
    * format streaming buses interchange (Kafka payloads,
    * schema-registry pipelines) — the one a large pipeline hits at the
    * ingest boundary rather than at rest. Self-describing, so the read
    * needs no explicit schema; what the digest pins is type fidelity
    * across Avro's union-with-null nullability encoding (int64/strings
    * and null text surviving writer + reader). Same teardown
    * discipline: digest materialized before the staged files are
    * deleted.
    */
  val q235_avro_roundtrip: QueryDef = QueryDef(
    "q235_avro_roundtrip",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_avro_").toString
      Io.writeAvro(Tables.documents(s, d), s"$dir/avro")
      val res = Io.readAvro(s, s"$dir/avro")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).cast(LongType).as("sum_chars"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_nulls"),
          sum("doc_id").cast(LongType).as("sum_ids"),
          countDistinct("source").as("n_sources"))
        .orderBy("lang")
        .localCheckpoint(true)
      rm(dir)
      res
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
      |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    "Avro round trip: parquet -> Avro -> digest vs the parquet-direct " +
      "oracle — row-format type fidelity at the streaming-bus boundary")

  /** Parquet SCHEMA EVOLUTION round trip — the lakehouse reality that a
    * table's files span schema generations: generation 1 writes the
    * narrow (doc_id, lang) projection, generation 2 adds `n_chars`, and
    * a mergeSchema read must see the union schema with nulls where the
    * old files lack the column. The digest counts per-language rows,
    * null n_chars (exactly the gen-1 rows), and the gen-2 char sum; the
    * oracle recomputes all three from the ORIGINAL parquet with the
    * same even/odd doc split — any column loss, mis-merge, or null
    * corruption hash-fails.
    */
  val q218_schema_evolution: QueryDef = QueryDef(
    "q218_schema_evolution",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_evo_").toString
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "lang")
        .write.mode("overwrite").parquet(s"$dir/t/gen1")
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/t/gen2")
      val res = s.read.option("mergeSchema", "true")
        .parquet(s"$dir/t/gen1", s"$dir/t/gen2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("n_null_chars"),
          coalesce(sum("n_chars"), lit(0L)).cast(LongType).as("sum_chars"))
        .orderBy("lang")
        .localCheckpoint(true)
      rm(dir)
      res
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_null_chars,
      |  CAST(COALESCE(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END), 0)
      |    AS BIGINT) AS sum_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    "Schema-evolution round trip: two parquet generations, mergeSchema " +
      "union read, nulls exactly where the old generation lacks the column")

  /** Small-file COMPACTION promoted to a CORRECTNESS row (the
    * maintenance op was IoSkewSpec-only): the corpus is written as 64
    * tiny files, compacted to ~4, and the post-compaction digest must
    * equal the parquet-direct oracle — compaction must lose, duplicate,
    * or corrupt nothing. The file-count collapse is asserted in-query
    * (emitted as literal-checked columns, q119's property style).
    */
  val q219_compaction: QueryDef = QueryDef(
    "q219_compaction",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_cmp_").toString
      Tables.documents(s, d).repartition(64)
        .write.mode("overwrite").parquet(s"$dir/t")
      val (before, after) = Io.compact(s, s"$dir/t", targetRows = 2000)
      val res = s.read.parquet(s"$dir/t")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum("doc_id").cast(LongType).as("sum_ids"),
          sum(length(col("text"))).cast(LongType).as("sum_chars"))
        .withColumn("files_shrank",
          lit(if (before >= 64 && after < 16) 1L else 0L))
        .orderBy("lang")
        .localCheckpoint(true)
      rm(dir)
      res
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
      |  CAST(1 AS BIGINT) AS files_shrank
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    "Small-file compaction: 64 files -> ~4 with a byte-identical corpus " +
      "digest; the shrink itself is literal-checked")

  /** STREAMING ingest of the interchange format (the cloud-ingest /
    * Autoloader shape): the corpus lands as JSONL files in a drop
    * directory, a file-source stream picks them up one per micro-batch
    * with the explicit schema, and a complete-mode per-language digest
    * must converge to the batch digest of the original parquet. This is
    * the continuous-ingest twin of q148 — same digest minus n_sources
    * (distinct aggregation is unsupported in streaming; at scale the
    * distinct-source rollup is a downstream batch view, q147's shape).
    */
  val q153_stream_jsonl_ingest: QueryDef = QueryDef(
    "q153_stream_jsonl_ingest",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_q153_").toString
      Io.writeJsonLines(
        Tables.documents(s, d).repartition(3), s"$dir/drop")
      val digest = s.readStream.schema(docsSchema)
        .option("maxFilesPerTrigger", "1").json(s"$dir/drop")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).as("sum_chars"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_nulls"),
          sum("doc_id").as("sum_ids"))
      val sink = "graft_q153_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_q153_ckpt")
      val q = digest.writeStream
        .format("memory").queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .start()
      try { q.processAllAvailable() } finally { q.stop() }
      val res = s.table(sink)
        .select(col("lang"), col("n").cast(LongType).as("n"),
          col("sum_chars").cast(LongType).as("sum_chars"),
          col("n_nulls").cast(LongType).as("n_nulls"),
          col("sum_ids").cast(LongType).as("sum_ids"))
        .orderBy("lang")
        .localCheckpoint(true)
      s.catalog.dropTempView(sink)
      rm(ckpt.toString)
      rm(dir)
      res
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
      |  CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    "Streaming JSONL ingest (file-source micro-batches, explicit " +
      "schema): complete-mode digest converges to the batch digest")

  /** Z-ORDER clustered layout under a content oracle: events written
    * through [[Io.writeZOrdered]] on (user_id, ts_sec) — the
    * multi-dimension data-skipping layout — must read back EXACTLY the
    * corpus that went in (digest per user-bucket vs the parquet-direct
    * oracle). The skipping property itself (every output file covers a
    * small key hyper-rectangle, so per-file min/max footers prune scans
    * on either clustered column) is pinned structurally in IoSkewSpec;
    * this row pins that the reordering write is content-lossless, the
    * same contract q148 pins for interchange formats.
    */
  val q169_zorder_layout: QueryDef = QueryDef(
    "q169_zorder_layout",
    (s, d) => {
      val ev = graft.relational.Tables.events(s, d)
        .select("user_id", "ts_sec", "event_type", "value", "event_id")
      val dir = java.nio.file.Files
        .createTempDirectory("graft_zorder_").toString
      Io.writeZOrdered(ev, dir, Seq("user_id", "ts_sec"), numFiles = 8)
      val res = s.read.parquet(dir)
        .groupBy((col("user_id") % 50).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum("user_id").cast(LongType).as("sum_users"),
          sum("event_id").cast(LongType).as("sum_ids"),
          sum(graft.relational.Sql.dec2(col("value"))).cast("double").as("sum_value"))
        .orderBy("bucket")
        .localCheckpoint(true)
      rm(dir)
      res
    },
    Some("""SELECT user_id % 50 AS bucket, COUNT(*) AS n,
      |  CAST(SUM(user_id) AS BIGINT) AS sum_users,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_ids,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin),
    "Z-order clustered write (Morton-interleaved multi-column layout): " +
      "content-lossless round trip digest-checked against the original")

  /** Hive-partitioned TIME layout + static partition pruning — the
    * bread-and-butter 100 TB fact-table shape (`.../day=19747/...`): the
    * corpus is written `partitionBy(day)`, and a day-range query must
    * then touch ONLY the in-range directories (listing-level pruning —
    * no footer of an out-of-range file is ever opened; the IVF index's
    * DPP rows prove the dynamic variant, this one pins the static
    * PartitionFilters path). The digest restricted to a 5-day window is
    * value-checked against the un-partitioned oracle, proving the
    * layout is content-lossless AND the partition column round-trips
    * through directory encoding (SourcesSpec pins the actual pruned
    * read: selectedPartitions == 5 of ~31).
    */
  val q247_partition_pruning: QueryDef = QueryDef(
    "q247_partition_pruning",
    (s, d) => {
      val ev = graft.relational.Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), expr("ts_sec div 86400").as("day"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_part_").toString
      ev.write.mode("overwrite").partitionBy("day").parquet(dir)
      val res = s.read.parquet(dir)
        .filter(col("day").between(19740L, 19744L))
        .groupBy(col("day").cast(LongType).as("day"))
        .agg(count(lit(1)).as("n"),
          countDistinct("user_id").as("n_users"),
          sum("event_id").cast(LongType).as("sum_ids"),
          sum(graft.relational.Sql.dec2(col("value"))).cast("double")
            .as("sum_value"))
        .orderBy("day")
        .localCheckpoint(true)
      rm(dir)
      res
    },
    Some("""SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |  COUNT(*) AS n,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_ids,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE CAST(floor(epoch(ts) / 86400) AS BIGINT) BETWEEN 19740 AND 19744
      |GROUP BY 1 ORDER BY day""".stripMargin),
    "Hive-partitioned day layout: partitionBy write, statically pruned " +
      "day-range read (PartitionFilters, no out-of-range footer opened), " +
      "content digest vs the un-partitioned oracle")

  /** Multi-dimensional data skipping on the z-ordered layout — the read
    * path q169's write-side row leaves open: events are laid out by the
    * Morton interleave of (day, user_id) and then read through a 2-D
    * box predicate (day range AND user range). Because every output
    * file covers a tight hyper-rectangle of BOTH dimensions, the
    * parquet footer min/max stats prune row groups on the user
    * predicate as well as the day predicate — where q247's 1-d Hive
    * layout can only prune its single directory key and a
    * lexicographic sort only its leading column. The digest restricted
    * to the box is value-checked against the unclustered oracle
    * (q219's discipline: the clustered copy must be content-lossless
    * under the predicate); the files/rows-scanned SHRINKAGE itself is
    * pinned with scan metrics in IoSkewSpec (z-layout reads strictly
    * fewer rows than the lexicographic layout under the same box).
    */
  val q268_zorder_pruning: QueryDef = QueryDef(
    "q268_zorder_pruning",
    (s, d) => {
      val ev = graft.relational.Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          expr("ts_sec div 86400").as("day"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_zprune_").toString
      Io.writeZOrdered(ev, dir, Seq("day", "user_id"), numFiles = 16,
        bits = 8)
      val res = s.read.parquet(dir)
        .filter(col("day").between(19735L, 19742L) &&
          col("user_id").between(30L, 89L))
        .groupBy(col("day").cast(LongType).as("day"))
        .agg(count(lit(1)).as("n"),
          countDistinct("user_id").as("n_users"),
          sum("event_id").cast(LongType).as("sum_ids"),
          sum(graft.relational.Sql.dec2(col("value"))).cast("double")
            .as("sum_value"))
        .orderBy("day")
        .localCheckpoint(true)
      rm(dir)
      res
    },
    Some("""SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |  COUNT(*) AS n,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_ids,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |    BETWEEN 19735 AND 19742
      |  AND user_id BETWEEN 30 AND 89
      |GROUP BY 1 ORDER BY day""".stripMargin),
    "Z-order 2-D data skipping: box predicate (day AND user) over the " +
      "Morton layout, digest vs the unclustered oracle; rows-scanned " +
      "shrinkage pinned in IoSkewSpec")

  /** [[graft.ops.ZoneMap]] range serving (q309): a standing range-
    * clustered lineitem copy + per-bucket min/max zone table (the
    * lakehouse data-skipping shape — Delta/Iceberg file stats), built
    * once and committed through the crash-atomic manifest protocol; the
    * query zone-routes `l_orderkey BETWEEN 1000 AND 1399` and reads ONLY
    * the overlapping bucket partitions (ZoneMapSpec pins the pruned
    * selection and the static file list; the zone read and bucket-id
    * collect are n_buckets-bounded, never corpus-sized). Oracle = the
    * same range aggregate off the raw table — values must be layout-
    * independent.
    */
  val q309_zonemap_range: QueryDef = QueryDef(
    "q309_zonemap_range",
    (s, d) => {
      val idx = graft.ops.CorpusBuilds.lineitemZoneMap(s, d)
      graft.ops.ZoneMap.rangeQuery(s, idx, "l_orderkey", 1000L, 1399L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("qty_cents"),
          sum("l_orderkey").cast(LongType).as("sum_keys"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS qty_cents,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM lineitem
      |WHERE l_orderkey BETWEEN 1000 AND 1399
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "Zone-map data skipping: range query served from the standing " +
      "clustered copy via per-bucket min/max routing + static partition " +
      "pruning, digest vs the raw-table oracle")

  /** [[graft.ops.ZoneMap.update]] (q310): CDC upsert into the standing
    * zone-mapped copy (quantity +5 for orderkeys 1000–1099, merge key
    * orderkey+linenumber) — ONE crash-atomic commit rewriting only the
    * buckets the delta routes to, with the zone rows for those buckets
    * recomputed in the same commit. The serve then range-queries across
    * the updated and untouched buckets together; the oracle replays the
    * upsert arithmetic off the raw table, so a lost delta row, a
    * double-applied replacement, or a stale zone route all hash-fail.
    */
  val q310_zonemap_cdc: QueryDef = QueryDef(
    "q310_zonemap_cdc",
    (s, d) => {
      val idx = graft.ops.CorpusBuilds.lineitemZoneMapCdc(s, d)
      graft.ops.ZoneMap.rangeQuery(s, idx, "l_orderkey", 950L, 1150L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("qty_cents"),
          sum("l_orderkey").cast(LongType).as("sum_keys"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(CAST(q AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS qty_cents,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM (
      |  SELECT l_returnflag, l_orderkey,
      |    CASE WHEN l_orderkey BETWEEN 1000 AND 1099
      |         THEN l_quantity + 5 ELSE l_quantity END AS q
      |  FROM lineitem
      |  WHERE l_orderkey BETWEEN 950 AND 1150) t
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "Zone-map CDC: delta-sized upsert commit (touched buckets + spliced " +
      "zone rows, crash-atomic), then a range serve spanning updated and " +
      "untouched buckets — oracle replays the merge off the raw table")

  /** [[graft.ops.ZoneMap.pointLookup]] (q313): point lookup on the
    * NON-clustered axis (l_partkey) of the zone-mapped copy — zone
    * min/max can't route a column the layout wasn't clustered on, so a
    * per-bucket BLOOM over l_partkey (10 bits/key, 4 double-hashed
    * probes, committed and CDC-maintained with the data) supplies the
    * candidate buckets instead; the data read statically prunes to them
    * and filters exactly. Bloom false positives only widen the read —
    * never the answer — so the raw-table oracle pins correctness while
    * ZoneMapSpec pins the candidate set's tightness.
    */
  val q313_bloom_point: QueryDef = QueryDef(
    "q313_bloom_point",
    (s, d) => {
      val idx = graft.ops.CorpusBuilds.lineitemZoneMapBloom(s, d)
      graft.ops.ZoneMap.pointLookup(s, idx, "l_partkey", 100L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("qty_cents"),
          sum("l_orderkey").cast(LongType).as("sum_keys"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS qty_cents,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM lineitem
      |WHERE l_partkey = 100
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "Bloom-filter data skipping on the non-clustered axis: point lookup " +
      "routed by the per-bucket CDC-maintained bloom, digest vs the " +
      "raw-table oracle")

  /** [[graft.plans.MvRewrite]] (q314): the query is written against the
    * RAW lineitem table — filter + group-by + count/sum — and the
    * registered materialized summary answers it via the Catalyst
    * optimizer rule (COUNT re-aggregated as SUM(cnt), SUM as SUM of the
    * integral partial sums, the dim filter applied to whole MV groups).
    * MvRewriteSpec pins that the optimized plan scans the summary and
    * NOT the base table, and that near-miss shapes (non-dim grouping,
    * non-dim filter, double sums) keep the base scan. The oracle runs
    * the same SQL off the raw table, so a wrong rewrite — stale rows,
    * mis-mapped partial sums, a filter applied after re-aggregation —
    * hash-fails.
    */
  val q314_mv_rewrite: QueryDef = QueryDef(
    "q314_mv_rewrite",
    (s, d) => {
      graft.ops.CorpusBuilds.lineitemMv(s, d)
      Tables.t(s, d, "lineitem")
        .filter(col("l_linestatus") === "F")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum("l_orderkey").cast(LongType).as("sum_keys"),
          sum("l_suppkey").cast(LongType).as("sum_supp"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(SUM(l_suppkey) AS BIGINT) AS sum_supp
      |FROM lineitem
      |WHERE l_linestatus = 'F'
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "Materialized-view auto-rewrite: the aggregate over the raw table is " +
      "served from the registered summary by the Catalyst rule, digest " +
      "vs the raw-table oracle")

  /** [[graft.ops.MaterializedSummary.refresh]] (q315): the summary is
    * built from the ORIGINAL table, incrementally refreshed with an
    * appended delta (delta-sized merge through the crash-atomic
    * versioned commit — the corpus is never re-scanned), and re-pointed
    * in the rewrite catalog; the query then aggregates the APPENDED base
    * table and must be served from the refreshed generation. The oracle
    * replays base ∪ delta off the raw table — a lost delta group, a
    * double-merged count, or a stale generation in the catalog
    * hash-fails. MaterializedSummarySpec pins the refresh algebra and
    * the crash path; PlanAssertionSpec pins the summary scan.
    */
  val q315_mv_refresh: QueryDef = QueryDef(
    "q315_mv_refresh",
    (s, d) => {
      val basePrime = graft.ops.CorpusBuilds.lineitemMvRefreshed(s, d)
      s.read.parquet(basePrime)
        .filter(col("l_linestatus") === "O")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum("l_orderkey").cast(LongType).as("sum_keys"),
          sum("l_suppkey").cast(LongType).as("sum_supp"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(SUM(l_suppkey) AS BIGINT) AS sum_supp
      |FROM (
      |  SELECT l_returnflag, l_linestatus, l_orderkey, l_suppkey
      |  FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, l_linestatus, l_orderkey, l_suppkey
      |  FROM lineitem WHERE l_orderkey % 13 = 0) t
      |WHERE l_linestatus = 'O'
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "Incrementally refreshed materialized summary: delta-sized merge " +
      "committed through the versioned protocol, auto-rewrite serves the " +
      "refreshed generation, digest vs the base-plus-delta oracle")

  /** Extrema through the MV rule (q317): MIN/MAX re-aggregate from
    * per-group bounds exactly for ANY orderable type — unlike double
    * sums, extrema are order-stable — so the summary carries
    * min/max_l_orderkey (BIGINT) and min/max_l_shipdate (TIMESTAMP) and
    * the rule serves both alongside COUNT from the same scan. Oracle =
    * the raw-table aggregate; PlanAssertionSpec pins the summary scan.
    */
  val q317_mv_minmax: QueryDef = QueryDef(
    "q317_mv_minmax",
    (s, d) => {
      graft.ops.CorpusBuilds.lineitemMv(s, d)
      Tables.t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).cast(LongType).as("n"),
          min("l_orderkey").cast(LongType).as("min_key"),
          max("l_orderkey").cast(LongType).as("max_key"),
          max("l_shipdate").as("last_ship"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
      |  CAST(MAX(l_orderkey) AS BIGINT) AS max_key,
      |  MAX(l_shipdate) AS last_ship
      |FROM lineitem
      |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "MIN/MAX served from the materialized summary (order-stable extrema " +
      "re-aggregation, BIGINT and TIMESTAMP), digest vs the raw-table " +
      "oracle")

  /** [[graft.plans.SkipRewrite]] (q318): the query is a PLAIN DataFrame
    * read + range filter against the base path — no ZoneMap API in
    * sight — and the Catalyst rule reroutes the scan onto the registered
    * zone-mapped copy's routed bucket partitions (the filter re-applies
    * exactly on top, so routing only needs the zone superset guarantee).
    * PlanAssertionSpec pins that the optimized plan reads bucket
    * partitions of the copy and never the base path; SkipRewriteSpec
    * pins the near-misses (un-zoned column, stale epoch, fractional
    * literal) keeping the base scan. Oracle = the same filter+aggregate
    * off the raw table — values must be layout- and route-independent.
    */
  val q318_skip_range: QueryDef = QueryDef(
    "q318_skip_range",
    (s, d) => {
      val base = graft.ops.CorpusBuilds.lineitemSkipRegistered(s, d)
      s.read.parquet(base)
        .filter(col("l_orderkey").between(600L, 699L))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("qty_cents"),
          sum("l_orderkey").cast(LongType).as("sum_keys"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS qty_cents,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM lineitem
      |WHERE l_orderkey BETWEEN 600 AND 699
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "Transparent data skipping: a plain filtered read of the base table " +
      "is rerouted by the Catalyst rule onto the zone-mapped copy's " +
      "routed buckets, digest vs the raw-table oracle")

  /** q319: the same transparency for POINT lookups on the NON-clustered
    * axis — a plain `l_partkey = 100` filter against the base path is
    * bloom-routed by the rule to the candidate buckets (zones can't help
    * a column the layout isn't clustered on). False positives only widen
    * the read; the re-applied filter keeps the answer exact.
    */
  val q319_skip_bloom: QueryDef = QueryDef(
    "q319_skip_bloom",
    (s, d) => {
      val base = graft.ops.CorpusBuilds.lineitemSkipRegistered(s, d)
      s.read.parquet(base)
        .filter(col("l_partkey") === 100L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("qty_cents"),
          sum("l_orderkey").cast(LongType).as("sum_keys"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS qty_cents,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM lineitem
      |WHERE l_partkey = 100
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "Transparent bloom skipping: a plain point-filter on the " +
      "non-clustered axis is bloom-routed by the Catalyst rule to the " +
      "candidate buckets, digest vs the raw-table oracle")

  /** [[graft.ops.MaterializedSummary.refreshSigned]] (q320): the summary
    * survives a DELETE-bearing CDC batch — counts and integral sums
    * subtract, the delete-affected groups' MIN/MAX repair by re-scanning
    * only those groups of the post-batch base, zero-count groups evict —
    * and the rewrite rule serves the refreshed generation for the
    * aggregate over base'. The oracle replays (base ∖ deletes) ∪ inserts
    * off the raw table, so a lost retraction, an unrepaired extreme, or
    * a stale generation hash-fails. MaterializedSummarySpec pins the
    * algebra (including rescan tightness); PlanAssertionSpec pins the
    * summary scan.
    */
  val q320_mv_retract: QueryDef = QueryDef(
    "q320_mv_retract",
    (s, d) => {
      val basePrime = graft.ops.CorpusBuilds.lineitemMvRetracted(s, d)
      s.read.parquet(basePrime)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum("l_orderkey").cast(LongType).as("sum_keys"),
          min("l_orderkey").cast(LongType).as("min_key"),
          max("l_orderkey").cast(LongType).as("max_key"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys,
      |  CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
      |  CAST(MAX(l_orderkey) AS BIGINT) AS max_key
      |FROM (
      |  SELECT l_returnflag, l_linestatus, l_orderkey
      |  FROM lineitem WHERE l_orderkey % 11 <> 3
      |  UNION ALL
      |  SELECT l_returnflag, l_linestatus, l_orderkey
      |  FROM lineitem WHERE l_orderkey % 13 = 0) t
      |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "Materialized summary under retractions: signed refresh (subtracting " +
      "counts/sums, affected-group MIN/MAX repair), served by the " +
      "auto-rewrite rule, digest vs the delete-replaying oracle")

  /** [[graft.ops.ZoneMap.delete]] (q321): delete CDC into the standing
    * zone-mapped copy — one crash-atomic commit rewriting only the
    * buckets the deleted keys route to, with surviving rows kept, zones
    * recomputed, and fully-emptied buckets dropping out of the manifest;
    * the grace generation is then physically swept
    * ([[graft.ops.VersionedIndex.sweepGrace]]). The serve range-queries
    * across deleted and untouched buckets; the oracle replays the delete
    * off the raw table, so a lost retraction, a resurrected grace row,
    * or a stale zone route hash-fails. ZoneMapSpec pins bucket drop-out
    * and the zero-residue audit.
    */
  val q321_zonemap_delete: QueryDef = QueryDef(
    "q321_zonemap_delete",
    (s, d) => {
      val idx = graft.ops.CorpusBuilds.lineitemZoneMapDeleted(s, d)
      graft.ops.ZoneMap.rangeQuery(s, idx, "l_orderkey", 700L, 1099L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("qty_cents"),
          sum("l_orderkey").cast(LongType).as("sum_keys"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS qty_cents,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM lineitem
      |WHERE l_orderkey BETWEEN 700 AND 1099 AND l_orderkey % 7 <> 2
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "Zone-map delete CDC: key-routed retraction commit (touched buckets " +
      "rewritten, zones respliced, emptied buckets dropped, grace swept), " +
      "range serve digest vs the delete-replaying oracle")

  /** AVG + COUNT(col) through the MV rule (q322): the base copy carries
    * NULLs in l_suppkey (%5==0 orderkeys — TPC-H ships none, and these
    * two aggregates only differ from COUNT(*)/SUM on a null-bearing
    * column), the registered summary carries the sum_/cnt_ pairs, and
    * the rule serves COUNT(l_suppkey) from the non-null counts and
    * AVG(l_suppkey) as the one final SUM(sum)/SUM(cnt) double division —
    * exactly Spark's own Average evaluation, with the numerator exact
    * because the partials are integral. The oracle replays the CASE
    * nulling off the raw table and spells the average as the same
    * explicit division, so a mis-mapped count (group size instead of
    * non-null), a null-dropped sum, or a stale generation hash-fails.
    * MvRewriteSpec pins the near-misses (AVG over a double column, a
    * summary without cnt_ columns); PlanAssertionSpec pins the summary
    * scan.
    */
  val q322_mv_avg: QueryDef = QueryDef(
    "q322_mv_avg",
    (s, d) => {
      val base = graft.ops.CorpusBuilds.lineitemMvNullable(s, d)
      s.read.parquet(base)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).cast(LongType).as("n"),
          count(col("l_suppkey")).cast(LongType).as("n_supp"),
          avg("l_suppkey").as("avg_supp"),
          sum("l_orderkey").cast(LongType).as("sum_keys"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(COUNT(sk) AS BIGINT) AS n_supp,
      |  CAST(SUM(sk) AS DOUBLE) / CAST(COUNT(sk) AS DOUBLE) AS avg_supp,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM (
      |  SELECT l_returnflag, l_linestatus, l_orderkey,
      |    CASE WHEN l_orderkey % 5 = 0 THEN NULL
      |         ELSE l_suppkey END AS sk
      |  FROM lineitem) t
      |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "AVG and COUNT(col) served from the materialized summary over a " +
      "null-bearing column (non-null counts re-aggregated, average as " +
      "one exact-numerator division), digest vs the null-replaying oracle")

  /** TIME TRAVEL over the zone-mapped layout (q323): the same range is
    * served twice from q310's CDC'd copy — AS OF version 1 (the
    * pre-CDC build, still resolvable because the update commit's
    * retention window keeps the grace manifest and every partition
    * directory it references) and at the current version (post-upsert).
    * Both servings resolve zones and data through ONE manifest each, so
    * neither can mix generations. The oracle replays both states off
    * the raw table: a time-travel read leaking post-CDC rows into v1
    * (or vice versa) hash-fails.
    */
  val q323_zonemap_timetravel: QueryDef = QueryDef(
    "q323_zonemap_timetravel",
    (s, d) => {
      val idx = graft.ops.CorpusBuilds.lineitemZoneMapCdc(s, d)
      def agg(df: org.apache.spark.sql.DataFrame, v: String) = df
        .groupBy(lit(v).as("v"), col("l_returnflag"))
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("qty_cents"))
      agg(graft.ops.ZoneMap.rangeQuery(s, idx, "l_orderkey", 950L, 1150L,
          asOfVersion = Some(1L)), "v1")
        .unionByName(agg(graft.ops.ZoneMap.rangeQuery(
          s, idx, "l_orderkey", 950L, 1150L), "cur"))
        .orderBy("v", "l_returnflag")
    },
    Some("""SELECT v, l_returnflag, CAST(n AS BIGINT) AS n,
      |  CAST(qc AS BIGINT) AS qty_cents
      |FROM (
      |  SELECT 'v1' AS v, l_returnflag, count(*) AS n,
      |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS qc
      |  FROM lineitem WHERE l_orderkey BETWEEN 950 AND 1150
      |  GROUP BY 2
      |  UNION ALL
      |  SELECT 'cur' AS v, l_returnflag, count(*) AS n,
      |    SUM(CAST(CAST(q AS DECIMAL(18,2)) * 100 AS BIGINT)) AS qc
      |  FROM (
      |    SELECT l_returnflag,
      |      CASE WHEN l_orderkey BETWEEN 1000 AND 1099
      |           THEN l_quantity + 5 ELSE l_quantity END AS q
      |    FROM lineitem
      |    WHERE l_orderkey BETWEEN 950 AND 1150) t
      |  GROUP BY 2) u
      |ORDER BY v, l_returnflag""".stripMargin),
    "Time travel over the standing zone-mapped copy: the same range " +
      "served as of the pre-CDC version and at the current version, " +
      "each through its own immutable manifest, digest vs the two-state " +
      "replaying oracle")

  /** Version CHANGE FEED over the zone-mapped layout (q324): the
    * row-level diff between q310's pre-CDC version and its post-upsert
    * version, computed by reading ONLY the buckets whose generation
    * differs between the two manifests (ZoneMapSpec pins the footprint).
    * The feed is per merge KEY (the synthetic lineitem repeats
    * (orderkey, linenumber), so the diff compares each key's payload
    * multiset — see [[graft.ops.ZoneMap.changeFeed]]); every upserted
    * key's multiset changed (quantity +5), so the feed is exactly the
    * distinct delta keys as `update` ops — a leaked unchanged key, a
    * missed bucket, or a mixed-generation read hash-fails against the
    * raw-table replay.
    */
  val q324_zonemap_changefeed: QueryDef = QueryDef(
    "q324_zonemap_changefeed",
    (s, d) => {
      val idx = graft.ops.CorpusBuilds.lineitemZoneMapCdc(s, d)
      graft.ops.ZoneMap.changeFeed(s, idx, 1L, 2L,
          Seq("l_orderkey", "l_linenumber"))
        .groupBy("op")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum("l_orderkey").cast(LongType).as("key_sum"))
        .orderBy("op")
    },
    Some("""SELECT 'update' AS op, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
      |FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
      |      WHERE l_orderkey BETWEEN 1000 AND 1099) t""".stripMargin),
    "Change data feed between committed layout versions: row-level " +
      "insert/delete/update diff from only the generation-changed " +
      "buckets, digest vs the raw-table delta replay")

  /** EQUI-DEPTH zone map over a SKEWED key (q325): 70% of base rows
    * collapse into the hot range [0, 97) — fixed-width bucketing piles
    * that mass into one or two buckets (no pruning inside the hot range,
    * hot write partitions at CDC time), while the equi-depth build
    * stores explicit key-quantile bounds in the manifest so every bucket
    * carries near-equal rows (ZoneMapSpec pins the max-bucket share;
    * BASELINE.md carries the scale probe). A CDC upsert (+7 quantity for
    * skew keys 200–299) rides the SAME manifest-driven routing, and the
    * serve range-queries across hot and cold ranges; the oracle replays
    * the derived key and the upsert off the raw table — a mis-routed
    * bucket, a bounds/zone mismatch, or a lost delta row hash-fails.
    */
  val q325_zonemap_equidepth: QueryDef = QueryDef(
    "q325_zonemap_equidepth",
    (s, d) => {
      val idx = graft.ops.CorpusBuilds.lineitemZoneMapSkewed(s, d)
      def agg(df: org.apache.spark.sql.DataFrame, v: String) = df
        .groupBy(lit(v).as("band"), col("l_returnflag"))
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("qty_cents"),
          sum("skew_key").cast(LongType).as("sum_keys"))
      agg(graft.ops.ZoneMap.rangeQuery(s, idx, "skew_key", 10L, 50L), "hot")
        .unionByName(agg(graft.ops.ZoneMap.rangeQuery(
          s, idx, "skew_key", 200L, 299L), "cold"))
        .orderBy("band", "l_returnflag")
    },
    Some("""SELECT band, l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(CAST(q AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS qty_cents,
      |  CAST(SUM(sk) AS BIGINT) AS sum_keys
      |FROM (
      |  SELECT l_returnflag,
      |    CASE WHEN sk BETWEEN 10 AND 50 THEN 'hot' ELSE 'cold' END AS band,
      |    sk,
      |    CASE WHEN sk BETWEEN 200 AND 299 THEN l_quantity + 7
      |         ELSE l_quantity END AS q
      |  FROM (
      |    SELECT l_returnflag, l_quantity,
      |      CASE WHEN l_orderkey % 10 < 7 THEN l_orderkey % 97
      |           ELSE l_orderkey END AS sk
      |    FROM lineitem) s
      |  WHERE (sk BETWEEN 10 AND 50) OR (sk BETWEEN 200 AND 299)) t
      |GROUP BY 1, 2
      |ORDER BY band, l_returnflag""".stripMargin),
    "Skew-aware equi-depth zone map: explicit quantile bounds in the " +
      "manifest route build, CDC and serve over a zipf-ish key, digest " +
      "vs the key-replaying oracle")

  /** Transparent IN-list skipping (q326): a plain `l_orderkey IN (…)`
    * filter against the registered base is routed by the Catalyst rule
    * to the union of the buckets whose ACTUAL [zmin, zmax] contains an
    * IN value — the second-most-common selective predicate after ranges.
    * SkipRewriteSpec pins the near-misses (a non-literal element
    * declines); PlanAssertionSpec pins routed-partitions-only.
    */
  val q326_skip_in: QueryDef = QueryDef(
    "q326_skip_in",
    (s, d) => {
      val base = graft.ops.CorpusBuilds.lineitemSkipRegistered(s, d)
      s.read.parquet(base)
        .filter(col("l_orderkey").isin(7L, 103L, 511L, 988L, 1499L))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("qty_cents"),
          sum("l_orderkey").cast(LongType).as("sum_keys"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS qty_cents,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM lineitem
      |WHERE l_orderkey IN (7, 103, 511, 988, 1499)
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "Transparent IN-list data skipping: a plain IN filter on the base " +
      "table is routed by the Catalyst rule to the matching buckets of " +
      "the zone-mapped copy, digest vs the raw-table oracle")

  /** Transparent DATE-key skipping (q327): the layout is clustered on a
    * DATE column (epoch-days integral form recorded in the manifest) and
    * a plain date-range filter against the base routes through the
    * DateType literals' epoch-days representation — the single most
    * common selective predicate in time-partitioned pipelines. Oracle =
    * the same month window off the raw table.
    */
  val q327_skip_daterange: QueryDef = QueryDef(
    "q327_skip_daterange",
    (s, d) => {
      val base = graft.ops.CorpusBuilds.lineitemSkipRegisteredDate(s, d)
      s.read.parquet(base)
        .filter(col("l_shipdate_d")
          .between(java.sql.Date.valueOf("1996-03-01"),
            java.sql.Date.valueOf("1996-03-31")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast(LongType).as("qty_cents"),
          sum("l_orderkey").cast(LongType).as("sum_keys"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS qty_cents,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE)
      |    BETWEEN DATE '1996-03-01' AND DATE '1996-03-31'
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
    "Transparent date-key data skipping: a plain date-range filter " +
      "routes via the epoch-days literal form onto the date-clustered " +
      "copy, digest vs the raw-table oracle")

  /** HAVING through the MV rule (q328): the aggregate carries a filter
    * ABOVE it (Spark plans HAVING as Filter-over-Aggregate referencing
    * the aggregate's outputs); the rule rewrites the Aggregate node in
    * place and preserves its output exprIds, so the HAVING filter
    * re-resolves over the summary-served aggregate untouched.
    * PlanAssertionSpec pins the summary scan; the oracle runs the same
    * HAVING off the raw table.
    */
  val q328_mv_having: QueryDef = QueryDef(
    "q328_mv_having",
    (s, d) => {
      graft.ops.CorpusBuilds.lineitemMv(s, d)
      Tables.t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum("l_orderkey").cast(LongType).as("sum_keys"))
        .filter(col("n") % 2 === 0)
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys
      |FROM lineitem
      |GROUP BY 1, 2
      |HAVING count(*) % 2 = 0
      |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    "HAVING aggregate served from the materialized summary (the filter " +
      "above the rewritten Aggregate re-resolves over preserved output " +
      "ids), digest vs the raw-table oracle")

  /** TIME TRAVEL over the MV summary (q329): the same aggregate served
    * as of the PRE-refresh version (v1, still inside the retention
    * window) and at the current refreshed version, each through its own
    * immutable manifest — q323's contract lifted onto the materialized
    * summary. The oracle replays both base states; a refresh leaking
    * into v1 (or a stale current) hash-fails.
    */
  val q329_mv_timetravel: QueryDef = QueryDef(
    "q329_mv_timetravel",
    (s, d) => {
      val sdir = graft.ops.CorpusBuilds.lineitemMvVersioned(s, d)
      def agg(df: org.apache.spark.sql.DataFrame, v: String) = df
        .groupBy(lit(v).as("v"), col("l_returnflag"))
        .agg(sum("cnt").cast(LongType).as("n"),
          sum("sum_l_orderkey").cast(LongType).as("sum_keys"))
      agg(graft.ops.MaterializedSummary.readAt(s, sdir, 1L), "v1")
        .unionByName(agg(s.read.parquet(
          graft.ops.MaterializedSummary.currentPath(s, sdir)), "cur"))
        .orderBy("v", "l_returnflag")
    },
    Some("""SELECT v, l_returnflag, CAST(n AS BIGINT) AS n,
      |  CAST(sk AS BIGINT) AS sum_keys
      |FROM (
      |  SELECT 'v1' AS v, l_returnflag, count(*) AS n,
      |    SUM(l_orderkey) AS sk
      |  FROM lineitem GROUP BY 2
      |  UNION ALL
      |  SELECT 'cur' AS v, l_returnflag, count(*) AS n, SUM(l_orderkey) AS sk
      |  FROM (
      |    SELECT l_returnflag, l_orderkey FROM lineitem
      |    UNION ALL
      |    SELECT l_returnflag, l_orderkey FROM lineitem
      |    WHERE l_orderkey % 13 = 0) t
      |  GROUP BY 2) u
      |ORDER BY v, l_returnflag""".stripMargin),
    "Time travel over the materialized summary: the same aggregate " +
      "served as of the pre-refresh version and at the refreshed " +
      "current, each through its own immutable manifest, digest vs the " +
      "two-state replaying oracle")

  def defs: Seq[QueryDef] = Seq(q148_format_roundtrip,
    q153_stream_jsonl_ingest, q169_zorder_layout, q201_orc_roundtrip,
    q218_schema_evolution, q219_compaction, q235_avro_roundtrip,
    q247_partition_pruning, q268_zorder_pruning, q309_zonemap_range,
    q310_zonemap_cdc, q313_bloom_point, q314_mv_rewrite, q315_mv_refresh,
    q317_mv_minmax, q318_skip_range, q319_skip_bloom, q320_mv_retract,
    q321_zonemap_delete, q322_mv_avg, q323_zonemap_timetravel,
    q324_zonemap_changefeed, q325_zonemap_equidepth, q326_skip_in,
    q327_skip_daterange, q328_mv_having, q329_mv_timetravel)
}
