package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for training-batch construction (north-star): assign
  * documents to fixed-capacity token bins so short documents share a
  * context window instead of wasting it on padding — the standard
  * corpus-preparation step between tokenization and batching.
  *
  * Scale design: packing is a sequential decision process, so a globally
  * optimal packing cannot be distributed. The standard corpus-scale choice
  * is greedy NEXT-FIT per partition — zero coordination, zero extra
  * shuffle beyond one deterministic range exchange, and a guaranteed
  * ≥ 50% fill for every closed bin (next-fit closes a bin only when the
  * incoming document would overflow it, so closed bin + following doc
  * > capacity). Bin ids are globally unique by construction:
  * `partitionId * 2^40 + localBin`.
  */
object Packing {

  /** Sliding token-window chunking — the upstream step [[packGreedy]]'s
    * contract demands for documents longer than the bin capacity: split
    * each document's whitespace tokens into windows of `maxTokens` with
    * `overlap` tokens shared between consecutive windows (overlap
    * preserves cross-boundary context for training). Pure per-row array
    * expressions (sequence + slice — codegen'd, no shuffle, no UDF), so
    * chunking is a free map stage at any corpus size.
    *
    * Window count: 1 + ceil(max(0, n - maxTokens) / stride) with
    * stride = maxTokens - overlap; every token is covered, the last
    * window may be short. Output: (idCol, chunk_no, chunk_text, n_tokens).
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens, "0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val nChunks = lit(1) +
      when(n > maxTokens, ceil((n - maxTokens).cast(DoubleType) / stride).cast(IntegerType))
        .otherwise(lit(0))
    df.select(col(idCol), toks.as("_toks"), nChunks.as("_nc"), n.as("_n"))
      .select(col(idCol), col("_n"),
        explode(sequence(lit(0), col("_nc") - 1)).as("chunk_no"), col("_toks"))
      .select(col(idCol),
        col("chunk_no").cast(LongType).as("chunk_no"),
        concat_ws(" ", slice(col("_toks"), col("chunk_no") * stride + 1, lit(maxTokens)))
          .as("chunk_text"),
        least(lit(maxTokens), col("_n") - col("chunk_no") * stride)
          .cast(LongType).as("n_tokens"))
  }

  /** Greedy next-fit packing of (`idCol`, `tokenCol`) rows into bins of at
    * most `maxTokens` tokens. Documents longer than `maxTokens` get a
    * single-doc bin of their own (they must be chunked upstream — see
    * `Multimodal.frameSample` for the chunking shape).
    *
    * Deterministic for a fixed `numPartitions`: rows are HASH-partitioned
    * by `idCol` (a pure function of the key — range partitioning would
    * sample, and sampled boundaries shift with the source layout) and
    * sorted within partitions, so the same input packs identically
    * regardless of how it arrives. `numPartitions = 0` uses the session's
    * `spark.sql.shuffle.partitions`; pin it explicitly when bin
    * assignments must be stable across differently-configured sessions.
    *
    * Output contract: EXACTLY (`idCol`, `tokenCol`, `bin_id`) — every
    * other input column is dropped (join back on `idCol` to recover them).
    * Both columns must already be integral (byte/short/int/long): a silent
    * cast of, say, a string doc id would null out non-numeric values and
    * surface only as an opaque decode error rows later.
    */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
      maxTokens: Long, numPartitions: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    Seq(idCol, tokenCol).foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"packGreedy: column '$c' must be an integral type, got ${dt.simpleString} " +
          "(hash or zipWithIndex non-numeric ids upstream)")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast(LongType), col(tokenCol).cast(LongType))
      .as[(Long, Long)]
    // ALWAYS pin an explicit partition count: a count-less repartition is
    // coalescible by AQE, whose merge decisions follow shuffle byte stats
    // that vary with source layout/compression — partition ids (and with
    // them bin_id) would drift between otherwise identical runs
    val n = if (numPartitions > 0) numPartitions
            else GlobalLag.parsePartitions(
              spark.conf.get("spark.sql.shuffle.partitions"),
              spark.sparkContext.defaultParallelism)
    typed.repartition(n, col(idCol))
      .sortWithinPartitions(idCol)
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var bin = 0L
        var acc = 0L
        var open = false
        it.map { case (id, nTok) =>
          val t = math.max(nTok, 0L)
          if (open && acc + t > maxTokens) { bin += 1; acc = 0L }
          acc += t
          open = true
          (id, nTok, pid * (1L << 40) + bin)
        }
      }
      .toDF(idCol, tokenCol, "bin_id")
  }

  /** Per-bin audit frame: token total, document count, and whether the bin
    * respects capacity (oversize single-doc bins are legal by contract).
    */
  def binAudit(packed: DataFrame, tokenCol: String, maxTokens: Long): DataFrame =
    packed.groupBy("bin_id")
      .agg(sum(tokenCol).as("bin_tokens"), count(lit(1)).as("n_docs"))
      .withColumn("within_cap",
        (col("bin_tokens") <= maxTokens || col("n_docs") === 1).cast(LongType))
}
