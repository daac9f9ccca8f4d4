package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star): image/audio/video as opaque
  * `binary` columns with a typed metadata struct. IMAGE decode is REAL
  * (JDK `javax.imageio.ImageIO` — PNG/JPEG/BMP/GIF ship in the JRE, no
  * external dependency); audio/video codec work is STUBBED (no such
  * libraries in this container) behind deterministic fakes — everything
  * Spark-side is real and tested: schema, batch iteration shape,
  * partition-parallel decode, frame sampling.
  *
  * The decode runs via `mapPartitions` over an iterator of rows — the
  * Scala analog of `mapInPandas` batch UDFs: per-partition setup cost is
  * amortized (codec configuration happens once per partition, not per
  * row), and partition-level parallelism is preserved.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("content_hash", StringType, nullable = false))), nullable = true)))

  /** Wrap any (id, string-payload) frame as a media table — the ingest
    * boundary for tests and demos (real pipelines read binary files /
    * blob-store manifests).
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast(BinaryType).as("content"))
      .withColumn("meta", struct(
        octet_length(col("content")).cast(LongType).as("n_bytes"),
        sha2(col("content"), 256).as("content_hash")))

  final case class DecodedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      n_channels: Int, checksum: Long)

  private def checksumOf(b: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < b.length) { sum = sum * 31 + (b(i) & 0xff); i += 1 }
    sum
  }

  /** Deterministic fake for kinds without an in-container codec (audio/
    * video): "dimensions" derived from the first bytes, checksum from the
    * whole payload — so tests pin the plumbing end to end.
    */
  private def stubRow(id: Long, kind: String, b: Array[Byte]): DecodedMedia = {
    val w = if (b.isEmpty) 0 else (b(0) & 0x7f) + 1
    val h = if (b.length < 2) 0 else (b(1) & 0x7f) + 1
    DecodedMedia(id, kind, w, h, n_channels = 3, checksum = checksumOf(b))
  }

  /** Media decode: REAL for `kind = "image"` — `ImageIO` reads PNG/JPEG/
    * BMP/GIF out of the JDK, yielding true width/height and raster band
    * count (an undecodable or empty payload reports 0×0×0 rather than
    * failing the batch — at corpus scale some byte streams are always
    * corrupt). Other kinds (audio/video) fall back to the deterministic
    * stub ([[stubRow]]) until a real codec is available. Per-partition
    * init configures ImageIO once (in-memory streams, no temp-file cache).
    */
  def decode(df: DataFrame)(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    df.select("media_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // once per partition: decode through heap buffers, never temp files
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, kind, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          if (kind == "image") {
            // NonFatal, not just IOException: the JDK image readers throw
            // runtime exceptions (AIOOBE, NegativeArraySize, IAE) on
            // malformed payloads, and at corpus scale malformed payloads
            // are a certainty — one bad row must not fail the batch
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) DecodedMedia(id, kind, 0, 0, 0, checksumOf(b))
            else DecodedMedia(id, kind, img.getWidth, img.getHeight,
              img.getRaster.getNumBands, checksumOf(b))
          } else stubRow(id, kind, b)
        }
      }
  }

  /** Stub-only decode (every kind faked) — kept for pipelines that need
    * deterministic dimensions from arbitrary payloads, e.g. plumbing tests
    * where the binary column holds text rather than an encoded image.
    */
  def decodeStub(df: DataFrame)(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    df.select("media_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          stubRow(id, kind, if (bytes == null) Array.emptyByteArray else bytes)
        }
      }
  }

  /** "Frame sampling" for video-kind payloads: every strideBytes-th slice
    * as its own row (real impl: keyframe extraction). Pure exprs.
    */
  def frameSample(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("n_frames",
        greatest((octet_length(col("content")) / stride).cast(IntegerType), lit(1)))
      .select(col("media_id"), col("kind"),
        posexplode(transform(sequence(lit(0), col("n_frames") - 1),
          i => col("content").substr(i * stride + 1, lit(stride)))).as(Seq("frame_no", "frame")))

  /** "Resize" stub: truncate payload to targetBytes (real impl: scale the
    * decoded raster); metadata recomputed.
    */
  def resizeStub(df: DataFrame, targetBytes: Int): DataFrame =
    df.withColumn("content", substring(col("content"), 1, targetBytes))
      .withColumn("meta", struct(
        octet_length(col("content")).cast(LongType).as("n_bytes"),
        sha2(col("content"), 256).as("content_hash")))
}
