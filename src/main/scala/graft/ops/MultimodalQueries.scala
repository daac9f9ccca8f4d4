package graft.ops

import graft.QueryDef
import graft.relational.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-gated multimodal REAL-codec queries (q41-style property
  * oracles): each row synthesizes a genuine encoded payload (PNG via
  * ImageIO, RIFF/WAVE via a hand-laid header) with dimensions derived
  * arithmetically from `doc_id`, runs it through the REAL decoder
  * ([[Multimodal.decode]] / [[Multimodal.decodeAudio]]), and emits the
  * decoded metadata. DuckDB cannot run the codecs, but it can compute the
  * expected arithmetic — so a full hash match proves the encode→decode
  * round trip recovered every dimension for every row. This promotes the
  * image/audio decode path from spec-only coverage to a CORRECTNESS row.
  */
object MultimodalQueries {

  private def q(name: String, oracle: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle), doc)

  /** Real ImageIO round trip: per-doc PNG at (1+id%13)×(1+id%7), decoded
    * back with the production decode path. n_channels pins the raster
    * band count PNG truecolor guarantees.
    */
  val q63_image_codec: QueryDef = q(
    "q63_image_codec",
    """SELECT doc_id,
      |  CAST(1 + doc_id % 13 AS BIGINT) AS width,
      |  CAST(1 + doc_id % 7 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS n_channels
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    "Multimodal image codec: real PNG encode (ImageIO) -> real decode; " +
      "oracle pins the expected dimensions arithmetically") { (s, d) =>
    implicit val spark: SparkSession = s
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          (id, "image",
            Multimodal.pngBytes((1 + id % 13).toInt, (1 + id % 7).toInt, id))
        }
      }.toDF("media_id", "kind", "content")
    Multimodal.decode(media).toDF()
      .select(col("media_id").as("doc_id"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"),
        col("n_channels").cast(LongType).as("n_channels"))
      .orderBy("doc_id")
  }

  /** Real WAV round trip: per-doc PCM16 RIFF/WAVE at a doc-derived
    * (sample_rate, channels, frames), decoded back with
    * `javax.sound.sampled.AudioSystem` — the audio decode is REAL, not the
    * stub; only the EXPECTED values are arithmetic.
    */
  val q64_wav_codec: QueryDef = q(
    "q64_wav_codec",
    """SELECT doc_id,
      |  CAST(8000 + (doc_id % 4) * 2000 AS BIGINT) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
      |  CAST(64 + doc_id % 100 AS BIGINT) AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    "Multimodal audio codec: real RIFF/WAVE encode -> real AudioSystem " +
      "decode; oracle pins the expected format arithmetically") { (s, d) =>
    implicit val spark: SparkSession = s
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          (id, "audio", Multimodal.wavBytes(
            (8000 + (id % 4) * 2000).toInt, (1 + id % 2).toInt,
            (64 + id % 100).toInt, id))
        }
      }.toDF("media_id", "kind", "content")
    Multimodal.decodeAudio(media).toDF()
      .select(col("media_id").as("doc_id"),
        col("sample_rate"), col("n_channels"), col("n_frames"))
      .orderBy("doc_id")
  }

  /** Third lossless still-image container ([[Multimodal.tiffBytes]]):
    * real TIFF encode → the SAME generic ImageIO decode path as PNG
    * (`imageFeatures` is container-agnostic by construction), channel
    * sums replayed arithmetically. Doc 0's payload is truncated to 8
    * bytes — a bare TIFF header stub — and must decode to the all-zero
    * row, pinning corrupt tolerance in the still-image family too.
    */
  val q107_tiff_codec: QueryDef = q(
    "q107_tiff_codec",
    """WITH dims AS (
      |  SELECT doc_id, 6 + doc_id % 10 AS w, 5 + doc_id % 8 AS h FROM documents),
      |ys AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM dims),
      |px AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM ys),
      |v AS (SELECT doc_id, w, h,
      |  ((doc_id * 31 + y) * 31 + x) % 16777216 AS v FROM px)
      |SELECT doc_id,
      |  CAST(CASE WHEN doc_id = 0 THEN 0 ELSE w END AS BIGINT) AS width,
      |  CAST(CASE WHEN doc_id = 0 THEN 0 ELSE h END AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id = 0 THEN 0 ELSE sum(CAST(floor(v / 65536) AS BIGINT)) END AS BIGINT) AS sum_r,
      |  CAST(CASE WHEN doc_id = 0 THEN 0 ELSE sum((CAST(floor(v / 256) AS BIGINT)) % 256) END AS BIGINT) AS sum_g,
      |  CAST(CASE WHEN doc_id = 0 THEN 0 ELSE sum(v % 256) END AS BIGINT) AS sum_b
      |FROM v
      |GROUP BY doc_id, w, h
      |ORDER BY doc_id""".stripMargin,
    "Multimodal TIFF codec: real TIFF encode -> generic ImageIO decode, " +
      "channel sums replayed; truncated payload pins corrupt tolerance") {
    (s, d) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          javax.imageio.ImageIO.setUseCache(false)
          ids.map { id =>
            val b = Multimodal.tiffBytes(
              (6 + id % 10).toInt, (5 + id % 8).toInt, id)
            (id, "image", if (id == 0L) b.take(8) else b)
          }
        }.toDF("media_id", "kind", "content")
      Multimodal.imageFeatures(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy("doc_id")
  }

  /** [[Multimodal.audioFeatures]] through the real WAV encode→decode
    * path: per-doc synthetic PCM ([[Multimodal.wavBytes]]'s sample
    * formula `(id·773 + i·131) mod 2¹⁶` as int16), REAL sample-level
    * decode, then energy/peak/zero-crossing/silence aggregates — all
    * INTEGER, so the oracle replays them with zero float tolerance: a
    * single wrong sample, channel de-interleave slip, or off-by-one in
    * the crossing window hash-fails.
    */
  val q102_audio_features: QueryDef = q(
    "q102_audio_features",
    """WITH dims AS (
      |  SELECT doc_id, 1 + doc_id % 2 AS ch, 64 + doc_id % 100 AS nf
      |  FROM documents),
      |fr AS (SELECT doc_id, ch, unnest(range(0, nf)) AS f FROM dims
      |       WHERE true),
      |cs AS (SELECT doc_id, ch, f, unnest(range(0, ch)) AS c FROM fr
      |       WHERE true),
      |samp AS (
      |  SELECT doc_id, c, f,
      |    CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
      |  FROM (SELECT doc_id, c, f,
      |          (doc_id * 773 + (f * ch + c) * 131) % 65536 AS v
      |        FROM cs) t),
      |w AS (SELECT doc_id, c, f, s,
      |        lag(s) OVER (PARTITION BY doc_id, c ORDER BY f) AS sp
      |      FROM samp)
      |SELECT doc_id, CAST(c AS BIGINT) AS channel,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(sum(s * s) AS BIGINT) AS energy,
      |  CAST(max(abs(s)) AS BIGINT) AS peak,
      |  CAST(sum(CASE WHEN sp IS NOT NULL AND (sp < 0) <> (s < 0)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
      |  CAST(sum(CASE WHEN abs(s) < 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent
      |FROM w
      |GROUP BY doc_id, c
      |ORDER BY doc_id, channel""".stripMargin,
    "Audio feature extraction: real WAV decode -> per-channel energy, " +
      "peak, zero crossings, silence count; all-integer aggregates " +
      "replayed exactly by the oracle") { (s, d) =>
    implicit val spark: SparkSession = s
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          (id, "audio", Multimodal.wavBytes(
            (8000 + (id % 4) * 2000).toInt, (1 + id % 2).toInt,
            (64 + id % 100).toInt, id))
        }
      }.toDF("media_id", "kind", "content")
    Multimodal.audioFeatures(media).toDF()
      .select(col("media_id").as("doc_id"),
        col("channel").cast(LongType).as("channel"),
        col("n_samples"), col("energy"), col("peak"),
        col("zero_crossings"), col("n_silent"))
      .orderBy("doc_id", "channel")
  }

  /** Real raster feature extraction, exactly oracled: the synthetic PNG's
    * pixel (x,y) is ((id·31+y)·31+x) mod 2²⁴ by construction, PNG is
    * lossless, and [[Multimodal.imageFeatures]] reads the pixels back with
    * `getRGB` — so DuckDB can replay the per-channel mean arithmetic over
    * the same (w×h) grid and the hash pins every decoded pixel sum.
    * Means are floor-ppm (integer division on both sides — no doubles).
    */
  val q68_image_features: QueryDef = q(
    "q68_image_features",
    """WITH dims AS (
      |  SELECT doc_id, 1 + doc_id % 13 AS w, 1 + doc_id % 7 AS h FROM documents),
      |ys AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM dims),
      |px AS (SELECT doc_id, w, h, y, unnest(range(0, w)) AS x FROM ys),
      |v AS (SELECT doc_id, w, h,
      |  ((doc_id * 31 + y) * 31 + x) % 16777216 AS v FROM px)
      |SELECT doc_id,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(CAST(floor((1000000 * sum(CAST(floor(v / 65536) AS BIGINT))) / (w * h)) AS BIGINT) AS BIGINT) AS mean_r_ppm,
      |  CAST(CAST(floor((1000000 * sum(CAST(floor(v / 256) AS BIGINT) % 256)) / (w * h)) AS BIGINT) AS BIGINT) AS mean_g_ppm,
      |  CAST(CAST(floor((1000000 * sum(v % 256)) / (w * h)) AS BIGINT) AS BIGINT) AS mean_b_ppm
      |FROM v
      |GROUP BY doc_id, w, h
      |ORDER BY doc_id""".stripMargin,
    "Multimodal feature extraction: real raster channel sums from decoded " +
      "PNG pixels; oracle replays the pixel formula arithmetically") { (s, d) =>
    implicit val spark: SparkSession = s
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          (id, "image",
            Multimodal.pngBytes((1 + id % 13).toInt, (1 + id % 7).toInt, id))
        }
      }.toDF("media_id", "kind", "content")
    Multimodal.imageFeatures(media).toDF()
      .select(col("media_id").as("doc_id"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"),
        expr("(1000000 * sum_r) div (width * height)").as("mean_r_ppm"),
        expr("(1000000 * sum_g) div (width * height)").as("mean_g_ppm"),
        expr("(1000000 * sum_b) div (width * height)").as("mean_b_ppm"))
      .orderBy("doc_id")
  }

  /** Frame sampling through the production [[Multimodal.frameSample]]
    * path: documents text as a video-kind binary payload, sliced into
    * 32-byte frames. The payload is ASCII, so DuckDB replays the same
    * windows over the string form and md5-pins every frame's content —
    * frame count, order, and the dropped trailing partial all match the
    * operator's floor(len/stride) contract.
    */
  val q71_frame_sample: QueryDef = q(
    "q71_frame_sample",
    """WITH b AS (
      |  SELECT doc_id, text,
      |    CAST(greatest(CAST(floor(length(text) / 32) AS BIGINT), 1) AS INT) AS nf
      |  FROM documents),
      |f AS (
      |  SELECT doc_id AS media_id, CAST(u.i AS BIGINT) AS frame_no,
      |    substr(text, CAST(u.i*32+1 AS INT), 32) AS frame
      |  FROM b, unnest(range(0, nf)) AS u(i))
      |SELECT media_id, frame_no,
      |  CAST(length(frame) AS BIGINT) AS n_bytes, md5(frame) AS frame_md5
      |FROM f
      |ORDER BY media_id, frame_no""".stripMargin,
    "Frame sampling: stride-byte slices of a video-kind payload") { (s, d) =>
    val media = Multimodal.asMediaTable(
      Tables.documents(s, d), "doc_id", "text", "video")
    Multimodal.frameSample(media, stride = 32)
      .select(col("media_id"), col("frame_no").cast(LongType).as("frame_no"),
        octet_length(col("frame")).cast(LongType).as("n_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("media_id", "frame_no")
  }

  /** Real multi-frame video decode, exactly oracled (VERDICT r4 item 4):
    * per-doc animated GIF at (8+id%9)×(8+id%6) with 1+id%5 frames,
    * decoded by the production [[Multimodal.decodeVideoFrames]] path with
    * stride-2 frame sampling. GIF's indexed palette is lossless, the
    * synthetic palette index is a closed form of (id, frame, x, y), so
    * DuckDB replays the per-frame channel sums arithmetically and the
    * hash pins every sampled frame's pixels — frame count, dimensions,
    * and rasters all at once.
    */
  val q83_video_codec: QueryDef = q(
    "q83_video_codec",
    """WITH dims AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 6 AS h,
      |    1 + doc_id % 5 AS nf
      |  FROM documents),
      |fr AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM dims
      |       WHERE true),
      |sampled AS (SELECT * FROM fr WHERE f % 2 = 0),
      |ys AS (SELECT doc_id, w, h, f, unnest(range(0, h)) AS y FROM sampled),
      |px AS (SELECT doc_id, w, h, f, y, unnest(range(0, w)) AS x FROM ys),
      |v AS (SELECT doc_id, w, h, f,
      |  (((doc_id * 31 + f) * 31 + y) * 31 + x) % 256 AS i FROM px)
      |SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(sum(i) AS BIGINT) AS sum_r,
      |  CAST(sum((i * 2) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum(255 - i) AS BIGINT) AS sum_b
      |FROM v
      |GROUP BY doc_id, f, w, h
      |ORDER BY doc_id, frame_no""".stripMargin,
    "Multimodal video codec: real animated-GIF encode -> real multi-frame " +
      "ImageIO decode with stride-2 sampling; oracle replays the palette " +
      "arithmetic") { (s, d) =>
    implicit val spark: SparkSession = s
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          (id, "video", Multimodal.gifBytes(
            (8 + id % 9).toInt, (8 + id % 6).toInt, (1 + id % 5).toInt, id))
        }
      }.toDF("media_id", "kind", "content")
    Multimodal.decodeVideoFrames(media, frameStride = 2).toDF()
      .select(col("media_id").as("doc_id"),
        col("frame_no").cast(LongType).as("frame_no"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"),
        col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy("doc_id", "frame_no")
  }

  /** Second real video container (round-5 verdict item 6): MJPEG-in-AVI.
    * Every doc becomes a RIFF AVI ([[Multimodal.aviMjpegBytes]]) whose
    * 1+id%4 frames are solid-gray JPEGs at level (id·31+f) mod 256 —
    * the one raster family JPEG reproduces exactly (see aviMjpegBytes
    * doc), so the oracle replays frame count, dimensions, and channel
    * sums (w·h·v) in closed form while the engine runs the REAL
    * RIFF-walk + ImageIO JPEG decode with stride-2 sampling. A corrupt
    * container (non-RIFF bytes) must contribute zero rows, which the
    * engine-side union with one deliberately-truncated payload pins.
    */
  val q100_avi_mjpeg: QueryDef = q(
    "q100_avi_mjpeg",
    """WITH dims AS (
      |  SELECT doc_id, 16 + doc_id % 9 AS w, 12 + doc_id % 6 AS h,
      |    1 + doc_id % 4 AS nf
      |  FROM documents),
      |fr AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM dims
      |       WHERE doc_id <> 0),
      |sampled AS (SELECT * FROM fr WHERE f % 2 = 0)
      |SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(w * h * ((doc_id * 31 + f) % 256) AS BIGINT) AS sum_r,
      |  CAST(w * h * ((doc_id * 31 + f) % 256) AS BIGINT) AS sum_g,
      |  CAST(w * h * ((doc_id * 31 + f) % 256) AS BIGINT) AS sum_b
      |FROM sampled
      |ORDER BY doc_id, frame_no""".stripMargin,
    "MJPEG-in-AVI video codec: real RIFF AVI synthesis -> structural " +
      "RIFF walk -> real ImageIO JPEG decode, stride-2 sampling; " +
      "solid-gray frames make the JPEG round-trip exact so the oracle " +
      "is closed-form") { (s, d) =>
    implicit val spark: SparkSession = s
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val bytes = Multimodal.aviMjpegBytes(
            (16 + id % 9).toInt, (12 + id % 6).toInt, (1 + id % 4).toInt, id)
          // corrupt-tolerance pin: doc 0's payload is truncated mid-movi
          // and must decode to ZERO rows — the oracle excludes doc 0, so
          // a parser that "recovers" a frame from the torn container (or
          // throws and kills the batch) hash-fails on row count
          (id, "video",
            if (id == 0L) bytes.take(bytes.length / 3) else bytes)
        }
      }.toDF("media_id", "kind", "content")
    Multimodal.decodeAviMjpegFrames(media, frameStride = 2).toDF()
      .select(col("media_id").as("doc_id"),
        col("frame_no").cast(LongType).as("frame_no"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"),
        col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy("doc_id", "frame_no")
  }

  /** [[Multimodal.imageDHash]] through the real PNG encode→decode path:
    * every doc becomes a deterministic w×h PNG ([[Multimodal.pngBytes]]'s
    * pixel formula), the operator hashes REAL decoded pixels, and the
    * oracle replays the nearest-neighbor grid, integer luma, and bit
    * packing arithmetically — so a single wrong pixel, scale index, or
    * bit position hash-fails.
    */
  val q95_image_dhash: QueryDef = q(
    "q95_image_dhash",
    """WITH dims AS (
      |  SELECT doc_id, 9 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents),
      |grid AS (
      |  SELECT doc_id, w, h, y, x,
      |    ((doc_id * 31 + (CAST(floor((y * h) / 8) AS BIGINT))) * 31 + (CAST(floor((x * w) / 9) AS BIGINT))) % 16777216 AS v
      |  FROM dims,
      |    (SELECT y FROM range(0, 8) AS t(y)) ys,
      |    (SELECT x FROM range(0, 9) AS t(x)) xs),
      |gray AS (
      |  SELECT doc_id, w, h, y, x,
      |    CAST(floor((CAST(floor(v / 65536) AS BIGINT) * 299 + (CAST(floor(v / 256) AS BIGINT) % 256) * 587 + (v % 256) * 114) / 1000) AS BIGINT) AS gr
      |  FROM grid),
      |bits AS (
      |  SELECT a.doc_id, a.w, a.h, a.y, a.x,
      |    CASE WHEN b.gr > a.gr THEN 1 ELSE 0 END AS bit
      |  FROM gray a
      |  JOIN gray b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
      |  WHERE a.x < 8)
      |SELECT doc_id,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(SUM(CASE WHEN y < 4 THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x)) ELSE 0 END) AS BIGINT) AS dhash_hi,
      |  CAST(SUM(CASE WHEN y >= 4 THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x)) ELSE 0 END) AS BIGINT) AS dhash_lo
      |FROM bits
      |GROUP BY doc_id, w, h
      |ORDER BY doc_id""".stripMargin,
    "Perceptual image hash (dHash) from real decoded PNG pixels; oracle " +
      "replays the NN grid + luma + bit packing arithmetically") { (s, d) =>
    implicit val spark: SparkSession = s
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          (id, "image",
            Multimodal.pngBytes((9 + id % 8).toInt, (8 + id % 5).toInt, id))
        }
      }.toDF("media_id", "kind", "content")
    Multimodal.imageDHash(media).toDF()
      .select(col("media_id").as("doc_id"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"),
        col("dhash_hi"), col("dhash_lo"))
      .orderBy("doc_id")
  }

  /** Image dedup end to end: dHash from real decoded pixels → canonical
    * keep set per hash group (min media_id keeps). The corpus is
    * engineered so every `doc_id % 100` shares one image — 100 perceptual
    * groups of ~5 — and the oracle replays hash + grouping, so a single
    * wrong pixel or group boundary flips a keep flag and hash-fails.
    */
  val q96_image_neardup: QueryDef = q(
    "q96_image_neardup",
    """WITH dims AS (
      |  SELECT doc_id, doc_id % 100 AS img,
      |    9 + (doc_id % 100) % 8 AS w, 8 + (doc_id % 100) % 5 AS h
      |  FROM documents),
      |grid AS (
      |  SELECT doc_id, w, h, y, x,
      |    ((img * 31 + (CAST(floor((y * h) / 8) AS BIGINT))) * 31 + (CAST(floor((x * w) / 9) AS BIGINT))) % 16777216 AS v
      |  FROM dims,
      |    (SELECT y FROM range(0, 8) AS t(y)) ys,
      |    (SELECT x FROM range(0, 9) AS t(x)) xs),
      |gray AS (
      |  SELECT doc_id, w, h, y, x,
      |    CAST(floor((CAST(floor(v / 65536) AS BIGINT) * 299 + (CAST(floor(v / 256) AS BIGINT) % 256) * 587 + (v % 256) * 114) / 1000) AS BIGINT) AS gr
      |  FROM grid),
      |bits AS (
      |  SELECT a.doc_id, a.w, a.h, a.y, a.x,
      |    CASE WHEN b.gr > a.gr THEN 1 ELSE 0 END AS bit
      |  FROM gray a
      |  JOIN gray b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
      |  WHERE a.x < 8),
      |hashes AS (
      |  SELECT doc_id, w, h,
      |    CAST(SUM(CASE WHEN y < 4 THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x)) ELSE 0 END) AS BIGINT) AS hi,
      |    CAST(SUM(CASE WHEN y >= 4 THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x)) ELSE 0 END) AS BIGINT) AS lo
      |  FROM bits GROUP BY doc_id, w, h)
      |SELECT doc_id,
      |  MIN(doc_id) OVER (PARTITION BY w, h, hi, lo) AS canonical_id,
      |  CAST(CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY w, h, hi, lo)
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_keep
      |FROM hashes
      |ORDER BY doc_id""".stripMargin,
    "Image dedup end-to-end: perceptual hash groups to a canonical keep " +
      "set; oracle replays hash arithmetic and grouping") { (s, d) =>
    implicit val spark: SparkSession = s
    import s.implicits._
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val img = id % 100
          (id, "image",
            Multimodal.pngBytes((9 + img % 8).toInt, (8 + img % 5).toInt, img))
        }
      }.toDF("media_id", "kind", "content")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("width", "height", "dhash_hi", "dhash_lo")
    Multimodal.imageDHash(media).toDF()
      .select(col("media_id").as("doc_id"), col("width"), col("height"),
        col("dhash_hi"), col("dhash_lo"))
      .withColumn("canonical_id", min("doc_id").over(w))
      .select(col("doc_id"), col("canonical_id"),
        when(col("doc_id") === col("canonical_id"), 1L).otherwise(0L)
          .as("is_keep"))
      .orderBy("doc_id")
  }

  /** Cross-modal retrieval ([[Multimodal.crossModalTopK]]): text queries
    * against an image-kind media corpus over a SHARED embedding space —
    * the CLIP-retrieval shape with the learned encoder stubbed as
    * deterministic feature hashing ([[Multimodal.hashedBowEmbeddings]]
    * decodes each media payload and embeds it; the same encoder embeds
    * the text side, which is what "shared space" means). Queries are the
    * even doc_ids < 10, the media library is every odd doc. Integer
    * dots/norms make every rank and floor-ppm cosine value-checkable;
    * the oracle replays the bucket counts relationally (sparse
    * bucket-join dot products + a cross join so zero-overlap pairs still
    * rank) — no arrays needed on the DuckDB side.
    */
  val q131_crossmodal_retrieval: QueryDef = q(
    "q131_crossmodal_retrieval",
    """WITH tokq AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents WHERE doc_id % 2 = 0 AND doc_id < 10),
      |qb AS (
      |  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 16 AS b,
      |    COUNT(*) AS c
      |  FROM tokq WHERE w <> '' GROUP BY 1, 2),
      |qn AS (SELECT doc_id, SUM(c * c) AS n2 FROM qb GROUP BY doc_id),
      |tokm AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents WHERE doc_id % 2 = 1),
      |mb AS (
      |  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 16 AS b,
      |    COUNT(*) AS c
      |  FROM tokm WHERE w <> '' GROUP BY 1, 2),
      |mn AS (SELECT doc_id, SUM(c * c) AS n2 FROM mb GROUP BY doc_id),
      |dots AS (
      |  SELECT q.doc_id AS q_id, m.doc_id AS media_id, SUM(q.c * m.c) AS dot
      |  FROM qb q JOIN mb m ON q.b = m.b
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT qn.doc_id AS q_id, mn.doc_id AS media_id,
      |    CAST(COALESCE(d.dot, 0) AS DOUBLE)
      |      / sqrt(CAST(qn.n2 * mn.n2 AS DOUBLE)) AS cosine
      |  FROM qn CROSS JOIN mn
      |  LEFT JOIN dots d ON d.q_id = qn.doc_id AND d.media_id = mn.doc_id),
      |top AS (
      |  SELECT q_id, media_id, cosine,
      |    row_number() OVER (PARTITION BY q_id
      |                       ORDER BY cosine DESC, media_id) AS rnk
      |  FROM rk)
      |SELECT q_id, media_id, CAST(rnk AS BIGINT) AS rnk,
      |  CAST(floor(1000000 * cosine) AS BIGINT) AS cos_ppm
      |FROM top WHERE rnk <= 5
      |ORDER BY q_id, rnk""".stripMargin,
    "Cross-modal retrieval: text queries vs image media corpus in a " +
      "shared hashed-BoW embedding space, exact integer-dot kNN") { (s, d) =>
    val docs = Tables.documents(s, d)
    val media = Multimodal.asMediaTable(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", "image")
    val mEmb = Multimodal.hashedBowEmbeddings(media, "media_id",
      col("content"), dim = 16)
    val qEmb = Multimodal.hashedBowEmbeddings(
      docs.filter(col("doc_id") % 2 === 0 && col("doc_id") < 10),
      "doc_id", col("text"), dim = 16)
    Multimodal.crossModalTopK(mEmb, qEmb, k = 5).orderBy("q_id", "rnk")
  }

  /** Audio NEAR-dup end to end — the missing half of the perceptual-dedup
    * family (q96 groups EXACT image hashes; this finds audio within a few
    * fingerprint bits): synthesize 250 acoustic groups (md5-dispersed PCM
    * shared by `doc_id % 250`, one window re-recorded per member — a
    * local edit), run the REAL WAV encode → `javax.sound.sampled` decode
    * → [[Multimodal.audioFingerprint]] energy-delta fingerprint, then
    * [[Dedup.bandedHammingPairs]] (4×8-bit bands, verify ≤ 3 bits,
    * bucket cap 512). The oracle replays sample synthesis, window
    * energies, bit packing, banding, the cap, and the bit_count verify —
    * all integer — so a single wrong decoded sample or band boundary
    * hash-fails. Local edits touch 1 of 32 windows → ≤ 2 bits vs the
    * group base, so in-group pairs land at Hamming 0-4 and the ≤ 3
    * verify keeps most; cross-group fingerprints are md5-dispersed
    * (P(≤3 of 31 bits) ≈ 2·10⁻⁶) and never survive.
    */
  /** DuckDB replay of [[audioCorpus]] -> energy-delta fingerprint ->
    * banding -> capped candidate pairs, as a CTE chain (no WITH prefix
    * so q156 can prepend WITH RECURSIVE). Ends at
    * `cand(id_a, id_b, fa, fb)`; `fp(doc_id, fp)` is also addressable.
    */
  private val audioCandSql =
    """fr AS (
      |  SELECT doc_id, doc_id % 250 AS g, CAST(floor(doc_id / 250) AS BIGINT) AS m,
      |    unnest(range(0, 256)) AS i
      |  FROM documents),
      |samp AS (
      |  SELECT doc_id, CAST(floor(i / 8) AS BIGINT) AS w,
      |    CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
      |  FROM (SELECT doc_id, i,
      |          CAST(('0x' || substr(md5(
      |            CASE WHEN CAST(floor(i / 8) AS BIGINT) = m % 31
      |                 THEN g || '_' || i || '_' || m
      |                 ELSE g || '_' || i END), 1, 4)) AS BIGINT) AS v
      |        FROM fr)),
      |en AS (SELECT doc_id, w, SUM(s * s) AS e FROM samp GROUP BY 1, 2),
      |bits AS (
      |  SELECT a.doc_id, a.w - 1 AS j,
      |    CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
      |  FROM en a JOIN en b ON b.doc_id = a.doc_id AND b.w = a.w - 1
      |  WHERE a.w BETWEEN 1 AND 31),
      |fp AS (SELECT doc_id,
      |  CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(j AS INT))) AS BIGINT) AS fp
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, fp, b, (fp >> CAST(b * 8 AS INT)) & 255 AS bv
      |  FROM fp, (SELECT b FROM range(0, 4) AS t(b)) bb),
      |capped AS (
      |  SELECT doc_id, fp, b, bv FROM (
      |    SELECT doc_id, fp, b, bv, COUNT(*) OVER (PARTITION BY b, bv) AS bs
      |    FROM bands) t WHERE bs <= 512),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
      |    x.fp AS fa, y.fp AS fb
      |  FROM capped x JOIN capped y
      |    ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)""".stripMargin

  /** Shared md5-dispersed acoustic corpus (q141/q156): 250 PCM groups,
    * one re-recorded window per member m > 0 — see q141's scaladoc.
    */
  private def audioCorpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.map { id =>
          val g = id % 250
          val m = id / 250
          val samples = Array.tabulate(256) { i =>
            val key =
              if (i / 8 == m % 31) s"${g}_${i}_${m}" else s"${g}_${i}"
            val d0 = md.digest(key.getBytes("UTF-8"))
            // first 4 hex chars of the md5 = first 2 digest bytes
            (((d0(0) & 0xff) << 8) | (d0(1) & 0xff)).toShort
          }
          (id, "audio", Multimodal.wavBytesFrom(8000, 1, samples))
        }
      }.toDF("media_id", "kind", "content")
  }

  val q141_audio_fingerprint_neardup: QueryDef = q(
    "q141_audio_fingerprint_neardup",
    "WITH " + audioCandSql +
      """
        |SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(fa, fb)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "Audio near-dup: energy-delta fingerprint from real WAV decode, " +
      "banded Hamming LSH candidates (bucket-capped), <= 3-bit verify") {
    (s, d) =>
      val fps = CorpusBuilds.audioFingerprints(s, d, audioCorpus(s, d))
      Dedup.bandedHammingPairs(fps, "media_id", "fp",
          nBands = 4, bandBits = 8, maxHamming = 3, maxBucketSize = 512L)
        .orderBy("id_a", "id_b")
  }

  /** Audio curation CAPSTONE — q146's funnel for the acoustic corpus,
    * with QUALITY-AWARE keeper selection instead of min-id: near-dup
    * pairs (q141's kernel) close into components
    * ([[Dedup.connectedComponents]]), and each component keeps its
    * highest-ACTIVITY copy (activity = fingerprint popcount, a proxy for
    * spectral liveliness; ties break to the minimum id) via
    * [[Dedup.selectRepresentatives]]'s struct-min hash aggregate — no
    * per-cluster window sort. The oracle closes components with the
    * recursive-CTE fixpoint and replays the keeper as a per-component
    * (activity DESC, doc_id) rank, re-pinning the struct-min ≡
    * window-rank equivalence on a second modality.
    */
  val q156_audio_curation_capstone: QueryDef = q(
    "q156_audio_curation_capstone",
    "WITH RECURSIVE " + audioCandSql +
      """,
        |pairs AS (
        |  SELECT id_a, id_b FROM cand WHERE bit_count(xor(fa, fb)) <= 3),
        |e AS (SELECT id_a AS a, id_b AS b FROM pairs
        |      UNION SELECT id_b, id_a FROM pairs),
        |r(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cid FROM r GROUP BY a),
        |act AS (SELECT doc_id, CAST(bit_count(fp) AS BIGINT) AS activity FROM fp),
        |alln AS (
        |  SELECT act.doc_id, COALESCE(c.cid, act.doc_id) AS component_id,
        |    act.activity
        |  FROM act LEFT JOIN comp c ON act.doc_id = c.doc_id),
        |rk AS (
        |  SELECT doc_id, component_id, activity,
        |    row_number() OVER (PARTITION BY component_id
        |      ORDER BY activity DESC, doc_id) AS rn
        |  FROM alln)
        |SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        |  CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_id,
        |  CAST(MIN(CASE WHEN rn = 1 THEN activity END) AS BIGINT) AS rep_activity
        |FROM rk GROUP BY component_id
        |ORDER BY component_id""".stripMargin,
    "Audio curation capstone: fingerprint -> Hamming LSH pairs -> " +
      "connected components -> highest-activity keeper per component") {
    (s, d) =>
      val fps = CorpusBuilds.audioFingerprints(s, d, audioCorpus(s, d))
      val pairs = Dedup.bandedHammingPairs(fps, "media_id", "fp",
        nBands = 4, bandBits = 8, maxHamming = 3, maxBucketSize = 512L)
      val canon = Dedup.canonicalize(fps.select("media_id"), "media_id", pairs)
      val scored = fps.select(col("media_id"),
        bit_count(col("fp")).cast(LongType).as("activity"))
      Dedup.selectRepresentatives(canon, scored, "media_id", "activity")
        .groupBy(col("canonical_id").as("component_id"))
        .agg(count(lit(1)).as("n_members"),
          min("rep_id").as("rep_id"),
          min(when(col("is_rep") === 1L, col("activity"))).as("rep_activity"))
        .select(col("component_id"),
          col("n_members").cast(LongType).as("n_members"),
          col("rep_id").cast(LongType).as("rep_id"),
          col("rep_activity").cast(LongType).as("rep_activity"))
        .orderBy("component_id")
  }

  /** Image NEAR-dup within-k-bits — the perceptual upgrade of q96 (which
    * groups EXACT dHashes): 125 image groups with md5-dispersed pixels
    * ([[Multimodal.md5PngBytes]] — unrelated images land ~32/64 bits
    * apart, so cross-group pairs are impossible rather than improbable),
    * each member m > 0 re-shoots ONE downsample-sampled pixel (the NN
    * grid map x→⌊xw/9⌋ is injective for w ≥ 9, so exactly one of the 72
    * grid cells moves → ≤ 2 dHash bits). Real PNG encode → ImageIO decode
    * → [[Multimodal.imageDHash]] → [[Dedup.bandedHammingPairs]] over the
    * packed 64-bit hash (8×8-bit bands, verify ≤ 3, bucket cap 512). The
    * oracle replays pixels, luma, gradient bits, packing, banding, cap and
    * verify in integers — banding hi/lo words separately, bit-identical
    * to the packed-fp bands while dodging DuckDB's signed `<<` overflow.
    */
  /** Shared md5-dispersed perturbed-image corpus (q142/q146): 125 groups,
    * one re-shot sampled pixel per member — see q142's scaladoc.
    */
  private def hammingImageCorpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.map { id =>
          val g = id % 125
          val m = id / 125
          val w = (9 + g % 8).toInt
          val h = (8 + g % 5).toInt
          val py = (m % 8).toInt * h / 8
          val px = (m % 9).toInt * w / 9
          (id, "image", Multimodal.md5PngBytes(w, h, md, (x, y) =>
            if (m > 0 && y == py && x == px) s"${g}_${y}_${x}_${m}"
            else s"${g}_${y}_${x}"))
        }
      }.toDF("media_id", "kind", "content")
  }

  /** DuckDB replay of [[hammingImageCorpus]] → dHash → banding → capped
    * candidate pairs, as a CTE chain (no WITH prefix so q146 can prepend
    * WITH RECURSIVE). Ends at `cand(id_a, id_b, ha, la, hb, lb)`.
    */
  private val hammingImgSql =
    """dims AS (
      |  SELECT doc_id, doc_id % 125 AS g, CAST(floor(doc_id / 125) AS BIGINT) AS m,
      |    9 + (doc_id % 125) % 8 AS w, 8 + (doc_id % 125) % 5 AS h
      |  FROM documents),
      |grid AS (
      |  SELECT doc_id, g, m, y, x, CAST(floor((y * h) / 8) AS BIGINT) AS sy, CAST(floor((x * w) / 9) AS BIGINT) AS sx
      |  FROM dims,
      |    (SELECT y FROM range(0, 8) AS t(y)) ys,
      |    (SELECT x FROM range(0, 9) AS t(x)) xs),
      |px AS (
      |  SELECT doc_id, y, x,
      |    CAST(('0x' || substr(md5(
      |      CASE WHEN m > 0 AND y = m % 8 AND x = m % 9
      |           THEN g || '_' || sy || '_' || sx || '_' || m
      |           ELSE g || '_' || sy || '_' || sx END), 1, 6)) AS BIGINT) AS v
      |  FROM grid),
      |gray AS (
      |  SELECT doc_id, y, x,
      |    CAST(floor((CAST(floor(v / 65536) AS BIGINT) * 299 + (CAST(floor(v / 256) AS BIGINT) % 256) * 587 + (v % 256) * 114) / 1000) AS BIGINT) AS gr
      |  FROM px),
      |bits AS (
      |  SELECT a.doc_id, a.y, a.x, CASE WHEN b.gr > a.gr THEN 1 ELSE 0 END AS bit
      |  FROM gray a JOIN gray b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
      |  WHERE a.x < 8),
      |hl AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN y < 4 THEN bit * (CAST(1 AS BIGINT) << (y * 8 + x)) ELSE 0 END) AS BIGINT) AS hi,
      |    CAST(SUM(CASE WHEN y >= 4 THEN bit * (CAST(1 AS BIGINT) << ((y - 4) * 8 + x)) ELSE 0 END) AS BIGINT) AS lo
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, hi, lo, b,
      |    CASE WHEN b < 4 THEN (lo >> CAST(b * 8 AS INT)) & 255
      |         ELSE (hi >> CAST((b - 4) * 8 AS INT)) & 255 END AS bv
      |  FROM hl, (SELECT b FROM range(0, 8) AS t(b)) bb),
      |capped AS (
      |  SELECT doc_id, hi, lo, b, bv FROM (
      |    SELECT doc_id, hi, lo, b, bv, COUNT(*) OVER (PARTITION BY b, bv) AS bs
      |    FROM bands) t WHERE bs <= 512),
      |cand AS (
      |  SELECT DISTINCT p.doc_id AS id_a, r.doc_id AS id_b,
      |    p.hi AS ha, p.lo AS la, r.hi AS hb, r.lo AS lb
      |  FROM capped p JOIN capped r
      |    ON p.b = r.b AND p.bv = r.bv AND p.doc_id < r.doc_id)""".stripMargin

  val q142_image_hamming_neardup: QueryDef = q(
    "q142_image_hamming_neardup",
    "WITH " + hammingImgSql +
      """
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "Image near-dup within-k-bits: real PNG decode -> dHash -> banded " +
      "Hamming LSH (bucket-capped) -> <= 3-bit verify") { (s, d) =>
    val fps = CorpusBuilds.hammingImageDHashes(s, d, hammingImageCorpus(s, d))
      .select(col("media_id"),
        shiftleft(col("dhash_hi"), 32).bitwiseOR(col("dhash_lo")).as("fp"))
    Dedup.bandedHammingPairs(fps, "media_id", "fp",
        nBands = 8, bandBits = 8, maxHamming = 3, maxBucketSize = 512L)
      .orderBy("id_a", "id_b")
  }

  /** Multimodal curation CAPSTONE — q134's funnel shape for the image
    * corpus: real PNG decode → dHash → banded-Hamming near-dup pairs
    * (q142's kernel) → [[Dedup.connectedComponents]] (checkpointed
    * pointer-jumping label propagation, min-id canonical) → one row per
    * component with its size, the keeper's dimensions, and a
    * resolution-gate verdict (w·h ≥ 90). The oracle replays the whole
    * chain, closing components with a recursive CTE (q52's fixpoint
    * pattern) — so the distributed label propagation is value-checked
    * against a transitive closure on every component.
    */
  val q146_image_curation_capstone: QueryDef = q(
    "q146_image_curation_capstone",
    "WITH RECURSIVE " + hammingImgSql +
      """,
        |pairs AS (
        |  SELECT id_a, id_b FROM cand
        |  WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3),
        |e AS (SELECT id_a AS a, id_b AS b FROM pairs
        |      UNION SELECT id_b, id_a FROM pairs),
        |r(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cid FROM r GROUP BY a),
        |alln AS (
        |  SELECT dm.doc_id, COALESCE(c.cid, dm.doc_id) AS component_id,
        |    dm.w, dm.h
        |  FROM dims dm LEFT JOIN comp c ON dm.doc_id = c.doc_id)
        |SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        |  CAST(MIN(w) AS BIGINT) AS width, CAST(MIN(h) AS BIGINT) AS height,
        |  CAST(CASE WHEN MIN(w) * MIN(h) >= 90 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM alln GROUP BY component_id
        |ORDER BY component_id""".stripMargin,
    "Image curation capstone: decode -> dHash -> Hamming LSH pairs -> " +
      "connected components -> per-component keeper + resolution gate") {
    (s, d) =>
      val dh = CorpusBuilds.hammingImageDHashes(s, d, hammingImageCorpus(s, d))
      val fps = dh.select(col("media_id"),
        shiftleft(col("dhash_hi"), 32).bitwiseOR(col("dhash_lo")).as("fp"))
      val pairs = Dedup.bandedHammingPairs(fps, "media_id", "fp",
        nBands = 8, bandBits = 8, maxHamming = 3, maxBucketSize = 512L)
      val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      dh.select(col("media_id"), col("width"), col("height"))
        .join(comp, col("media_id") === col("node"), "left")
        .select(col("media_id"),
          coalesce(col("label"), col("media_id")).as("component_id"),
          col("width"), col("height"))
        .groupBy("component_id")
        .agg(count(lit(1)).as("n_members"),
          min("width").cast(LongType).as("width"),
          min("height").cast(LongType).as("height"))
        .withColumn("kept",
          (col("width") * col("height") >= 90L).cast(LongType))
        .orderBy("component_id")
  }

  /** Scene-cut detection end to end ([[Multimodal.videoSceneCuts]]): each
    * even doc becomes a real MJPEG-in-AVI video whose solid-gray frame
    * levels follow a scene SCRIPT — 3-frame scenes at base
    * (doc·37 + scene·101) mod 248 with a +0/+1/+2 within-scene wobble, so
    * consecutive in-scene deltas are 1 and scene boundaries jump by 99 or
    * −149 (the mod-248 cap keeps wobble from wrapping past 255, making
    * the ±8 threshold decision closed-form). The REAL pipeline — RIFF
    * walk → per-frame JPEG decode (bit-exact for solid gray at quality
    * 1.0, q100's argument) → integer mean luma → lag delta → running-sum
    * scene id — must reproduce the script exactly; the oracle replays the
    * script arithmetic and the segmentation windows.
    */
  val q145_video_scene_cuts: QueryDef = q(
    "q145_video_scene_cuts",
    """WITH dims AS (
      |  SELECT doc_id, 6 + doc_id % 5 AS nf FROM documents WHERE doc_id % 2 = 0),
      |fr AS (SELECT doc_id, unnest(range(0, nf)) AS f FROM dims),
      |lv AS (
      |  SELECT doc_id, f,
      |    (doc_id * 37 + (CAST(floor(f / 3) AS BIGINT)) * 101) % 248 + (f % 3) AS v
      |  FROM fr),
      |cut AS (
      |  SELECT doc_id, f, v,
      |    CASE WHEN pv IS NOT NULL AND abs(v - pv) > 8 THEN 1 ELSE 0 END AS is_cut
      |  FROM (SELECT doc_id, f, v,
      |          lag(v) OVER (PARTITION BY doc_id ORDER BY f) AS pv
      |        FROM lv) t)
      |SELECT doc_id, CAST(f AS BIGINT) AS frame_no, CAST(v AS BIGINT) AS luma,
      |  CAST(SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY f) AS BIGINT) AS scene_id
      |FROM cut
      |ORDER BY doc_id, frame_no""".stripMargin,
    "Video scene-cut detection: real AVI walk + JPEG decode -> integer " +
      "luma -> lag-delta threshold -> running-sum scene segmentation") {
    (s, d) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .filter(_ % 2 == 0)
        .mapPartitions { ids =>
          javax.imageio.ImageIO.setUseCache(false)
          ids.map { id =>
            val w = (8 + id % 5).toInt
            val h = (8 + id % 3).toInt
            val nf = (6 + id % 5).toInt
            val levels = Array.tabulate(nf)(f =>
              ((id * 37 + (f / 3) * 101) % 248 + (f % 3)).toInt)
            (id, "video", Multimodal.aviMjpegBytesFrom(w, h, levels))
          }
        }.toDF("media_id", "kind", "content")
      Multimodal.videoSceneCuts(media, threshold = 8)
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id", "frame_no")
  }

  def defs: Seq[QueryDef] = Seq(q63_image_codec, q64_wav_codec,
    q68_image_features, q71_frame_sample, q83_video_codec, q95_image_dhash,
    q96_image_neardup, q100_avi_mjpeg, q102_audio_features,
    q107_tiff_codec, q131_crossmodal_retrieval,
    q141_audio_fingerprint_neardup, q142_image_hamming_neardup,
    q145_video_scene_cuts, q146_image_curation_capstone,
    q156_audio_curation_capstone)
}
