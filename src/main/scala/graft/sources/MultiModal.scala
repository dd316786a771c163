package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, processed batch-wise via
  * mapPartitions (the Scala analog of a pandas-batched UDF: one
  * decode-library initialization per partition, not per row).
  *
  * Metadata extraction is REAL: [[ImageHeaders]] parses PNG/JPEG/GIF
  * container headers (dimensions + format) in pure JVM with no codec
  * library. Feature decode is REAL for images AND audio: the pure-JVM
  * [[PngCodec]] for PNG, the JDK's `javax.imageio` (GIF/JPEG/BMP/TIFF)
  * via [[ImageIoFeatureDecoder]], and the pure-JVM [[WavCodec]] for
  * RIFF/WAV PCM via [[WavFeatureDecoder]]. Only formats with no
  * shippable codec here (video, compressed audio) fall back to the
  * deterministic byte-histogram [[StubDecoder]] — and every feature
  * row carries a `feature_kind` label (`pixel` / `pcm` / `histogram`)
  * so the fallback can never masquerade as real decode output.
  */
object MultiModal {

  /** Pure-JVM image container-header parsing → (format, width, height).
    * Handles the three dominant web formats:
    *  - PNG: 8-byte signature then the IHDR chunk (big-endian dims)
    *  - GIF 87a/89a: logical screen descriptor (little-endian dims)
    *  - JPEG: segment walk to the first SOFn frame header, skipping
    *    APPn/COM/DQT/... by their lengths and tolerating fill bytes
    * Returns None (never throws) on anything unparseable — corrupt
    * media must never kill a 100 TB job. */
  object ImageHeaders extends Serializable {
    private val Ihdr = Array[Byte]('I', 'H', 'D', 'R')

    def parse(bytes: Array[Byte]): Option[(String, Int, Int)] = {
      if (bytes == null || bytes.length < 10) return None
      def u8(i: Int) = bytes(i) & 0xff
      def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      if (bytes.length >= 24 &&
          u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
          u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
          bytes.slice(12, 16).sameElements(Ihdr))
        return Some(("png", be32(16), be32(20)))
      if (u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8')
        return Some(("gif", le16(6), le16(8)))
      if (u8(0) == 0xff && u8(1) == 0xd8) { // JPEG SOI, then segment walk
        var i = 2
        while (i + 3 < bytes.length) {
          if (u8(i) != 0xff) return None // lost sync
          var j = i
          while (j + 1 < bytes.length && u8(j + 1) == 0xff) j += 1 // fill bytes
          val marker = u8(j + 1)
          if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i = j + 2
          else if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS, no SOF seen
          else {
            val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc // not DHT/JPG/DAC
            if (isSof)
              return if (j + 8 < bytes.length) Some(("jpeg", be16(j + 7), be16(j + 5)))
                     else None
            if (j + 3 >= bytes.length) return None
            i = j + 2 + be16(j + 2)
          }
        }
      }
      None
    }
  }

  /** Canonical media-asset schema: key + opaque payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),   // image|audio|video
    StructField("content", BinaryType, nullable = true),      // opaque bytes
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Decoded per-asset features appended by the decode stage.
    * `feature_kind` labels the provenance of `feature` — `pixel` for
    * real decoded-pixel features, `histogram` for the deterministic
    * byte-histogram fallback — so fabricated features can never
    * silently pass as real in a downstream training pipeline. */
  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = true),
    StructField("content_hash", LongType, nullable = true),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("feature_kind", StringType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  val KindPixel = "pixel"
  val KindPcm = "pcm"
  val KindHistogram = "histogram"

  /** Feature vector + its provenance label (one of [[KindPixel]] /
    * [[KindHistogram]]). */
  final case class Features(kind: String, values: Array[Float])

  /** A batch decoder: bytes → labeled feature vector. Implementations
    * must be deterministic for a given payload. */
  trait Decoder extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): Option[Features]
  }

  /** Deterministic fallback for formats with no decodable codec
    * (audio/video/unknown): "features" are a fixed-dim byte histogram
    * (so tests can assert exact values), labeled `histogram` so they
    * are always distinguishable from real pixels. Images do NOT go
    * through this — [[PngFeatureDecoder]] and [[ImageIoFeatureDecoder]]
    * are real pixel decodes. */
  final class StubDecoder(dim: Int = 8) extends Decoder {
    override def decode(mediaType: String, bytes: Array[Byte]): Option[Features] =
      if (bytes == null) None
      else {
        val hist = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
        Some(Features(KindHistogram, hist))
      }
  }

  /** REAL pixel-level image decode, pure JVM ([[PngCodec]]: zlib inflate
    * + scanline unfilter). Feature layout (all values integer-exact in
    * Float for oracle-gated images; production-size channel sums may
    * round above 2^24 — the gate documents means as the scale-out form):
    * [w, h, colorType, rSum, gSum, bSum, lumaSum] ++ 8×8 average-pooled
    * luma grid. Non-PNG / corrupt payloads → None (decode_ok=false). */
  final class PngFeatureDecoder extends Decoder {
    override def decode(mediaType: String, bytes: Array[Byte]): Option[Features] =
      PngCodec.decode(bytes).map { img =>
        var rs = 0L; var gs = 0L; var bs = 0L; var ls = 0L
        var y = 0
        while (y < img.height) {
          var x = 0
          while (x < img.width) {
            rs += img.r(x, y); gs += img.g(x, y); bs += img.b(x, y)
            ls += img.luma(x, y)
            x += 1
          }
          y += 1
        }
        val head = Array[Float](img.width.toFloat, img.height.toFloat,
          img.colorType.toFloat, rs.toFloat, gs.toFloat, bs.toFloat, ls.toFloat)
        Features(KindPixel, head ++ PngCodec.lumaGrid(img, 8, 8).map(_.toFloat))
      }
  }

  /** Default production decoder: dispatch on payload sniffing — the
    * pure-JVM PNG codec first (oracle-proven exact), then
    * [[ImageIoFeatureDecoder]] (JDK `javax.imageio`: GIF/JPEG/BMP/TIFF
    * — real pixels, labeled `pixel`), then [[WavFeatureDecoder]]
    * (RIFF/WAV PCM — real samples, labeled `pcm`), then the
    * byte-histogram fallback for payloads nothing claims
    * (video/unknown), labeled `histogram`. */
  final class MediaDecoder extends Decoder {
    private val png = new PngFeatureDecoder
    private val imageio = new ImageIoFeatureDecoder
    private val wav = new WavFeatureDecoder
    private val stub = new StubDecoder()
    override def decode(mediaType: String, bytes: Array[Byte]): Option[Features] =
      png.decode(mediaType, bytes)
        .orElse(imageio.decode(mediaType, bytes))
        .orElse(wav.decode(mediaType, bytes))
        .orElse(stub.decode(mediaType, bytes))
  }

  /** Decode / feature-extract stage: partition-parallel, one decoder per
    * partition (the mapInPandas batch shape). Null or failing payloads
    * yield decode_ok=false rows instead of dying — corrupt media must
    * never kill a 100 TB job. */
  def withFeatures(assets: DataFrame, decoder: Decoder = new StubDecoder()): DataFrame = {
    val outSchema = StructType(assets.schema.fields ++ featureSchema.fields)
    val enc = RowEncoder.encoderFor(outSchema)
    val mediaIdx = assets.schema.fieldIndex("media_type")
    val contentIdx = assets.schema.fieldIndex("content")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(contentIdx)) null else r.getAs[Array[Byte]](contentIdx)
        val mt = if (r.isNullAt(mediaIdx)) "unknown" else r.getString(mediaIdx)
        val feat = try decoder.decode(mt, bytes) catch { case _: Exception => None }
        val nBytes: Any = if (bytes == null) null else bytes.length
        val hash: Any = if (bytes == null) null
                        else java.util.Arrays.hashCode(bytes).toLong
        Row.fromSeq(r.toSeq ++ Seq(nBytes, hash, feat.isDefined,
          feat.map(_.kind).orNull, feat.map(_.values).orNull))
      }
    }(enc)
  }

  /** Image-metadata columns appended by [[withImageMeta]]. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("img_format", StringType, nullable = true),
    StructField("img_width", IntegerType, nullable = true),
    StructField("img_height", IntegerType, nullable = true)))

  /** REAL metadata decode: parse image dimensions + format out of the
    * binary payload (PNG IHDR / JPEG SOFn / GIF descriptor) inside the
    * same partition-parallel mapPartitions shape as [[withFeatures]].
    * Non-image or unparseable payloads get null metadata, not errors. */
  def withImageMeta(assets: DataFrame): DataFrame = {
    val outSchema = StructType(assets.schema.fields ++ imageMetaSchema.fields)
    val enc = RowEncoder.encoderFor(outSchema)
    val contentIdx = assets.schema.fieldIndex("content")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(contentIdx)) null else r.getAs[Array[Byte]](contentIdx)
        val m = ImageHeaders.parse(bytes)
        Row.fromSeq(r.toSeq ++ Seq(
          m.map(_._1).orNull,
          m.map(x => Int.box(x._2)).orNull,
          m.map(x => Int.box(x._3)).orNull))
      }
    }(enc)
  }

  /** Video-metadata columns appended by [[withVideoMeta]]. */
  val videoMetaSchema: StructType = StructType(Seq(
    StructField("video_duration_ms", LongType, nullable = true),
    StructField("video_width", IntegerType, nullable = true),
    StructField("video_height", IntegerType, nullable = true),
    StructField("video_tracks", IntegerType, nullable = true)))

  /** REAL video-container metadata: ISO BMFF (MP4/MOV) box walk via
    * [[Mp4Boxes]] in the same partition-parallel mapPartitions shape as
    * [[withImageMeta]]. Non-MP4 or unparseable payloads get null
    * metadata, not errors. */
  def withVideoMeta(assets: DataFrame): DataFrame = {
    val outSchema = StructType(assets.schema.fields ++ videoMetaSchema.fields)
    val enc = RowEncoder.encoderFor(outSchema)
    val contentIdx = assets.schema.fieldIndex("content")
    assets.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(contentIdx)) null else r.getAs[Array[Byte]](contentIdx)
        val m = Mp4Boxes.parse(bytes)
        Row.fromSeq(r.toSeq ++ Seq(
          m.map(x => Long.box(x.durationMs)).orNull,
          m.map(x => Int.box(x.width)).orNull,
          m.map(x => Int.box(x.height)).orNull,
          m.map(x => Int.box(x.nTracks)).orNull))
      }
    }(enc)
  }

  /** Frame-sampling shape for video: emit one row per sampled offset
    * (explode of a generated offset array — partition-parallel, no
    * driver involvement). */
  def sampleFrames(assets: DataFrame, everyMs: Long): DataFrame =
    assets
      .filter(col("media_type") === "video" && col("duration_ms").isNotNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))

  /** Synthesize a deterministic media table from any keyed text column —
    * the test/bench source (UTF-8 bytes as payload). */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("asset_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("media_type"),
      col(textCol).cast(BinaryType).as("content"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      (col(idCol) % 10000 * 40 + 1000).cast(LongType).as("duration_ms"))
}
