package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Multimodal plumbing: schema, partition-parallel decode batches,
  * corrupt-payload tolerance, frame sampling. */
class MultiModalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val assets = MultiModal.fromText(
    Seq((0L, "hello"), (1L, "abc"), (2L, "xyzw")).toDF("id", "txt"),
    "id", "txt")

  test("fromText produces the canonical media schema") {
    assert(assets.schema.fieldNames.toSeq ===
      MultiModal.mediaSchema.fieldNames.toSeq)
    assert(assets.count() === 3)
  }

  test("withFeatures: deterministic stub decode, exact byte accounting") {
    val out = MultiModal.withFeatures(assets).orderBy("asset_id").collect()
    assert(out.forall(_.getAs[Boolean]("decode_ok")))
    // text payloads are no decodable image → every feature is labeled
    // as the histogram fallback, never as real pixels
    assert(out.forall(_.getAs[String]("feature_kind") === MultiModal.KindHistogram))
    assert(out.map(_.getAs[Int]("n_bytes")).toSeq === Seq(5, 3, 4))
    // histogram feature sums to byte count
    val hist = out(0).getSeq[Float](out(0).fieldIndex("feature"))
    assert(hist.sum === 5f)
    // deterministic: second run bit-identical
    val again = MultiModal.withFeatures(assets).orderBy("asset_id").collect()
    assert(again.map(_.getSeq[Float](out(0).fieldIndex("feature")).toSeq) ===
      out.map(_.getSeq[Float](out(0).fieldIndex("feature")).toSeq))
  }

  test("null payload survives as decode_ok=false") {
    val withNull = assets.withColumn("content",
      when(col("asset_id") === 1L, lit(null).cast("binary")).otherwise(col("content")))
    val out = MultiModal.withFeatures(withNull).orderBy("asset_id").collect()
    assert(out(1).getAs[Boolean]("decode_ok") === false)
    assert(out(1).isNullAt(out(1).fieldIndex("n_bytes")))
    assert(out(1).isNullAt(out(1).fieldIndex("feature_kind")))
    assert(out(0).getAs[Boolean]("decode_ok") === true)
  }

  test("sampleFrames explodes per-offset rows for video assets only") {
    val frames = MultiModal.sampleFrames(assets, everyMs = 500L)
    // only asset 2 is video (id % 3 == 2); duration 2*40+1000 = 1080ms → offsets 0,500,1000
    assert(frames.select("asset_id").distinct().as[Long].collect().toSeq === Seq(2L))
    assert(frames.select("frame_ms").as[Long].collect().sorted.toSeq === Seq(0L, 500L, 1000L))
  }

  test("ImageHeaders parses PNG, JPEG, and GIF dimensions; rejects garbage") {
    import java.nio.ByteBuffer
    // PNG 640x480
    val png = {
      val bb = ByteBuffer.allocate(33)
      bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      bb.putInt(13).put("IHDR".getBytes).putInt(640).putInt(480)
      bb.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      bb.array()
    }
    assert(MultiModal.ImageHeaders.parse(png) === Some(("png", 640, 480)))
    // JPEG 320x200 behind an APP0 segment (walk must skip by length)
    val jpg = {
      val bb = ByteBuffer.allocate(2 + 18 + 19)
      bb.put(0xff.toByte).put(0xd8.toByte)
      bb.put(0xff.toByte).put(0xe0.toByte).putShort(16)
      bb.put("JFIF".getBytes).put(0.toByte)
      bb.putShort(0x0102).put(0.toByte).putShort(1).putShort(1)
      bb.put(0.toByte).put(0.toByte)
      bb.put(0xff.toByte).put(0xc0.toByte).putShort(17)
      bb.put(8.toByte).putShort(200.toShort).putShort(320.toShort).put(3.toByte)
      bb.put(Array(1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte))
      bb.array()
    }
    assert(MultiModal.ImageHeaders.parse(jpg) === Some(("jpeg", 320, 200)))
    // GIF 12x34 (little-endian)
    val gif = "GIF89a".getBytes ++ Array[Byte](12, 0, 34, 0, 0, 0, 0)
    assert(MultiModal.ImageHeaders.parse(gif) === Some(("gif", 12, 34)))
    // garbage / truncated / null never throw
    assert(MultiModal.ImageHeaders.parse("not an image at all".getBytes) === None)
    assert(MultiModal.ImageHeaders.parse(Array[Byte](0xff.toByte, 0xd8.toByte)) === None)
    assert(MultiModal.ImageHeaders.parse(null) === None)
  }

  test("withVideoMeta appends MP4 metadata and nulls for non-video") {
    val mp4 = Mp4Boxes.encode(1000, 5000L, 640, 480, 2)
    val df = Seq((1L, mp4), (2L, "plain text".getBytes)).toDF("asset_id", "content")
    val out = MultiModal.withVideoMeta(df).orderBy("asset_id").collect()
    assert(out(0).getAs[Long]("video_duration_ms") === 5000L)
    assert(out(0).getAs[Int]("video_width") === 640)
    assert(out(0).getAs[Int]("video_tracks") === 2)
    assert(out(1).isNullAt(out(1).fieldIndex("video_duration_ms")))
  }

  test("withImageMeta appends parsed metadata and nulls for non-images") {
    import java.nio.ByteBuffer
    val png = {
      val bb = ByteBuffer.allocate(33)
      bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      bb.putInt(13).put("IHDR".getBytes).putInt(7).putInt(5)
      bb.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      bb.array()
    }
    val df = Seq((1L, png), (2L, "plain text".getBytes)).toDF("asset_id", "content")
    val out = MultiModal.withImageMeta(df).orderBy("asset_id")
      .select("img_format", "img_width", "img_height")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(out === Seq(("png", Some(7), Some(5)), (null, None, None)))
  }
}
