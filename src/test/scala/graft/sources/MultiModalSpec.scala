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
    assert(out(0).getAs[Boolean]("decode_ok") === true)
  }

  test("sampleFrames explodes per-offset rows for video assets only") {
    val frames = MultiModal.sampleFrames(assets, everyMs = 500L)
    // only asset 2 is video (id % 3 == 2); duration 2*40+1000 = 1080ms → offsets 0,500,1000
    assert(frames.select("asset_id").distinct().as[Long].collect().toSeq === Seq(2L))
    assert(frames.select("frame_ms").as[Long].collect().sorted.toSeq === Seq(0L, 500L, 1000L))
  }
}
