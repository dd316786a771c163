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
  * The actual codec is STUBBED (this container ships no image/audio
  * libraries) behind `Decoder`; the Spark-side plumbing — schema,
  * partition-parallel batch shape, null/corrupt handling, feature
  * columns — is real and tested. Swap `StubDecoder` for a JNI/JavaCV
  * decoder in production without touching the pipeline.
  */
object MultiModal {

  /** Canonical media-asset schema: key + opaque payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),   // image|audio|video
    StructField("content", BinaryType, nullable = true),      // opaque bytes
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Decoded per-asset features appended by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = true),
    StructField("content_hash", LongType, nullable = true),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** A batch decoder: bytes → (ok, feature vector). Implementations must
    * be deterministic for a given payload. */
  trait Decoder extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): Option[Array[Float]]
  }

  /** Deterministic fake standing in for the real codec: "features" are a
    * fixed-dim byte histogram (so tests can assert exact values). A real
    * implementation would JPEG-decode / resample here. */
  final class StubDecoder(dim: Int = 8) extends Decoder {
    override def decode(mediaType: String, bytes: Array[Byte]): Option[Array[Float]] =
      if (bytes == null) None
      else {
        val hist = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
        Some(hist)
      }
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
        Row.fromSeq(r.toSeq ++ Seq(nBytes, hash, feat.isDefined, feat.orNull))
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
