package graft.sources

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Real pixel decode for the formats the JDK ships codecs for —
  * `javax.imageio` registers GIF, JPEG, BMP, TIFF and WBMP readers in
  * every standard JRE, so unlike native codec libraries it needs no
  * extra dependency on a 1000-executor cluster.
  *
  * Contract matches [[PngCodec]]: corrupt / truncated / oversized
  * payloads return None and never throw — bad media must never kill a
  * 100 TB job. Decoding is scan-side per-partition work; no Spark
  * types appear here.
  *
  * Reference capability: multimodal image columns (SURVEY §2.10); the
  * reference stores media as opaque blobs in MinIO — pixel features
  * are the beyond-reference training-data-pipeline requirement.
  */
object ImageIo {

  // ImageIO's default stream cache writes temp FILES on disk per
  // decode — pure memory streams keep executor-local decode free of
  // filesystem churn.
  ImageIO.setUseCache(false)

  /** Stable numeric codes for the feature-vector "format" slot (the
    * slot PNG fills with its color type 0/2/4/6 — codes ≥ 20 so the
    * two namespaces can never collide). */
  val FormatCodes: Map[String, Int] = Map(
    "gif" -> 20, "jpeg" -> 21, "jpg" -> 21, "bmp" -> 22,
    "tif" -> 23, "tiff" -> 23, "wbmp" -> 24, "png" -> 25)
  val FormatOther = 29

  /** Max decoded pixels (16 M ≈ a 4k×4k image): the luma plane is
    * materialized as an Int array, so this bounds decode memory at
    * 64 MB per in-flight image. */
  private val MaxPixels = 1L << 24

  /** Sniff + decode via whichever registered reader claims the bytes.
    * Returns (lower-case format name, image) or None. */
  def decode(bytes: Array[Byte]): Option[(String, BufferedImage)] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0); val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
          val img = reader.read(0)
          if (img == null) None
          else Some((reader.getFormatName.toLowerCase, img))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }
  }
}

/** [[MultiModal.Decoder]] over [[ImageIo]]: same feature layout as the
  * PNG path — [w, h, formatCode, rSum, gSum, bSum, lumaSum] ++ 8×8
  * average-pooled luma grid, all exact integer arithmetic (BT.601-ish
  * luma `(299r+587g+114b)/1000`, floor-division pooling) so a lossless
  * source format (GIF/BMP) is reproducible bit-for-bit by an external
  * oracle that never touches the bytes. */
final class ImageIoFeatureDecoder extends MultiModal.Decoder {
  override def decode(mediaType: String, bytes: Array[Byte]): Option[MultiModal.Features] =
    ImageIo.decode(bytes).map { case (fmt, img) =>
      val w = img.getWidth; val h = img.getHeight
      val luma = new Array[Int](w * h)
      val row = new Array[Int](w)
      var rs = 0L; var gs = 0L; var bs = 0L; var ls = 0L
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w) // sRGB regardless of storage model
        var x = 0
        while (x < w) {
          val p = row(x)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          val l = (299 * r + 587 * g + 114 * b) / 1000
          luma(y * w + x) = l
          rs += r; gs += g; bs += b; ls += l
          x += 1
        }
        y += 1
      }
      val code = ImageIo.FormatCodes.getOrElse(fmt, ImageIo.FormatOther)
      val head = Array[Float](w.toFloat, h.toFloat, code.toFloat,
        rs.toFloat, gs.toFloat, bs.toFloat, ls.toFloat)
      val grid = PngCodec.lumaGridOf(w, h, (x, y) => luma(y * w + x), 8, 8)
      MultiModal.Features(MultiModal.KindPixel, head ++ grid.map(_.toFloat))
    }
}
