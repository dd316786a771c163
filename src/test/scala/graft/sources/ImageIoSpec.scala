package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** ImageIoFeatureDecoder: real pixels for the JDK-shipped codecs.
  * GIF/BMP are lossless → exact feature assertions; JPEG is
  * IDCT-implementation-defined → structural assertions (dimensions,
  * kind label) plus a channel-mean tolerance. Plain JVM, no Spark. */
class ImageIoSpec extends AnyFunSuite {

  private val dec = new ImageIoFeatureDecoder

  private def expectedFeatures(img: BufferedImage, code: Int): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    var rs = 0L; var gs = 0L; var bs = 0L; var ls = 0L
    val luma = Array.ofDim[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      val l = (299 * r + 587 * g + 114 * b) / 1000
      rs += r; gs += g; bs += b; ls += l; luma(y * w + x) = l
    }
    Array[Float](w.toFloat, h.toFloat, code.toFloat, rs.toFloat, gs.toFloat,
      bs.toFloat, ls.toFloat) ++
      PngCodec.lumaGridOf(w, h, (x, y) => luma(y * w + x), 8, 8).map(_.toFloat)
  }

  test("GIF decode is pixel-exact with the expected feature layout") {
    val palette = Array.tabulate(256)(i =>
      (i << 16) | (((i * 11 + 3) % 256) << 8) | ((i * 13 + 5) % 256))
    val idx = Array.tabulate(11 * 9)(i => ((i * 37) % 256).toByte)
    val gif = GifCodec.encode(11, 9, palette, idx)
    val out = dec.decode("image", gif).get
    assert(out.kind === MultiModal.KindPixel)
    val img = ImageIO.read(new ByteArrayInputStream(gif))
    assert(out.values.toSeq === expectedFeatures(img, 20).toSeq)
    assert(out.values.length === 7 + 64)
  }

  test("BMP decode (ImageIO-written) is pixel-exact") {
    val img = new BufferedImage(10, 6, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 10)
      img.setRGB(x, y, ((x * 21) << 16) | ((y * 40) << 8) | ((x + y) * 9))
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "bmp", bos))
    val out = dec.decode("image", bos.toByteArray).get
    assert(out.kind === MultiModal.KindPixel)
    assert(out.values.toSeq === expectedFeatures(img, 22).toSeq)
  }

  test("JPEG decode: exact dimensions, pixel label, lossy channel tolerance") {
    val (w, h) = (32, 24)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) // smooth gradient: JPEG-friendly
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 10) << 8) | 64)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpeg", bos))
    val out = dec.decode("image", bos.toByteArray).get
    assert(out.kind === MultiModal.KindPixel)
    assert(out.values(0) === w.toFloat && out.values(1) === h.toFloat)
    assert(out.values(2) === 21f) // jpeg format code
    // lossy: per-channel MEAN within a few levels of the source
    var rs = 0L; var gs = 0L; var bs = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
    }
    val n = (w * h).toFloat
    assert(math.abs(out.values(3) / n - rs / n) < 4f)
    assert(math.abs(out.values(4) / n - gs / n) < 4f)
    assert(math.abs(out.values(5) / n - bs / n) < 4f)
  }

  test("MediaDecoder dispatch: PNG→PngCodec, GIF/JPEG→ImageIO, text→histogram") {
    val media = new MultiModal.MediaDecoder
    // PNG goes through the pure-JVM codec (colorType slot < 20)
    val png = PngCodec.encode(5, 4, 2, Array.fill(60)(33.toByte))
    val pngOut = media.decode("image", png).get
    assert(pngOut.kind === MultiModal.KindPixel && pngOut.values(2) === 2f)
    // GIF goes through ImageIO (format-code slot 20)
    val palette = Array.tabulate(256)(i => i * 0x010101)
    val gif = GifCodec.encode(5, 4, palette, Array.fill(20)(7.toByte))
    val gifOut = media.decode("image", gif).get
    assert(gifOut.kind === MultiModal.KindPixel && gifOut.values(2) === 20f)
    // non-image bytes fall through to the labeled histogram
    val txt = media.decode("audio", "not an image".getBytes).get
    assert(txt.kind === MultiModal.KindHistogram)
  }

  test("decode never throws on corrupt, truncated, or null bytes") {
    assert(ImageIo.decode(null) === None)
    assert(ImageIo.decode(Array[Byte](1, 2, 3)) === None)
    val palette = Array.tabulate(256)(i => i * 0x010101)
    val good = GifCodec.encode(9, 8, palette,
      Array.tabulate(72)(i => (i % 11).toByte))
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 200) {
      val mutated = good.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      dec.decode("image", mutated) // must not throw
    }
    for (cut <- 0 until good.length by 5)
      dec.decode("image", good.take(cut)) // must not throw
  }
}
