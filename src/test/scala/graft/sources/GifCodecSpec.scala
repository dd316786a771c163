package graft.sources

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** GifCodec (our encoder) × javax.imageio (the JDK decoder): the two
  * implementations share no code, so a pixel-exact round-trip proves
  * the LZW stream is genuinely spec-conformant — code-width growth at
  * 512/1024/2048, dictionary reset at 4096, sub-block framing. Plain
  * JVM, no Spark. */
class GifCodecSpec extends AnyFunSuite {

  private val palette: Array[Int] =
    Array.tabulate(256)(i => (i << 16) | (((i * 11 + 3) % 256) << 8) | ((i * 13 + 5) % 256))

  private def roundTrip(w: Int, h: Int, indices: Array[Byte]): Unit = {
    val gif = GifCodec.encode(w, h, palette, indices)
    val img = ImageIO.read(new ByteArrayInputStream(gif))
    assert(img != null, s"JDK reader rejected our GIF ${w}x$h")
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val expect = palette(indices(y * w + x) & 0xff)
      val got = img.getRGB(x, y) & 0xffffff
      assert(got === expect, s"pixel ($x,$y) of ${w}x$h differs")
    }
  }

  test("round-trip: tiny and odd geometries, structured data") {
    roundTrip(1, 1, Array[Byte](42))
    roundTrip(9, 8, Array.tabulate(72)(i => ((i * 31) % 256).toByte))
    roundTrip(13, 7, Array.tabulate(91)(i => (i % 5).toByte)) // heavy dict reuse
    roundTrip(16, 16, Array.fill(256)(0.toByte))              // constant run
  }

  test("round-trip: random data crossing every code-width boundary and a dict reset") {
    // 120x120 random bytes compress poorly: the dictionary blows past
    // 512/1024/2048 and hits the 4096 reset several times
    val rnd = new scala.util.Random(7)
    roundTrip(120, 120, Array.fill(120 * 120)(rnd.nextInt(256).toByte))
  }

  test("round-trip: highly compressible data grows long dictionary chains") {
    // repeating tiles make LZW emit long multi-pixel codes
    val (w, h) = (101, 53)
    roundTrip(w, h, Array.tabulate(w * h)(i => ((i % w) % 16).toByte))
  }

  test("JDK sniffer identifies the stream as GIF") {
    val gif = GifCodec.encode(4, 3, palette, Array.tabulate(12)(_.toByte))
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(gif))
    val readers = ImageIO.getImageReaders(iis)
    assert(readers.hasNext)
    assert(readers.next().getFormatName.toLowerCase === "gif")
    iis.close()
    assert(MultiModal.ImageHeaders.parse(gif) === Some(("gif", 4, 3)))
  }
}
