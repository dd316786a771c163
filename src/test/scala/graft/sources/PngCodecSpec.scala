package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** PngCodec: encode→decode round-trips across every filter type, color
  * type, and geometry; grid resampling; dHash bit layout; corrupt-byte
  * tolerance (decode never throws). No Spark involvement — the codec is
  * plain JVM code run inside scan-side UDFs. */
class PngCodecSpec extends AnyFunSuite {

  private def pixels(w: Int, h: Int, ch: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
  }

  private val colorTypes = Seq(0, 2, 4, 6)

  test("round-trip: every filter type × every color type × odd sizes") {
    for (ct <- colorTypes; ft <- 0 to 4; (w, h) <- Seq((1, 1), (3, 2), (9, 8), (17, 5))) {
      val ch = PngCodec.channelsOf(ct)
      val px = pixels(w, h, ch, seed = ct * 100 + ft * 10 + w)
      val png = PngCodec.encode(w, h, ct, px, _ => ft)
      val dec = PngCodec.decode(png)
      assert(dec.isDefined, s"decode failed ct=$ct ft=$ft ${w}x$h")
      assert(dec.get.width === w && dec.get.height === h && dec.get.colorType === ct)
      assert(dec.get.samples.toSeq === px.toSeq, s"pixels differ ct=$ct ft=$ft ${w}x$h")
    }
  }

  test("round-trip with mixed filter types per scanline") {
    val (w, h) = (13, 11)
    val px = pixels(w, h, 3, seed = 42)
    val png = PngCodec.encode(w, h, 2, px, y => y % 5)
    assert(PngCodec.decode(png).get.samples.toSeq === px.toSeq)
  }

  test("grayscale luma equals the sample value exactly") {
    val px = pixels(4, 3, 1, seed = 7)
    val img = PngCodec.decode(PngCodec.encode(4, 3, 0, px)).get
    for (y <- 0 until 3; x <- 0 until 4)
      assert(img.luma(x, y) === (px(y * 4 + x) & 0xff))
  }

  test("lumaGrid is the identity at grid geometry and exact average-pool at 2x") {
    val (w, h) = (9, 8)
    val px = pixels(w, h, 3, seed = 99)
    val img = PngCodec.decode(PngCodec.encode(w, h, 2, px)).get
    val grid = PngCodec.lumaGrid(img, 9, 8)
    for (y <- 0 until 8; x <- 0 until 9)
      assert(grid(y * 9 + x) === img.luma(x, y))

    // 18×16 image whose 2×2 blocks replicate the 9×8 image: average-pool
    // must reproduce the 9×8 grid exactly
    val big = new Array[Byte](18 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 18; c <- 0 until 3)
      big((y * 18 + x) * 3 + c) = px(((y / 2) * 9 + x / 2) * 3 + c)
    val bigImg = PngCodec.decode(PngCodec.encode(18, 16, 2, big, _ % 5)).get
    assert(PngCodec.lumaGrid(bigImg, 9, 8).toSeq === grid.toSeq)
  }

  test("dhash bit layout: single gradient row sets exactly the expected bits") {
    // luma strictly increasing along x → every comparison true → all 64 bits
    val px = new Array[Byte](9 * 8)
    for (y <- 0 until 8; x <- 0 until 9) px(y * 9 + x) = (x * 20).toByte
    val img = PngCodec.decode(PngCodec.encode(9, 8, 0, px)).get
    assert(PngCodec.dhashBands(img).toSeq === Seq(0xffff, 0xffff, 0xffff, 0xffff))
    // constant image → no strict increase → all-zero hash
    val flat = PngCodec.decode(PngCodec.encode(9, 8, 0, Array.fill(72)(50.toByte))).get
    assert(PngCodec.dhashBands(flat).toSeq === Seq(0, 0, 0, 0))
  }

  test("decode never throws on corrupt or truncated bytes") {
    val good = PngCodec.encode(9, 8, 2, pixels(9, 8, 3, seed = 5), _ % 5)
    val rnd = new scala.util.Random(1)
    for (trial <- 0 until 300) {
      val mutated = good.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      PngCodec.decode(mutated) // corrupt media must never kill the job
    }
    for (cut <- 0 until good.length by 7)
      PngCodec.decode(good.take(cut))
    assert(PngCodec.decode(null) === None)
    assert(PngCodec.decode(Array[Byte](1, 2, 3)) === None)
  }

  test("unsupported shapes are rejected, not misdecoded") {
    // 16-bit depth: rewrite the IHDR bit-depth byte and fix nothing else
    val png = PngCodec.encode(3, 3, 2, pixels(3, 3, 3, seed = 3))
    val depth16 = png.clone()
    depth16(24) = 16.toByte // IHDR bit depth at offset 8+4+4+4+4
    assert(PngCodec.decode(depth16) === None)
    // interlaced flag
    val adam7 = png.clone()
    adam7(28) = 1.toByte
    assert(PngCodec.decode(adam7) === None)
  }

  test("PngFeatureDecoder emits exact sums and dispatch falls back for non-PNG") {
    val px = Array.tabulate(9 * 8 * 3)(i => ((i * 31) % 256).toByte)
    val png = PngCodec.encode(9, 8, 2, px, _ % 5)
    val decoded = new MultiModal.PngFeatureDecoder().decode("image", png).get
    assert(decoded.kind === MultiModal.KindPixel)
    val feat = decoded.values
    val img = PngCodec.decode(png).get
    var rs = 0L
    for (y <- 0 until 8; x <- 0 until 9) rs += img.r(x, y)
    assert(feat(0) === 9f && feat(1) === 8f && feat(2) === 2f)
    assert(feat(3) === rs.toFloat)
    assert(feat.length === 7 + 64)
    val media = new MultiModal.MediaDecoder
    val pix = media.decode("image", png).get // real pixel path
    assert(pix.kind === MultiModal.KindPixel && pix.values.length === 71)
    val hist = media.decode("image", "ab".getBytes).get // histogram fallback
    assert(hist.kind === MultiModal.KindHistogram && hist.values.length === 8)
  }
}
