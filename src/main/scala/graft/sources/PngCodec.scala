package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG pixel codec — no image library, only `java.util.zip`.
  *
  * Decode: signature check → chunk walk (IHDR / IDAT* / IEND) → zlib
  * inflate → per-scanline unfilter (all five PNG filter types:
  * None/Sub/Up/Average/Paeth) → interleaved 8-bit samples. Supports the
  * non-interlaced 8-bit color types that cover web images: grayscale
  * (0), truecolor (2), gray+alpha (4), truecolor+alpha (6). Anything
  * else (16-bit, palette, Adam7) returns None — corrupt or exotic media
  * must never kill a 100 TB job (same contract as
  * [[MultiModal.ImageHeaders]]).
  *
  * Encode exists for fixtures and tests: it writes real zlib-deflated
  * IDAT with a caller-chosen filter type per scanline (so decode is
  * forced through every unfilter path) and real CRC32 chunk checksums.
  *
  * Reference capability: multimodal image columns (SURVEY §2.10); the
  * reference treats media as opaque blobs in MinIO — pixel features are
  * the beyond-reference training-data-pipeline requirement.
  */
object PngCodec {

  private val Sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Decoded image: `samples` is row-major with `channels` interleaved
    * 8-bit samples per pixel (length = width*height*channels). */
  final case class Decoded(width: Int, height: Int, colorType: Int, samples: Array[Byte]) {
    val channels: Int = channelsOf(colorType)
    private def s(x: Int, y: Int, c: Int): Int =
      samples((y * width + x) * channels + c) & 0xff
    def r(x: Int, y: Int): Int = s(x, y, 0)
    def g(x: Int, y: Int): Int = if (channels >= 3) s(x, y, 1) else s(x, y, 0)
    def b(x: Int, y: Int): Int = if (channels >= 3) s(x, y, 2) else s(x, y, 0)
    /** Integer BT.601-ish luma — exact integer arithmetic so an external
      * oracle can reproduce it bit-for-bit. */
    def luma(x: Int, y: Int): Int = (299 * r(x, y) + 587 * g(x, y) + 114 * b(x, y)) / 1000
  }

  def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 4 => 2
    case 6 => 4
    case _ => -1
  }

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < Sig.length + 25) return None
    var i = 0
    while (i < Sig.length) { if (bytes(i) != Sig(i)) return None; i += 1 }
    def u8(p: Int) = bytes(p) & 0xff
    def be32(p: Int) = (u8(p) << 24) | (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)

    var pos = Sig.length
    var width = -1; var height = -1; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 8 <= bytes.length) {
      val len = be32(pos)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(pos + 8); height = be32(pos + 12)
          val bitDepth = u8(pos + 16); colorType = u8(pos + 17)
          val compression = u8(pos + 18); val filterMethod = u8(pos + 19)
          val interlace = u8(pos + 20)
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 ||
              interlace != 0 || channelsOf(colorType) < 0) return None
          if (width <= 0 || height <= 0 || width.toLong * height > (1L << 26)) return None
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk — skip
      }
      pos += 12 + len
    }
    if (width < 0 || !sawEnd || idat.size() == 0) return None

    val ch = channelsOf(colorType)
    val rowBytes = width * ch
    val rawLen = height * (1 + rowBytes)
    val raw = new Array[Byte](rawLen)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, off, rawLen - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off != rawLen) return None
    } catch { case _: Exception => return None } finally inf.end()

    // unfilter each scanline in place into `out`; bpp = channels (8-bit)
    val out = new Array[Byte](height * rowBytes)
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + rowBytes)) & 0xff
      if (ft > 4) return None
      val src = y * (1 + rowBytes) + 1
      val dst = y * rowBytes
      var i2 = 0
      while (i2 < rowBytes) {
        val x = raw(src + i2) & 0xff
        val a = if (i2 >= ch) out(dst + i2 - ch) & 0xff else 0
        val b = if (y > 0) out(dst - rowBytes + i2) & 0xff else 0
        val c = if (y > 0 && i2 >= ch) out(dst - rowBytes + i2 - ch) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case 4 => x + paeth(a, b, c)
        }
        out(dst + i2) = (v & 0xff).toByte
        i2 += 1
      }
      y += 1
    }
    Some(Decoded(width, height, colorType, out))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode interleaved 8-bit samples as a real PNG: zlib IDAT, genuine
    * CRC32s, and `filterForRow(y)` choosing the filter type (0..4) each
    * scanline — fixtures cycle it so decode exercises every path. */
  def encode(width: Int, height: Int, colorType: Int, samples: Array[Byte],
             filterForRow: Int => Int = _ => 0): Array[Byte] = {
    val ch = channelsOf(colorType)
    require(ch > 0, s"unsupported color type $colorType")
    require(samples.length == width * height * ch, "sample length mismatch")
    val rowBytes = width * ch
    val raw = new Array[Byte](height * (1 + rowBytes))
    var y = 0
    while (y < height) {
      val ft = filterForRow(y) match { case f if f >= 0 && f <= 4 => f; case _ => 0 }
      raw(y * (1 + rowBytes)) = ft.toByte
      val dst = y * (1 + rowBytes) + 1
      var i = 0
      while (i < rowBytes) {
        val x = samples(y * rowBytes + i) & 0xff
        val a = if (i >= ch) samples(y * rowBytes + i - ch) & 0xff else 0
        val b = if (y > 0) samples((y - 1) * rowBytes + i) & 0xff else 0
        val c = if (y > 0 && i >= ch) samples((y - 1) * rowBytes + i - ch) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case 4 => x - paeth(a, b, c)
        }
        raw(dst + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }

    val deflated = {
      val d = new Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val outStream = new java.io.ByteArrayOutputStream()
      while (!d.finished()) {
        val n = d.deflate(buf)
        outStream.write(buf, 0, n)
      }
      d.end()
      outStream.toByteArray
    }

    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    chunk("IDAT", deflated)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** gh×gw average-pooled integer luma grid (row-major, floor division —
    * exact integer arithmetic for oracle parity). Cells cover
    * [i*w/gw, (i+1)*w/gw) × [j*h/gh, (j+1)*h/gh); images smaller than
    * the grid reuse source pixels (ceil-guarded bounds) so the grid is
    * total for any size. */
  def lumaGrid(img: Decoded, gw: Int, gh: Int): Array[Int] =
    lumaGridOf(img.width, img.height, img.luma, gw, gh)

  /** Source-agnostic form of [[lumaGrid]]: pool any `luma(x, y)`
    * accessor (PNG samples, an ImageIO `BufferedImage`, …) with the
    * same exact integer region law, so every decode path shares one
    * oracle-reproducible resample. */
  def lumaGridOf(width: Int, height: Int, luma: (Int, Int) => Int,
                 gw: Int, gh: Int): Array[Int] = {
    val grid = new Array[Int](gw * gh)
    var j = 0
    while (j < gh) {
      val y0 = j * height / gh
      val y1 = math.max(y0 + 1, (j + 1) * height / gh)
      var i = 0
      while (i < gw) {
        val x0 = i * width / gw
        val x1 = math.max(x0 + 1, (i + 1) * width / gw)
        var sum = 0; var n = 0
        var y = y0
        while (y < math.min(y1, height)) {
          var x = x0
          while (x < math.min(x1, width)) { sum += luma(x, y); n += 1; x += 1 }
          y += 1
        }
        grid(j * gw + i) = if (n == 0) 0 else sum / n
        i += 1
      }
      j += 1
    }
    grid
  }

  /** 64-bit perceptual dHash as FOUR 16-bit band values (the LSH join
    * keys): resample to a 9×8 luma grid, bit (y*8+x) set iff
    * grid(x+1,y) > grid(x,y). Banded representation instead of one
    * 64-bit word keeps every value far from BIGINT-overflow hazards in
    * external oracles and IS the candidate-join key layout. */
  def dhashBands(img: Decoded): Array[Int] = {
    val grid = lumaGrid(img, 9, 8)
    val bands = new Array[Int](4)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(y * 9 + x + 1) > grid(y * 9 + x)) {
          val idx = y * 8 + x
          bands(idx / 16) |= 1 << (idx % 16)
        }
        x += 1
      }
      y += 1
    }
    bands
  }
}
