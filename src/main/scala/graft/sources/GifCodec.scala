package graft.sources

/** Pure-JVM GIF87a ENCODER — fixture/test counterpart to the
  * `javax.imageio` GIF decode path, the same role [[PngCodec.encode]]
  * plays for PNG: fixtures are written by THIS code and decoded by the
  * JDK's reader, so a t46 hash match is a genuine cross-implementation
  * proof that real LZW compression was inverted (an encoder bug and a
  * decoder bug cannot cancel — they share no code).
  *
  * Emits a single-frame GIF87a with a 256-entry global color table and
  * real variable-code-width LZW (9→12 bits, dictionary reset on
  * overflow, LSB-first bit packing, 255-byte sub-blocks) — not the
  * "uncompressed GIF" clear-code trick. GIF is lossless for 8-bit
  * indexed data, which is what makes an exact closed-form oracle
  * possible.
  *
  * Reference capability: multimodal image columns (SURVEY §2.10); the
  * reference stores media as opaque blobs — pixel-exact codecs are the
  * beyond-reference training-data-pipeline requirement.
  */
object GifCodec {

  /** `palette`: exactly 256 packed 0xRRGGBB entries. `indices`: row-major
    * w*h bytes indexing into it. */
  def encode(width: Int, height: Int, palette: Array[Int],
             indices: Array[Byte]): Array[Byte] = {
    require(palette.length == 256, "palette must have 256 entries")
    require(indices.length == width * height, "index length mismatch")
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff)
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }

    out.write("GIF87a".getBytes("US-ASCII"))
    // logical screen descriptor: global color table, 8 bits/channel, 256 entries
    le16(width); le16(height)
    out.write(0xf7); out.write(0); out.write(0)
    palette.foreach { rgb =>
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff); out.write(rgb & 0xff)
    }
    // image descriptor: full-frame, no local table, not interlaced
    out.write(0x2c); le16(0); le16(0); le16(width); le16(height); out.write(0)
    out.write(8) // LZW minimum code size
    val packed = lzwEncode(indices)
    var off = 0
    while (off < packed.length) { // 255-byte data sub-blocks
      val n = math.min(255, packed.length - off)
      out.write(n); out.write(packed, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // GIF-flavor LZW over 8-bit symbols: clear=256, EOI=257, first free
  // code 258; code width grows 9→12 as the dictionary fills and a
  // clear resets it at 4096 entries.
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val Clear = 256; val Eoi = 257
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0; var bitCnt = 0
    var codeSize = 9
    def emit(code: Int): Unit = {
      bitBuf |= code << bitCnt // LSB-first packing
      bitCnt += codeSize
      while (bitCnt >= 8) { out.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8 }
    }
    // dictionary: (prefix code, next byte) → code, keyed as prefix<<8|byte
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = Eoi + 1

    emit(Clear)
    if (data.isEmpty) { emit(Eoi) }
    else {
      var cur: Int = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = Integer.valueOf((cur << 8) | k)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          if (nextCode < 4096) {
            dict.put(key, Integer.valueOf(nextCode))
            nextCode += 1
            // widen in lockstep with the decoder. The decoder only adds
            // a table entry from the SECOND post-clear code onward, so
            // its slot counter lags ours by one: it widens after
            // reading the code whose add makes ITS table reach
            // 2^codeSize — one code later than our own assignment
            // crossing it. Hence the +1.
            if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else {
            emit(Clear)
            dict = new java.util.HashMap[Integer, Integer]()
            codeSize = 9; nextCode = Eoi + 1
          }
          cur = k
        }
        i += 1
      }
      emit(cur); emit(Eoi)
    }
    if (bitCnt > 0) out.write(bitBuf & 0xff)
    out.toByteArray
  }
}
