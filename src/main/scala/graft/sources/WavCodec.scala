package graft.sources

/** Pure-JVM WAV (RIFF) PCM codec — no audio library, just the RIFF
  * container layout. Completes the real-decode story for the media
  * pipeline: images decode to pixels ([[PngCodec]], [[ImageIo]]),
  * audio decodes to PCM samples here; only video remains a labeled
  * fallback.
  *
  * Decode: RIFF/WAVE signature → chunk walk (`fmt ` / `data`) →
  * 16-bit little-endian signed PCM samples. Only uncompressed PCM
  * (format tag 1), 16-bit, mono/stereo — the dominant raw-audio
  * interchange shape. Anything else (float, ADPCM, 8/24-bit, weird
  * channel counts) returns None: corrupt or exotic media must never
  * kill a 100 TB job (same contract as [[PngCodec.decode]]).
  *
  * Encode exists for fixtures/tests: writes a genuine 44-byte RIFF
  * header + LE16 samples, so decode is exercised against real
  * container framing.
  *
  * Reference capability: multimodal media columns (SURVEY §2.10); the
  * reference stores media as opaque blobs — sample-level features are
  * the beyond-reference training-data-pipeline requirement.
  */
object WavCodec {

  /** Decoded PCM: interleaved 16-bit samples (length = frames ×
    * channels). */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  def decode(bytes: Array[Byte]): Option[Pcm] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) =
      bytes.length >= i + 4 && new String(bytes, i, 4, "US-ASCII") == s
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None

    var pos = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = le32(pos + 4)
      if (len < 0 || pos + 8 + len > bytes.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmtTag = le16(pos + 8)
          channels = le16(pos + 10)
          sampleRate = le32(pos + 12).toInt
          bits = le16(pos + 22)
          if (fmtTag != 1) return None // PCM only
        case "data" =>
          dataOff = pos + 8; dataLen = len.toInt
        case _ => () // ancillary chunk (LIST, fact, ...) — skip
      }
      pos += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || dataOff < 0 || bits != 16 ||
        channels < 1 || channels > 2) return None
    if (dataLen % 2 != 0) return None
    val n = dataLen / 2
    if (n > (1 << 26)) return None // bound decode memory (~128 MB)
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = (u8(dataOff + 2 * i) | (u8(dataOff + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Some(Pcm(sampleRate, channels, samples))
  }

  /** 32-bit energy-envelope fingerprint as FOUR 8-bit band values (the
    * LSH join keys — the audio analog of [[PngCodec.dhashBands]]):
    * split the stream into 33 windows by the same exact floor-division
    * region law as the luma grid, bit j set iff window j+1 has more
    * total |amplitude| than window j. Loudness-trend shape, robust to
    * uniform gain, exact integer math for oracle parity. */
  def envelopeBands(pcm: Pcm, windows: Int = 33): Array[Int] = {
    val n = pcm.samples.length
    val env = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      val i0 = w * n / windows
      val i1 = math.max(i0 + 1, (w + 1) * n / windows)
      var s = 0L; var i = i0
      while (i < math.min(i1, n)) { s += math.abs(pcm.samples(i).toLong); i += 1 }
      env(w) = s
      w += 1
    }
    val bands = new Array[Int](4)
    var j = 0
    while (j < 32) {
      if (env(j + 1) > env(j)) bands(j / 8) |= 1 << (j % 8)
      j += 1
    }
    bands
  }

  /** Encode 16-bit PCM as a canonical 44-byte-header WAV. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels == 1 || channels == 2, "mono/stereo only")
    require(samples.length % channels == 0, "sample count not a frame multiple")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }
}

/** [[MultiModal.Decoder]] over [[WavCodec]]: real sample-level audio
  * features, all exact integer arithmetic so an external oracle can
  * reproduce them from a closed-form sample law — [n_samples,
  * sample_rate, channels, sum(s), sum(|s|), sum(s²), zero_crossings]
  * (the DC/energy/activity trio a training-data audio filter needs).
  * Labeled [[MultiModal.KindPcm]]: never confusable with the
  * byte-histogram fallback. */
final class WavFeatureDecoder extends MultiModal.Decoder {
  override def decode(mediaType: String, bytes: Array[Byte]): Option[MultiModal.Features] =
    WavCodec.decode(bytes).map { pcm =>
      var sum = 0L; var sumAbs = 0L; var sumSq = 0L; var zc = 0L
      var i = 0
      val s = pcm.samples
      while (i < s.length) {
        val v = s(i).toLong
        sum += v; sumAbs += math.abs(v); sumSq += v * v
        // zero crossing = sign change between consecutive samples of
        // the interleaved stream (mono fixtures; stereo approximation)
        if (i > 0 && ((s(i - 1) < 0 && s(i) >= 0) || (s(i - 1) >= 0 && s(i) < 0))) zc += 1
        i += 1
      }
      MultiModal.Features(MultiModal.KindPcm, Array[Float](
        s.length.toFloat, pcm.sampleRate.toFloat, pcm.channels.toFloat,
        sum.toFloat, sumAbs.toFloat, sumSq.toFloat, zc.toFloat))
    }
}
