package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** WavCodec: RIFF framing round-trips, chunk-walk robustness, PCM-only
  * rejection, corrupt-byte tolerance, and the WavFeatureDecoder exact
  * feature math. Plain JVM, no Spark. */
class WavCodecSpec extends AnyFunSuite {

  private def tone(n: Int, seed: Int): Array[Short] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
  }

  test("round-trip: mono and stereo, odd lengths") {
    for ((rate, ch, n) <- Seq((8000, 1, 1), (16000, 1, 801), (44100, 2, 250))) {
      val s = tone(n * ch, seed = n)
      val wav = WavCodec.encode(rate, ch, s)
      val dec = WavCodec.decode(wav).get
      assert(dec.sampleRate === rate && dec.channels === ch)
      assert(dec.samples.toSeq === s.toSeq)
    }
  }

  test("chunk walk skips ancillary chunks before data") {
    val s = tone(100, 3)
    val wav = WavCodec.encode(8000, 1, s)
    // splice a LIST chunk between fmt and data
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = wav.take(36) ++ list ++ wav.drop(36)
    // fix the RIFF size field (bytes 4-7, LE)
    val total = spliced.length - 8
    for (k <- 0 until 4) spliced(4 + k) = ((total >> (8 * k)) & 0xff).toByte
    val dec = WavCodec.decode(spliced)
    assert(dec.isDefined && dec.get.samples.toSeq === s.toSeq)
  }

  test("non-PCM and unsupported layouts are rejected, not misdecoded") {
    val wav = WavCodec.encode(8000, 1, tone(50, 1))
    val float32 = wav.clone(); float32(20) = 3 // fmt tag = IEEE float
    assert(WavCodec.decode(float32) === None)
    val bits8 = wav.clone(); bits8(34) = 8 // bits per sample
    assert(WavCodec.decode(bits8) === None)
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes) === None)
    assert(WavCodec.decode(null) === None)
  }

  test("decode never throws on corrupt or truncated bytes") {
    val good = WavCodec.encode(8000, 1, tone(200, 9))
    val rnd = new scala.util.Random(4)
    for (_ <- 0 until 300) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      WavCodec.decode(m) // must not throw
    }
    for (cut <- 0 until good.length by 11) WavCodec.decode(good.take(cut))
  }

  test("WavFeatureDecoder: exact sums, squares, and zero crossings") {
    val s = Array[Short](10, -5, 0, -1, 3)
    val wav = WavCodec.encode(8000, 1, s)
    val out = new WavFeatureDecoder().decode("audio", wav).get
    assert(out.kind === MultiModal.KindPcm)
    // [n, rate, ch, sum, sumAbs, sumSq, zc]: crossings at 10→-5,
    // -5→0, 0→-1, -1→3 (0 counts as non-negative)
    assert(out.values.toSeq === Seq(5f, 8000f, 1f, 7f, 19f, 135f, 4f))
  }

  test("envelopeBands: monotone loudness ramp sets every bit; silence none") {
    // strictly growing |amplitude| per window → every env(j+1) > env(j)
    val ramp = Array.tabulate(330)(i => (i / 10 + 1).toShort)
    val up = WavCodec.decode(WavCodec.encode(8000, 1, ramp)).get
    assert(WavCodec.envelopeBands(up).toSeq === Seq(0xff, 0xff, 0xff, 0xff))
    val flat = WavCodec.decode(WavCodec.encode(8000, 1,
      Array.fill[Short](330)(7))).get
    assert(WavCodec.envelopeBands(flat).toSeq === Seq(0, 0, 0, 0))
    // uniform gain does not change the fingerprint (trend-only bits)
    val doubled = WavCodec.decode(WavCodec.encode(8000, 1,
      ramp.map(v => (v * 2).toShort))).get
    assert(WavCodec.envelopeBands(doubled).toSeq ===
      WavCodec.envelopeBands(up).toSeq)
  }

  test("MediaDecoder dispatch: WAV → pcm, ahead of the histogram fallback") {
    val media = new MultiModal.MediaDecoder
    val wav = WavCodec.encode(8000, 1, tone(64, 2))
    val out = media.decode("audio", wav).get
    assert(out.kind === MultiModal.KindPcm && out.values(0) === 64f)
    assert(media.decode("audio", "mp3-ish garbage".getBytes).get.kind
      === MultiModal.KindHistogram)
  }
}
