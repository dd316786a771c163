package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Mp4Boxes: ISO BMFF box-walk round-trips, version-1 mvhd, ancillary
  * boxes, corrupt-byte tolerance. Plain JVM, no Spark. */
class Mp4BoxesSpec extends AnyFunSuite {

  test("round-trip: duration floor division, dimensions, track count") {
    for ((ts, du, w, h, n) <- Seq((1000, 5000L, 640, 480, 1),
                                  (600, 1234L, 1920, 1080, 3),
                                  (500, 999L, 320, 240, 2))) {
      val m = Mp4Boxes.parse(Mp4Boxes.encode(ts, du, w, h, n)).get
      assert(m === Mp4Boxes.VideoMeta(du * 1000L / ts, w, h, n))
    }
  }

  test("walker skips ancillary boxes before moov") {
    val base = Mp4Boxes.encode(1000, 2000L, 640, 480, 1)
    // splice a free box between ftyp (20 bytes: 8 header + 12 payload)
    // and moov
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes ++ Array[Byte](1, 2, 3, 4)
    val spliced = base.take(20) ++ free ++ base.drop(20)
    assert(Mp4Boxes.parse(spliced).get.durationMs === 2000L)
  }

  test("version-1 mvhd (64-bit times) parses identically") {
    // hand-build: take the v0 fixture and rebuild its mvhd as v1
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val payload =
      Array[Byte](1, 0, 0, 0) ++              // version 1
      new Array[Byte](16) ++                  // creation+modification (8+8)
      be32(1000) ++                           // timescale
      be32(0) ++ be32(7000) ++                // duration (64-bit)
      new Array[Byte](80)                     // rest (rate..next_track_ID)
    val mvhd = be32(8L + payload.length) ++ "mvhd".getBytes ++ payload
    val trak = {
      val base = Mp4Boxes.encode(1000, 7000L, 100, 50, 1)
      // extract the trak box out of the v0 fixture's moov
      // (ftyp 20 bytes + moov header 8 + mvhd 108 → traks)
      base.slice(20 + 8 + 108, base.length)
    }
    val moovPayload = mvhd ++ trak
    val moov = be32(8L + moovPayload.length) ++ "moov".getBytes ++ moovPayload
    val ftyp = be32(20) ++ "ftyp".getBytes ++
      "isom".getBytes ++ be32(0) ++ "isom".getBytes
    val m = Mp4Boxes.parse(ftyp ++ moov)
    assert(m.get.durationMs === 7000L && m.get.width === 100 && m.get.nTracks === 1)
  }

  test("parse never throws on corrupt, truncated, or foreign bytes") {
    val good = Mp4Boxes.encode(600, 3000L, 320, 240, 2)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val mutated = good.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      Mp4Boxes.parse(mutated) // must not throw
    }
    for (cut <- 0 until good.length by 9) Mp4Boxes.parse(good.take(cut))
    assert(Mp4Boxes.parse(null) === None)
    assert(Mp4Boxes.parse("RIFF not an mp4 at all......".getBytes) === None)
    // a WAV or PNG payload is rejected by the sniff, not misparsed
    assert(Mp4Boxes.parse(WavCodec.encode(8000, 1, Array[Short](1, 2, 3))) === None)
  }
}
