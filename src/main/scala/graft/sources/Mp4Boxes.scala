package graft.sources

/** Pure-JVM MP4/MOV container-metadata parser — the video analog of
  * [[MultiModal.ImageHeaders]]: no codec, just the ISO BMFF box walk
  * (`ftyp`/`moov` → `mvhd` for timescale+duration, `trak`/`tkhd` for
  * track count and presentation dimensions). Frame-level decode stays
  * a labeled fallback (H.264 et al. are not shippable here); the
  * METADATA a pipeline partitions and filters on is real.
  *
  * Contract matches the other codecs: corrupt / truncated / exotic
  * payloads return None and never throw.
  *
  * Encode exists for fixtures/tests: writes genuine ftyp + moov
  * (mvhd + N × trak/tkhd) framing so the walker is exercised against
  * real box structure.
  */
object Mp4Boxes {

  /** durationMs = mvhd duration × 1000 / timescale (floor); width and
    * height from the FIRST video-sized tkhd (16.16 fixed point). */
  final case class VideoMeta(durationMs: Long, width: Int, height: Int, nTracks: Int)

  def parse(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 16) return None
    def u8(i: Int) = bytes(i) & 0xff
    def be32(i: Int) = (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def typ(i: Int) = new String(bytes, i + 4, 4, "US-ASCII")
    try {
      // top level: require an ftyp or moov leading box (sniff)
      if (typ(0) != "ftyp" && typ(0) != "moov") return None
      var pos = 0
      var moovOff = -1; var moovEnd = -1
      while (pos + 8 <= bytes.length && moovOff < 0) {
        val size = be32(pos)
        if (size < 8 || pos + size > bytes.length) return None
        if (typ(pos) == "moov") { moovOff = pos + 8; moovEnd = pos + size.toInt }
        pos += size.toInt
      }
      if (moovOff < 0) return None

      var p = moovOff
      var durMs = -1L; var w = -1; var h = -1; var tracks = 0
      while (p + 8 <= moovEnd) {
        val size = be32(p)
        if (size < 8 || p + size > moovEnd) return None
        typ(p) match {
          case "mvhd" =>
            val v = u8(p + 8)
            val (ts, du) =
              if (v == 0 && size >= 8 + 4 + 8 + 8)
                (be32(p + 20), be32(p + 24))
              else if (v == 1 && size >= 8 + 4 + 16 + 12)
                (be32(p + 28),
                 (be32(p + 32) << 32) | be32(p + 36))
              else return None
            if (ts <= 0) return None
            durMs = du * 1000L / ts
          case "trak" =>
            tracks += 1
            // walk the trak container for its tkhd
            var q = p + 8
            val qEnd = p + size.toInt
            while (q + 8 <= qEnd) {
              val s2 = be32(q)
              if (s2 < 8 || q + s2 > qEnd) return None
              if (typ(q) == "tkhd" && u8(q + 8) == 0 && s2 >= 92 && w < 0) {
                val tw = (be32(q + 8 + 76) >> 16).toInt // 16.16 fixed
                val th = (be32(q + 8 + 80) >> 16).toInt
                if (tw > 0 && th > 0) { w = tw; h = th }
              }
              q += s2.toInt
            }
          case _ => () // udta, iods, ... — skip
        }
        p += size.toInt
      }
      if (durMs < 0 || tracks == 0) None
      else Some(VideoMeta(durMs, math.max(w, 0), math.max(h, 0), tracks))
    } catch { case _: Exception => None }
  }

  /** Minimal valid fixture: ftyp + moov(mvhd, nTracks × trak(tkhd)).
    * The first track carries the presentation size; extra tracks are
    * zero-sized (audio-like). */
  def encode(timescale: Int, duration: Long, width: Int, height: Int,
             nTracks: Int): Array[Byte] = {
    require(timescale > 0 && duration >= 0 && nTracks >= 1)
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ t.getBytes("US-ASCII") ++ payload

    val identity = // 3×3 transform matrix in 16.16 / 2.30 fixed point
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

    val mvhd = box("mvhd",
      be32(0) ++                 // version 0 + flags
      be32(0) ++ be32(0) ++      // creation, modification
      be32(timescale) ++ be32(duration) ++
      be32(0x00010000L) ++       // rate 1.0
      Array[Byte](0x01, 0x00) ++ // volume 1.0
      new Array[Byte](10) ++     // reserved
      identity ++
      new Array[Byte](24) ++     // pre_defined
      be32(nTracks + 1L))        // next_track_ID

    def tkhd(id: Int, w: Int, h: Int) = box("tkhd",
      be32(0) ++
      be32(0) ++ be32(0) ++      // creation, modification
      be32(id) ++ be32(0) ++     // track_ID, reserved
      be32(duration) ++
      new Array[Byte](8) ++      // reserved
      new Array[Byte](8) ++      // layer, alt_group, volume, reserved
      identity ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

    val traks = (1 to nTracks).map { id =>
      box("trak", tkhd(id, if (id == 1) width else 0, if (id == 1) height else 0))
    }.reduce(_ ++ _)

    out.write(box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes))
    out.write(box("moov", mvhd ++ traks))
    out.toByteArray
  }
}
