package graft.functions

/** ISO-BMFF (MP4) movie-header codec — the VIDEO half of the multimodal
  * header tier, same posture as [[MediaHeaders]]: pure byte parsing of the
  * container structure per the public ISO/IEC 14496-12 spec (box = u32
  * big-endian size + 4cc type, `size == 1` → u64 largesize follows,
  * `size == 0` → box extends to end of input; `moov` → `mvhd` movie
  * header carrying timescale/duration, version 0 = 32-bit times,
  * version 1 = 64-bit; `trak` → `tkhd` carrying presentation width/height
  * as 16.16 fixed-point). No codec work — exactly the routing metadata a
  * 100 TB ingest runs on every object (duration buckets, aspect filters,
  * corrupt-input quarantine) before any frame decode is scheduled.
  */
object MediaHeadersMp4 {

  /** Parsed movie header: movie timescale (ticks/second), duration in
    * ticks, and the FIRST track's presentation size (integer part of the
    * spec's 16.16 fixed-point; 0x0 for sizeless tracks, e.g. audio).
    */
  final case class VideoHeader(
      mime: String, timescale: Long, durationTicks: Long,
      width: Long, height: Long)

  private def be32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def be64(v: Long): Array[Byte] =
    Array.tabulate(8)(i => (v >>> (8 * (7 - i))).toByte)

  private def readBe32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
      ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)

  private def readBe64(p: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (p(off + i) & 0xffL); i += 1 }
    v
  }

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ fourcc(tpe) ++ payload

  /** Spec-shaped MP4 prefix: `ftyp` + optional `free` padding (written
    * with a 64-bit largesize to exercise that spec path) + `moov{mvhd,
    * trak{tkhd}}`. `mvhdVersion` 0 or 1 selects 32- vs 64-bit
    * time/duration fields — real files ship both.
    */
  def mp4Header(
      timescale: Long, durationTicks: Long, width: Int, height: Int,
      mvhdVersion: Int = 0, freeLen: Int = 0): Array[Byte] = {
    require(timescale > 0 && durationTicks >= 0, s"bad clock $timescale/$durationTicks")
    require(mvhdVersion == 0 || mvhdVersion == 1, s"mvhd version $mvhdVersion")
    val ftyp = box("ftyp",
      fourcc("isom") ++ be32(512) ++ fourcc("isom") ++ fourcc("mp41"))
    val free =
      if (freeLen <= 0) Array.empty[Byte]
      // size==1: the real size rides the 64-bit largesize field
      else be32(1) ++ fourcc("free") ++ be64(16L + freeLen) ++
        Array.fill(freeLen)(0x66.toByte)
    val mvhd = {
      val times =
        if (mvhdVersion == 0)
          be32(0) ++ be32(0) ++ be32(timescale) ++ be32(durationTicks)
        else
          be64(0) ++ be64(0) ++ be32(timescale) ++ be64(durationTicks)
      box("mvhd",
        Array[Byte](mvhdVersion.toByte, 0, 0, 0) ++ times ++
          be32(0x00010000L) ++ // rate 1.0
          Array[Byte](0x01, 0) ++ // volume 1.0
          new Array[Byte](10) ++ // reserved
          identityMatrix ++
          new Array[Byte](24) ++ // pre_defined
          be32(2)) // next_track_ID
    }
    val tkhd = box("tkhd",
      Array[Byte](0, 0, 0, 7) ++ // version 0, flags enabled|in-movie|in-preview
        be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(durationTicks) ++
        new Array[Byte](8) ++ // reserved
        new Array[Byte](2) ++ // layer
        new Array[Byte](2) ++ // alternate_group
        new Array[Byte](2) ++ // volume (0 for video)
        new Array[Byte](2) ++ // reserved
        identityMatrix ++
        be32(width.toLong << 16) ++ be32(height.toLong << 16)) // 16.16
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ free ++ moov
  }

  private val identityMatrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

  /** Walk the top-level box sequence to `moov`, then its children to
    * `mvhd` (timescale/duration, both versions) and the first `trak`'s
    * `tkhd` (presentation size). Truncation discipline matches
    * [[MediaHeaders.parseWavHeader]]: a box the buffer cannot contain
    * while required boxes are unfound is a truncated/corrupt object —
    * None, never a partial answer.
    */
  def parseMp4Header(p: Array[Byte]): Option[VideoHeader] = {
    // (start, end) of each box's PAYLOAD for the requested type, walking
    // [from, until); returns the first match
    def findBox(tpe: String, from: Int, until: Int): Option[(Int, Int)] = {
      var off = from.toLong
      while (off + 8 <= until) {
        val size0 = readBe32(p, off.toInt)
        val id = new String(p.slice(off.toInt + 4, off.toInt + 8), "US-ASCII")
        val (payloadStart, boxEnd) =
          if (size0 == 1L) {
            if (off + 16 > until) return None
            (off + 16, off + readBe64(p, off.toInt + 8))
          } else if (size0 == 0L) (off + 8, until.toLong)
          else (off + 8, off + size0)
        if (boxEnd > until || boxEnd <= payloadStart - 8) return None
        if (id == tpe) return Some((payloadStart.toInt, boxEnd.toInt))
        off = boxEnd
      }
      None
    }
    if (p.length < 12) return None
    // the spec requires ftyp early; demand it first like a checking reader
    val ftyp = findBox("ftyp", 0, p.length)
    if (!ftyp.exists(_._1 == 8)) return None
    for {
      (moovS, moovE) <- findBox("moov", ftyp.get._2, p.length)
      (mvhdS, mvhdE) <- findBox("mvhd", moovS, moovE)
      header <- {
        if (mvhdS + 4 > mvhdE) None
        else p(mvhdS) match {
          case 0 => // v0: ctime(4) mtime(4) timescale(4) duration(4)
            if (mvhdS + 20 > mvhdE) None
            else Some((readBe32(p, mvhdS + 12), readBe32(p, mvhdS + 16)))
          case 1 => // v1: ctime(8) mtime(8) timescale(4) duration(8)
            if (mvhdS + 32 > mvhdE) None
            else Some((readBe32(p, mvhdS + 20), readBe64(p, mvhdS + 24)))
          case _ => None
        }
      }
    } yield {
      val (timescale, duration) = header
      // first trak's tkhd; a sizeless (audio) or trak-less file is still
      // a valid movie — width/height report 0
      val wh = (for {
        (trakS, trakE) <- findBox("trak", moovS, moovE)
        (tkS, tkE) <- findBox("tkhd", trakS, trakE)
        v = p(tkS) & 0xff
        // v0: fixed header is 4+4+4+4+4+4 = 24 to duration end; width
        // sits 52 bytes before payload end in both versions (matrix(36)
        // + width(4) + height(4) are the TAIL of the box)
        if tkE - tkS >= 8
      } yield (readBe32(p, tkE - 8) >>> 16, readBe32(p, tkE - 4) >>> 16))
        .getOrElse((0L, 0L))
      VideoHeader("video/mp4", timescale, duration, wh._1, wh._2)
    }
  }
}
