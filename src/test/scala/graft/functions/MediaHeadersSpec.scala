package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** PNG IHDR / JPEG SOF header codecs ([[MediaHeaders]]) — pinned against
  * hand-written spec vectors (byte layouts from RFC 2083 and ITU-T T.81,
  * independent of the synthesizer), round-tripped through the synthesizer,
  * and rejected on truncation/corruption (the quarantine contract).
  */
class MediaHeadersSpec extends AnyFunSuite {

  import MediaHeaders._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("spec vector: the canonical 1x1 RGBA PNG header parses") {
    // the textbook minimal PNG prefix: signature + IHDR(1, 1, depth 8,
    // color type 6) with its well-known CRC 0x1f15c489
    val v = bytes(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89)
    assert(parseImageHeader(v) ===
      Some(ImageHeader("image/png", 1L, 1L, 4L, 8L)))
  }

  test("spec vector: a JFIF JPEG with SOF0 parses via marker walking") {
    // SOI, APP0/JFIF (length 16), SOF0 640x480, 3 components, precision 8
    val v = bytes(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 0x4a, 0x46, 0x49, 0x46, 0x00,
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02, 0x80, 0x03,
      0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    assert(parseImageHeader(v) ===
      Some(ImageHeader("image/jpeg", 640L, 480L, 3L, 8L)))
  }

  test("spec vector: progressive JPEG (SOF2) and grayscale (1 component) parse") {
    val sof2 = bytes(0xff, 0xd8,
      0xff, 0xc2, 0x00, 0x0b, 0x08, 0x00, 0x64, 0x00, 0xc8, 0x01,
      0x01, 0x11, 0x00)
    assert(parseImageHeader(sof2) ===
      Some(ImageHeader("image/jpeg", 200L, 100L, 1L, 8L)))
  }

  test("round-trip: synthesized headers parse back exactly (big-endian > 255)") {
    for ((w, h) <- Seq((1, 1), (300, 7), (65535, 65535), (509, 3500))) {
      assert(parseImageHeader(jpegHeader(w, h, commentLen = 5)) ===
        Some(ImageHeader("image/jpeg", w.toLong, h.toLong, 3L, 8L)))
      assert(parseImageHeader(pngHeader(w, h, 8, 2)) ===
        Some(ImageHeader("image/png", w.toLong, h.toLong, 3L, 8L)))
    }
    // every PNG color-type → channels mapping
    for ((ct, ch) <- Seq(0 -> 1L, 2 -> 3L, 3 -> 1L, 4 -> 2L, 6 -> 4L))
      assert(parseImageHeader(pngHeader(10, 20, 8, ct)).get.channels === ch)
  }

  test("synthesized PNG carries a correct CRC32 (a checking reader accepts it)") {
    val p = pngHeader(640, 480, 8, 6)
    val crc = new java.util.zip.CRC32
    crc.update(p, 12, 4 + 13) // "IHDR" + data
    val stored = ((p(29) & 0xffL) << 24) | ((p(30) & 0xffL) << 16) |
      ((p(31) & 0xffL) << 8) | (p(32) & 0xffL)
    assert(stored === crc.getValue)
  }

  test("truncated and corrupt inputs are rejected, never guessed") {
    val png = pngHeader(100, 200, 8, 2)
    val jpg = jpegHeader(100, 200, commentLen = 3)
    // truncations at every prefix length parse as None (PNG shorter than
    // IHDR; JPEG cut before/inside SOF)
    for (n <- 0 until png.length) {
      val r = parseImageHeader(png.take(n))
      assert(r.isEmpty, s"PNG truncated at $n parsed as $r")
    }
    for (n <- 0 until jpg.length) {
      val r = parseImageHeader(jpg.take(n))
      assert(r.isEmpty, s"JPEG truncated at $n parsed as $r")
    }
    // wrong chunk tag, invalid color type, zero dimension
    val badTag = png.clone(); badTag(12) = 'X'.toByte
    assert(parseImageHeader(badTag).isEmpty)
    val badColor = png.clone(); badColor(25) = 9.toByte
    assert(parseImageHeader(badColor).isEmpty)
    val zeroW = png.clone()
    zeroW(16) = 0; zeroW(17) = 0; zeroW(18) = 0; zeroW(19) = 0
    assert(parseImageHeader(zeroW).isEmpty)
    // JPEG: lost marker sync / segment length overrunning the buffer
    val badSync = jpg.clone(); badSync(2) = 0x00.toByte
    assert(parseImageHeader(badSync).isEmpty)
    val overrun = jpg.clone(); overrun(4) = 0x7f.toByte // APP0 len 0x7f10
    assert(parseImageHeader(overrun).isEmpty)
    // neither format
    assert(parseImageHeader(Array.empty[Byte]).isEmpty)
    assert(parseImageHeader("plain text".getBytes("UTF-8")).isEmpty)
  }

  test("spec vectors: GIF logical screen descriptor and BMP info header parse") {
    // hand-written GIF89a 320x200 LSD, color resolution 8 bits/primary
    // (packed 0x70 = bits 4-6 set), no global color table
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array(0x40, 0x01, 0xc8, 0x00, 0x70, 0x00, 0x00).map(_.toByte)
    assert(parseImageHeader(gif) ===
      Some(MediaHeaders.ImageHeader("image/gif", 320, 200, 1, 8)))
    // GIF87a accepted; other versions rejected
    val g87 = gif.clone(); g87(4) = '7'.toByte
    assert(parseImageHeader(g87).isDefined)
    val g90 = gif.clone(); g90(4) = '9'.toByte; g90(5) = '0'.toByte
    assert(parseImageHeader(g90).isEmpty)

    // synthesized BMP 24-bit: 3 channels, 8 bits/sample; top-down
    // (negative height) parses with the magnitude
    assert(parseImageHeader(bmpHeader(800, 600, 24)) ===
      Some(MediaHeaders.ImageHeader("image/bmp", 800, 600, 3, 8)))
    assert(parseImageHeader(bmpHeader(16, -32, 32)) ===
      Some(MediaHeaders.ImageHeader("image/bmp", 16, 32, 4, 8)))
    assert(parseImageHeader(bmpHeader(5, 5, 8)) ===
      Some(MediaHeaders.ImageHeader("image/bmp", 5, 5, 1, 8)))
  }

  test("spec vector: a hand-written canonical 44-byte PCM WAV header parses") {
    // 8000 Hz mono 8-bit, 4 payload bytes — the textbook minimal WAV
    val v = bytes('R', 'I', 'F', 'F', 40, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0, // fmt size 16
      1, 0, // PCM
      1, 0, // 1 channel
      0x40, 0x1f, 0, 0, // 8000 Hz
      0x40, 0x1f, 0, 0, // byte rate
      1, 0, // block align
      8, 0, // bits per sample
      'd', 'a', 't', 'a', 4, 0, 0, 0,
      1, 2, 3, 4)
    assert(parseWavHeader(v) ===
      Some(AudioHeader("audio/wav", 8000, 1, 8, 4, 4)))
  }

  test("WAV chunk walking: JUNK chunks (odd sizes word-aligned) are skipped") {
    for (junk <- Seq(0, 1, 5, 8, 11)) {
      val payload = Array.fill(10)(0x55.toByte)
      val p = wavHeader(44100, 2, 16, payload.length, junkLen = junk) ++ payload
      assert(parseWavHeader(p) ===
        Some(AudioHeader("audio/wav", 44100, 2, 16, 10, 2)),
        s"junkLen=$junk")
    }
  }

  test("WAV truncation, non-PCM, and declared-payload-cut rejection") {
    val payload = Array.fill(6)(0x10.toByte)
    val p = wavHeader(16000, 1, 16, payload.length, junkLen = 3) ++ payload
    for (n <- 0 until p.length) {
      val r = parseWavHeader(p.take(n))
      assert(r.isEmpty, s"WAV truncated at $n parsed as $r")
    }
    // format tag 2 (ADPCM): routed elsewhere, never guessed as PCM
    val adpcm = p.clone()
    // fmt chunk starts after RIFF(12) + JUNK(8 + 3 + 1 pad)
    val fmtOff = 12 + 8 + 4
    assert(new String(adpcm.slice(fmtOff, fmtOff + 4), "US-ASCII") == "fmt ")
    adpcm(fmtOff + 8) = 2
    assert(parseWavHeader(adpcm).isEmpty)
    // wrong RIFF form type
    val avi = p.clone(); avi(8) = 'A'; avi(9) = 'V'; avi(10) = 'I'; avi(11) = ' '
    assert(parseWavHeader(avi).isEmpty)
  }

  test("WAV malformed chunk sizes terminate with None (no wrap, no hang)") {
    def riff(chunk: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ bytes(40, 0, 0, 0) ++
        "WAVE".getBytes("US-ASCII") ++ chunk
    // 0xFFFFFFF8: as a wrapped Int the step would be exactly 0 (infinite
    // loop); 0x7FFFFFFF: the wrapped offset would go negative (AIOOBE) —
    // both must reject as corrupt, promptly
    val loopy = riff("JUNK".getBytes("US-ASCII") ++
      bytes(0xf8, 0xff, 0xff, 0xff) ++ Array.fill(16)(0.toByte))
    assert(parseWavHeader(loopy).isEmpty)
    val huge = riff("JUNK".getBytes("US-ASCII") ++
      bytes(0xff, 0xff, 0xff, 0x7f) ++ Array.fill(16)(0.toByte))
    assert(parseWavHeader(huge).isEmpty)
    // a declared data chunk larger than the buffer is truncated, not served
    val cut = riff("data".getBytes("US-ASCII") ++
      bytes(0xff, 0, 0, 0) ++ Array.fill(8)(0.toByte))
    assert(parseWavHeader(cut).isEmpty)
  }

  test("GIF/BMP round-trip, truncation, and corruption rejection") {
    val gif = gifHeader(1024, 768, bitsPerPrimary = 5)
    assert(parseImageHeader(gif) ===
      Some(MediaHeaders.ImageHeader("image/gif", 1024, 768, 1, 5)))
    val bmp = bmpHeader(321, 123, 16)
    assert(parseImageHeader(bmp) ===
      Some(MediaHeaders.ImageHeader("image/bmp", 321, 123, 3, 8)))
    for (n <- 0 until gif.length) {
      val r = parseImageHeader(gif.take(n))
      assert(r.isEmpty, s"GIF truncated at $n parsed as $r")
    }
    for (n <- 0 until bmp.length) {
      val r = parseImageHeader(bmp.take(n))
      assert(r.isEmpty, s"BMP truncated at $n parsed as $r")
    }
    // zero-width GIF, obsolete 12-byte BMP core header, bad plane count
    val zw = gif.clone(); zw(6) = 0; zw(7) = 0
    assert(parseImageHeader(zw).isEmpty)
    val core = bmp.clone(); core(14) = 12
    assert(parseImageHeader(core).isEmpty)
    val planes = bmp.clone(); planes(26) = 2
    assert(parseImageHeader(planes).isEmpty)
  }
}
