package graft.wire

import graft.wire.ProtoWire._
import org.scalatest.funsuite.AnyFunSuite

/** Wire-format primitives against golden byte vectors from the protobuf
  * encoding spec (protobuf.dev/programming-guides/encoding) — the encoding
  * is public and fixed, so these bytes are THE contract any proto3 runtime
  * (prost included) produces and accepts.
  */
class ProtoWireSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("varint golden vectors") {
    def enc(v: Long): Seq[Int] = {
      val w = new Writer; w.writeVarintRaw(v); w.toBytes.map(_ & 0xff).toSeq
    }
    assert(enc(0L) == Seq(0x00))
    assert(enc(1L) == Seq(0x01))
    assert(enc(127L) == Seq(0x7f))
    assert(enc(128L) == Seq(0x80, 0x01))
    assert(enc(150L) == Seq(0x96, 0x01)) // the spec's worked example
    assert(enc(300L) == Seq(0xac, 0x02))
    assert(enc(Long.MaxValue) == Seq(0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x7f))
    // negative int32/int64 values: full 64-bit two's complement, 10 bytes
    assert(enc(-1L) == Seq(0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01))
    assert(enc(-2L) == Seq(0xfe, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01))
  }

  test("varint round-trips at boundaries") {
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Int.MaxValue.toLong,
        Int.MinValue.toLong, Long.MaxValue, Long.MinValue, -1L)) {
      val w = new Writer; w.writeVarintRaw(v)
      assert(new Reader(w.toBytes).readVarint() == v, s"round-trip of $v")
    }
  }

  test("spec example: field 1 varint 150 encodes as 08 96 01") {
    val w = new Writer
    w.writeVarint(1, 150L)
    assert(w.toBytes.map(_ & 0xff).toSeq == Seq(0x08, 0x96, 0x01))
    val r = new Reader(w.toBytes)
    assert(r.readTag() == ((1, WireVarint)))
    assert(r.readVarint() == 150L)
  }

  test("spec example: field 2 string 'testing' encodes as 12 07 ...") {
    val w = new Writer
    w.writeString(2, "testing")
    assert(w.toBytes.map(_ & 0xff).toSeq ==
      Seq(0x12, 0x07, 0x74, 0x65, 0x73, 0x74, 0x69, 0x6e, 0x67))
  }

  test("proto3 default values are omitted; emitDefault forces presence") {
    val w = new Writer
    w.writeVarint(1, 0L)
    w.writeString(2, "")
    w.writeDouble(3, 0.0)
    assert(w.toBytes.isEmpty)
    val w2 = new Writer
    w2.writeVarint(1, 0L, emitDefault = true)
    assert(w2.toBytes.map(_ & 0xff).toSeq == Seq(0x08, 0x00))
  }

  test("fixed32/fixed64 are little-endian") {
    val w = new Writer
    w.writeFloatAlways(1, java.lang.Float.intBitsToFloat(0x01020304))
    assert(w.toBytes.map(_ & 0xff).toSeq == Seq(0x0d, 0x04, 0x03, 0x02, 0x01))
    val w2 = new Writer
    w2.writeDoubleAlways(1, java.lang.Double.longBitsToDouble(0x0102030405060708L))
    assert(w2.toBytes.map(_ & 0xff).toSeq ==
      Seq(0x09, 0x08, 0x07, 0x06, 0x05, 0x04, 0x03, 0x02, 0x01))
  }

  test("packed and unpacked repeated varints both decode") {
    // packed: field 7, LEN, [3, 270]
    val packed = bytes(0x3a, 0x03, 0x03, 0x8e, 0x02)
    val r1 = new Reader(packed)
    val buf1 = scala.collection.mutable.Buffer[Long]()
    val (f1, w1) = r1.readTag()
    assert(f1 == 7)
    r1.readRepeatedVarint(w1, buf1)
    assert(buf1.toSeq == Seq(3L, 270L))
    // unpacked: two VARINT occurrences of field 7
    val unpacked = bytes(0x38, 0x03, 0x38, 0x8e, 0x02)
    val r2 = new Reader(unpacked)
    val buf2 = scala.collection.mutable.Buffer[Long]()
    while (r2.hasMore) { val (_, w) = r2.readTag(); r2.readRepeatedVarint(w, buf2) }
    assert(buf2.toSeq == Seq(3L, 270L))
  }

  test("unknown fields of every wire type are skippable") {
    val w = new Writer
    w.writeVarint(90, 7L) // unknown varint
    w.writeFloatAlways(91, 1.5f) // unknown i32
    w.writeDoubleAlways(92, 2.5) // unknown i64
    w.writeString(93, "junk") // unknown len
    w.writeString(2, "keep")
    val r = new Reader(w.toBytes)
    var kept: Option[String] = None
    while (r.hasMore) r.readTag() match {
      case (2, WireLen) => kept = Some(r.readString())
      case (_, wire) => r.skip(wire)
    }
    assert(kept.contains("keep"))
  }

  test("truncated message fails loudly") {
    val w = new Writer
    w.writeString(1, "hello")
    val cut = w.toBytes.dropRight(2)
    val r = new Reader(cut)
    r.readTag()
    intercept[IllegalArgumentException](r.readSlice())
  }

  test("field number 0 is rejected") {
    intercept[IllegalArgumentException](new Reader(bytes(0x00, 0x01)).readTag())
  }
}
