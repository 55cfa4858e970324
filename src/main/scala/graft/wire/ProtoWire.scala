package graft.wire

import java.nio.charset.StandardCharsets

/** Protocol-buffers (proto3) wire-format primitives, hand-rolled — the repo
  * carries no protobuf runtime (zero added dependencies), and the wire
  * format itself is small: varints, two fixed widths, and length-delimited
  * chunks. Bytes produced/consumed here are interoperable with any proto3
  * runtime speaking the reference's `core/proto/iceberg.proto` (the
  * reference serializes with prost; field numbers and wire types are the
  * contract, not the runtime).
  *
  * Wire types used by that schema: VARINT (bool, int32, int64, uint32,
  * uint64, enums), I32 (float), I64 (double), LEN (string, bytes, nested
  * messages, packed repeated scalars, map entries).
  */
object ProtoWire {

  final val WireVarint = 0
  final val WireI64 = 1
  final val WireLen = 2
  final val WireI32 = 5

  /** Sequential reader over one message's bytes (or a LEN-delimited slice).
    * All multi-byte fixed-width values are little-endian per the spec.
    */
  final class Reader(val buf: Array[Byte], start: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    var pos: Int = start

    def hasMore: Boolean = pos < end

    private def byte(): Int = {
      if (pos >= end) throw new IllegalArgumentException(
        s"truncated message: read past $end")
      val b = buf(pos) & 0xff
      pos += 1
      b
    }

    /** Base-128 varint, up to 10 bytes (negative int32/int64 values encode
      * as the full two's-complement 64-bit pattern).
      */
    def readVarint(): Long = {
      var shift = 0
      var out = 0L
      var b = 0
      do {
        if (shift >= 70) throw new IllegalArgumentException("varint longer than 10 bytes")
        b = byte()
        out |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      out
    }

    def readFixed32(): Int = {
      val v = byte() | (byte() << 8) | (byte() << 16) | (byte() << 24)
      v
    }

    def readFixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (byte().toLong << (8 * i)); i += 1 }
      v
    }

    /** Tag = (fieldNumber << 3) | wireType. */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      val field = (t >>> 3).toInt
      val wire = (t & 7).toInt
      if (field == 0) throw new IllegalArgumentException("field number 0 is invalid")
      (field, wire)
    }

    /** LEN payload as a sub-reader (no copy). */
    def readSlice(): Reader = {
      val len = readVarint().toInt
      if (len < 0 || pos + len > end)
        throw new IllegalArgumentException(s"bad LEN $len at $pos (end $end)")
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }

    def readBytes(): Array[Byte] = {
      val s = readSlice()
      java.util.Arrays.copyOfRange(buf, s.pos, s.end)
    }

    def readString(): String = {
      val s = readSlice()
      new String(buf, s.pos, s.end - s.pos, StandardCharsets.UTF_8)
    }

    /** Packed-or-not repeated varint field: proto3 writers default to
      * packed for scalar numerics, but conforming readers must accept both
      * encodings (and mixes).
      */
    def readRepeatedVarint(wire: Int, into: scala.collection.mutable.Buffer[Long]): Unit =
      wire match {
        case WireLen =>
          val s = readSlice()
          while (s.hasMore) into += s.readVarint()
        case WireVarint => into += readVarint()
        case w => throw new IllegalArgumentException(s"repeated varint field with wire type $w")
      }

    /** Skip a field of any wire type (forward compatibility: unknown fields
      * must be ignored, not fatal).
      */
    def skip(wire: Int): Unit = wire match {
      case WireVarint => readVarint(); ()
      case WireI64 => if (pos + 8 > end) throw new IllegalArgumentException("truncated i64"); pos += 8
      case WireLen => readSlice(); ()
      case WireI32 => if (pos + 4 > end) throw new IllegalArgumentException("truncated i32"); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  /** Append-only writer. Nested messages are framed by building the inner
    * message in its own writer and emitting it as a LEN field.
    */
  final class Writer {
    private val out = new java.io.ByteArrayOutputStream(256)

    def toBytes: Array[Byte] = out.toByteArray

    def writeVarintRaw(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
    }

    private def tag(field: Int, wire: Int): Unit = writeVarintRaw((field.toLong << 3) | wire)

    /** Scalar varint field; proto3 omits default (0/false) values. */
    def writeVarint(field: Int, v: Long, emitDefault: Boolean = false): Unit =
      if (v != 0L || emitDefault) { tag(field, WireVarint); writeVarintRaw(v) }

    def writeBool(field: Int, v: Boolean): Unit = writeVarint(field, if (v) 1L else 0L)

    def writeFloat(field: Int, v: Float): Unit = {
      val bits = java.lang.Float.floatToIntBits(v)
      if (bits != 0) { tag(field, WireI32); writeFixed32Raw(bits) }
    }

    def writeFloatAlways(field: Int, v: Float): Unit = {
      tag(field, WireI32); writeFixed32Raw(java.lang.Float.floatToIntBits(v))
    }

    def writeDouble(field: Int, v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      if (bits != 0L) { tag(field, WireI64); writeFixed64Raw(bits) }
    }

    def writeDoubleAlways(field: Int, v: Double): Unit = {
      tag(field, WireI64); writeFixed64Raw(java.lang.Double.doubleToLongBits(v))
    }

    private def writeFixed32Raw(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }

    private def writeFixed64Raw(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }

    def writeBytes(field: Int, v: Array[Byte], emitEmpty: Boolean = false): Unit =
      if (v.nonEmpty || emitEmpty) {
        tag(field, WireLen); writeVarintRaw(v.length.toLong); out.write(v, 0, v.length)
      }

    def writeString(field: Int, v: String): Unit =
      writeBytes(field, v.getBytes(StandardCharsets.UTF_8))

    /** Nested message (always emitted, even when empty — presence of a
      * message field is meaningful in proto3).
      */
    def writeMessage(field: Int, body: Writer => Unit): Unit = {
      val inner = new Writer
      body(inner)
      val bytes = inner.toBytes
      tag(field, WireLen)
      writeVarintRaw(bytes.length.toLong)
      out.write(bytes, 0, bytes.length)
    }

    /** Packed repeated varints (the proto3 default encoding). */
    def writePackedVarints(field: Int, vs: Seq[Long]): Unit =
      if (vs.nonEmpty) {
        val inner = new Writer
        vs.foreach(inner.writeVarintRaw)
        writeBytes(field, inner.toBytes, emitEmpty = false)
      }
  }
}
