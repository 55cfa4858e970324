package graft.wire

import graft.wire.ProtoWire.{Reader, Writer, WireI32, WireI64, WireLen, WireVarint}
import scala.collection.mutable

/** Message models + codecs for the reference's compactor wire surface
  * (`core/proto/iceberg.proto`, all 226 lines of it): RewriteFilesRequest /
  * Response, schema + partition-spec descriptors, file-scan tasks, and the
  * complete literal tree — including Int128/UInt128 decimal backing and the
  * AboveMax/BelowMin out-of-range sentinels (`core/src/parser/proto.rs:
  * 445-546`). Field numbers below ARE the protocol; every message has both
  * encode and decode so either side of the RPC can be exercised and tests
  * can round-trip golden byte vectors produced by any proto3 runtime.
  *
  * Decoding is permissive exactly where proto3 requires it: unknown fields
  * are skipped, repeated scalars accept packed and unpacked encodings,
  * fields may arrive in any order, and last-one-wins applies to duplicate
  * scalar/oneof occurrences.
  */
object CompactorProto {

  // ---- enums (proto values are the contract) ----------------------------

  /** DataContentType */
  final val ContentData = 0
  final val ContentPositionDeletes = 1
  final val ContentEqualityDeletes = 2

  /** DataFileFormat */
  final val FormatAvro = 0
  final val FormatOrc = 1
  final val FormatParquet = 2

  // ---- Transform ---------------------------------------------------------

  sealed trait WireTransform
  object WireTransform {
    case object Identity extends WireTransform
    case object Year extends WireTransform
    case object Month extends WireTransform
    case object Day extends WireTransform
    case object Hour extends WireTransform
    case object Void extends WireTransform
    case object Unknown extends WireTransform
    final case class Bucket(n: Int) extends WireTransform
    final case class Truncate(width: Int) extends WireTransform

    private[wire] val enumOf: Map[WireTransform, Int] = Map(
      Identity -> 0, Year -> 1, Month -> 2, Day -> 3, Hour -> 4, Void -> 5,
      Unknown -> 6)
    private[wire] val byEnum: Map[Int, WireTransform] = enumOf.map(_.swap)
  }

  def encodeTransform(w: Writer, t: WireTransform): Unit = t match {
    case WireTransform.Bucket(n) => w.writeVarint(2, n.toLong, emitDefault = true)
    case WireTransform.Truncate(n) => w.writeVarint(3, n.toLong, emitDefault = true)
    case other => w.writeVarint(1, WireTransform.enumOf(other).toLong, emitDefault = true)
  }

  def decodeTransform(r: Reader): WireTransform = {
    var out: Option[WireTransform] = None
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) =>
        val e = r.readVarint().toInt
        out = Some(WireTransform.byEnum.getOrElse(e, WireTransform.Unknown))
      case (2, WireVarint) => out = Some(WireTransform.Bucket(r.readVarint().toInt))
      case (3, WireVarint) => out = Some(WireTransform.Truncate(r.readVarint().toInt))
      case (_, wire) => r.skip(wire)
    }
    out.getOrElse(throw new IllegalArgumentException("Transform params is None"))
  }

  // ---- PartitionField / PartitionSpec ------------------------------------

  final case class WirePartitionField(
      sourceId: Int,
      fieldId: Option[Int],
      name: String,
      transform: WireTransform)

  final case class WirePartitionSpec(specId: Int, fields: Seq[WirePartitionField])

  def encodePartitionField(w: Writer, f: WirePartitionField): Unit = {
    w.writeVarint(1, f.sourceId.toLong)
    f.fieldId.foreach(id => w.writeVarint(2, id.toLong, emitDefault = true))
    w.writeString(3, f.name)
    w.writeMessage(4, encodeTransform(_, f.transform))
  }

  def decodePartitionField(r: Reader): WirePartitionField = {
    var sourceId = 0; var fieldId: Option[Int] = None; var name = ""
    var transform: Option[WireTransform] = None
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) => sourceId = r.readVarint().toInt
      case (2, WireVarint) => fieldId = Some(r.readVarint().toInt)
      case (3, WireLen) => name = r.readString()
      case (4, WireLen) => transform = Some(decodeTransform(r.readSlice()))
      case (_, wire) => r.skip(wire)
    }
    WirePartitionField(sourceId, fieldId, name,
      transform.getOrElse(throw new IllegalArgumentException(
        "cannot find transform from partition_field")))
  }

  def encodePartitionSpec(w: Writer, s: WirePartitionSpec): Unit = {
    w.writeVarint(1, s.specId.toLong)
    s.fields.foreach(f => w.writeMessage(2, encodePartitionField(_, f)))
  }

  def decodePartitionSpec(r: Reader): WirePartitionSpec = {
    var specId = 0
    val fields = mutable.Buffer[WirePartitionField]()
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) => specId = r.readVarint().toInt
      case (2, WireLen) => fields += decodePartitionField(r.readSlice())
      case (_, wire) => r.skip(wire)
    }
    WirePartitionSpec(specId, fields.toSeq)
  }

  // ---- type tree ---------------------------------------------------------

  sealed trait WirePrimitiveKind
  object WirePrimitiveKind {
    case object KBoolean extends WirePrimitiveKind
    case object KInt extends WirePrimitiveKind
    case object KLong extends WirePrimitiveKind
    case object KFloat extends WirePrimitiveKind
    case object KDouble extends WirePrimitiveKind
    case object KDate extends WirePrimitiveKind
    case object KTime extends WirePrimitiveKind
    case object KTimestamp extends WirePrimitiveKind
    case object KTimestamptz extends WirePrimitiveKind
    case object KTimestampNs extends WirePrimitiveKind
    case object KTimestamptzNs extends WirePrimitiveKind
    case object KString extends WirePrimitiveKind
    case object KUuid extends WirePrimitiveKind
    case object KBinary extends WirePrimitiveKind
    final case class KDecimal(precision: Int, scale: Int) extends WirePrimitiveKind
    final case class KFixed(length: Long) extends WirePrimitiveKind

    private[wire] val enumOf: Map[WirePrimitiveKind, Int] = Map(
      KBoolean -> 0, KInt -> 1, KLong -> 2, KFloat -> 3, KDouble -> 4,
      KDate -> 5, KTime -> 6, KTimestamp -> 7, KTimestamptz -> 8,
      KTimestampNs -> 9, KTimestamptzNs -> 10, KString -> 11, KUuid -> 12,
      KBinary -> 13)
    private[wire] val byEnum: Map[Int, WirePrimitiveKind] = enumOf.map(_.swap)
  }

  sealed trait WireFieldType
  final case class WirePrimitive(kind: WirePrimitiveKind) extends WireFieldType
  final case class WireStructType(fields: Seq[WireField]) extends WireFieldType
  final case class WireListType(element: WireField) extends WireFieldType
  final case class WireMapType(key: WireField, value: WireField) extends WireFieldType

  /** NestedFieldDescriptor */
  final case class WireField(
      id: Int,
      name: String,
      required: Boolean,
      fieldType: WireFieldType)

  /** SchemaDescriptor */
  final case class WireSchema(schemaId: Long, fields: Seq[WireField])

  def encodePrimitiveType(w: Writer, p: WirePrimitive): Unit = p.kind match {
    case WirePrimitiveKind.KDecimal(precision, scale) =>
      w.writeMessage(2, { inner =>
        inner.writeVarint(1, precision.toLong)
        inner.writeVarint(2, scale.toLong)
      })
    case WirePrimitiveKind.KFixed(len) => w.writeVarint(3, len, emitDefault = true)
    case kind => w.writeVarint(1, WirePrimitiveKind.enumOf(kind).toLong, emitDefault = true)
  }

  def decodePrimitiveType(r: Reader): WirePrimitive = {
    var kind: Option[WirePrimitiveKind] = None
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) =>
        val e = r.readVarint().toInt
        kind = Some(WirePrimitiveKind.byEnum.getOrElse(e,
          throw new IllegalArgumentException(s"unknown primitive kind enum $e")))
      case (2, WireLen) =>
        val s = r.readSlice()
        var precision = 0; var scale = 0
        while (s.hasMore) s.readTag() match {
          case (1, WireVarint) => precision = s.readVarint().toInt
          case (2, WireVarint) => scale = s.readVarint().toInt
          case (_, wire) => s.skip(wire)
        }
        kind = Some(WirePrimitiveKind.KDecimal(precision, scale))
      case (3, WireVarint) => kind = Some(WirePrimitiveKind.KFixed(r.readVarint()))
      case (_, wire) => r.skip(wire)
    }
    WirePrimitive(kind.getOrElse(throw new IllegalArgumentException("kind is null")))
  }

  def encodeField(w: Writer, f: WireField): Unit = {
    w.writeVarint(1, f.id.toLong)
    w.writeString(2, f.name)
    w.writeBool(3, f.required)
    f.fieldType match {
      case p: WirePrimitive => w.writeMessage(4, encodePrimitiveType(_, p))
      case WireStructType(fields) =>
        w.writeMessage(5, inner => fields.foreach(x => inner.writeMessage(1, encodeField(_, x))))
      case WireListType(element) => w.writeMessage(6, encodeField(_, element))
      case WireMapType(key, value) =>
        w.writeMessage(7, { inner =>
          inner.writeMessage(1, encodeField(_, key))
          inner.writeMessage(2, encodeField(_, value))
        })
    }
  }

  def decodeField(r: Reader): WireField = {
    var id = 0; var name = ""; var required = false
    var fieldType: Option[WireFieldType] = None
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) => id = r.readVarint().toInt
      case (2, WireLen) => name = r.readString()
      case (3, WireVarint) => required = r.readVarint() != 0L
      case (4, WireLen) => fieldType = Some(decodePrimitiveType(r.readSlice()))
      case (5, WireLen) =>
        val s = r.readSlice()
        val fields = mutable.Buffer[WireField]()
        while (s.hasMore) s.readTag() match {
          case (1, WireLen) => fields += decodeField(s.readSlice())
          case (_, wire) => s.skip(wire)
        }
        fieldType = Some(WireStructType(fields.toSeq))
      case (6, WireLen) => fieldType = Some(WireListType(decodeField(r.readSlice())))
      case (7, WireLen) =>
        val s = r.readSlice()
        var key: Option[WireField] = None; var value: Option[WireField] = None
        while (s.hasMore) s.readTag() match {
          case (1, WireLen) => key = Some(decodeField(s.readSlice()))
          case (2, WireLen) => value = Some(decodeField(s.readSlice()))
          case (_, wire) => s.skip(wire)
        }
        fieldType = Some(WireMapType(
          key.getOrElse(throw new IllegalArgumentException("can't find key_field in map")),
          value.getOrElse(throw new IllegalArgumentException("can't find value_field in map"))))
      case (_, wire) => r.skip(wire)
    }
    WireField(id, name, required,
      fieldType.getOrElse(throw new IllegalArgumentException("field_type is null")))
  }

  def encodeSchema(w: Writer, s: WireSchema): Unit = {
    w.writeVarint(1, s.schemaId)
    s.fields.foreach(f => w.writeMessage(2, encodeField(_, f)))
  }

  def decodeSchema(r: Reader): WireSchema = {
    var schemaId = 0L
    val fields = mutable.Buffer[WireField]()
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) => schemaId = r.readVarint()
      case (2, WireLen) => fields += decodeField(r.readSlice())
      case (_, wire) => r.skip(wire)
    }
    WireSchema(schemaId, fields.toSeq)
  }

  // ---- FileScanTaskDescriptor / FileIoBuilder / RewriteFilesRequest ------

  final case class WireScanTask(
      start: Long,
      length: Long,
      recordCount: Long,
      path: String,
      content: Int,
      format: Int,
      projectFieldIds: Seq[Int],
      sequenceNumber: Long,
      equalityIds: Seq[Int])

  final case class WireFileIo(scheme: String, props: Map[String, String])

  final case class WireRewriteRequest(
      tasks: Seq[WireScanTask],
      config: Map[String, String],
      dirPath: String,
      fileIo: Option[WireFileIo],
      schema: Option[WireSchema],
      partitionSpec: Option[WirePartitionSpec])

  def encodeScanTask(w: Writer, t: WireScanTask): Unit = {
    w.writeVarint(1, t.start)
    w.writeVarint(2, t.length)
    w.writeVarint(3, t.recordCount)
    w.writeString(4, t.path)
    w.writeVarint(5, t.content.toLong)
    w.writeVarint(6, t.format.toLong)
    w.writePackedVarints(7, t.projectFieldIds.map(_.toLong))
    w.writeVarint(8, t.sequenceNumber)
    w.writePackedVarints(9, t.equalityIds.map(_.toLong))
  }

  def decodeScanTask(r: Reader): WireScanTask = {
    var start = 0L; var length = 0L; var recordCount = 0L; var path = ""
    var content = 0; var format = 0; var seq = 0L
    val project = mutable.Buffer[Long](); val eqIds = mutable.Buffer[Long]()
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) => start = r.readVarint()
      case (2, WireVarint) => length = r.readVarint()
      case (3, WireVarint) => recordCount = r.readVarint()
      case (4, WireLen) => path = r.readString()
      case (5, WireVarint) => content = r.readVarint().toInt
      case (6, WireVarint) => format = r.readVarint().toInt
      case (7, wire) => r.readRepeatedVarint(wire, project)
      case (8, WireVarint) => seq = r.readVarint()
      case (9, wire) => r.readRepeatedVarint(wire, eqIds)
      case (_, wire) => r.skip(wire)
    }
    WireScanTask(start, length, recordCount, path, content, format,
      project.map(_.toInt).toSeq, seq, eqIds.map(_.toInt).toSeq)
  }

  private def encodeStringMapEntry(w: Writer, field: Int, k: String, v: String): Unit =
    w.writeMessage(field, { inner =>
      inner.writeString(1, k)
      inner.writeString(2, v)
    })

  private def decodeStringMapEntry(r: Reader): (String, String) = {
    var k = ""; var v = ""
    while (r.hasMore) r.readTag() match {
      case (1, WireLen) => k = r.readString()
      case (2, WireLen) => v = r.readString()
      case (_, wire) => r.skip(wire)
    }
    (k, v)
  }

  def encodeFileIo(w: Writer, io: WireFileIo): Unit = {
    w.writeString(1, io.scheme)
    io.props.toSeq.sortBy(_._1).foreach { case (k, v) => encodeStringMapEntry(w, 2, k, v) }
  }

  def decodeFileIo(r: Reader): WireFileIo = {
    var scheme = ""
    val props = mutable.LinkedHashMap[String, String]()
    while (r.hasMore) r.readTag() match {
      case (1, WireLen) => scheme = r.readString()
      case (2, WireLen) => props += decodeStringMapEntry(r.readSlice())
      case (_, wire) => r.skip(wire)
    }
    WireFileIo(scheme, props.toMap)
  }

  def encodeRewriteRequest(req: WireRewriteRequest): Array[Byte] = {
    val w = new Writer
    req.tasks.foreach(t => w.writeMessage(1, encodeScanTask(_, t)))
    req.config.toSeq.sortBy(_._1).foreach { case (k, v) => encodeStringMapEntry(w, 2, k, v) }
    w.writeString(3, req.dirPath)
    req.fileIo.foreach(io => w.writeMessage(4, encodeFileIo(_, io)))
    req.schema.foreach(s => w.writeMessage(5, encodeSchema(_, s)))
    req.partitionSpec.foreach(s => w.writeMessage(6, encodePartitionSpec(_, s)))
    w.toBytes
  }

  def decodeRewriteRequest(bytes: Array[Byte]): WireRewriteRequest = {
    val r = new Reader(bytes)
    val tasks = mutable.Buffer[WireScanTask]()
    val config = mutable.LinkedHashMap[String, String]()
    var dirPath = ""
    var fileIo: Option[WireFileIo] = None
    var schema: Option[WireSchema] = None
    var spec: Option[WirePartitionSpec] = None
    while (r.hasMore) r.readTag() match {
      case (1, WireLen) => tasks += decodeScanTask(r.readSlice())
      case (2, WireLen) => config += decodeStringMapEntry(r.readSlice())
      case (3, WireLen) => dirPath = r.readString()
      case (4, WireLen) => fileIo = Some(decodeFileIo(r.readSlice()))
      case (5, WireLen) => schema = Some(decodeSchema(r.readSlice()))
      case (6, WireLen) => spec = Some(decodePartitionSpec(r.readSlice()))
      case (_, wire) => r.skip(wire)
    }
    WireRewriteRequest(tasks.toSeq, config.toMap, dirPath, fileIo, schema, spec)
  }

  // ---- literal tree ------------------------------------------------------

  sealed trait WireLiteral
  object WireLiteral {
    final case class PBool(v: Boolean) extends WireLiteral
    final case class PInt(v: Int) extends WireLiteral
    final case class PLong(v: Long) extends WireLiteral
    final case class PFloat(v: Float) extends WireLiteral
    final case class PDouble(v: Double) extends WireLiteral
    final case class PString(v: String) extends WireLiteral
    final case class PBinary(v: Seq[Byte]) extends WireLiteral
    /** 16-byte big-endian two's complement (decimal unscaled values beyond
      * int64 — the reference backs wide decimals with i128).
      */
    final case class PInt128(v: BigInt) extends WireLiteral
    /** 16-byte big-endian, unsigned. */
    final case class PUInt128(v: BigInt) extends WireLiteral
    /** Out-of-range sentinels: a bound that sits above/below the type's
      * representable range (proto enum ABOVE_MAX=0 / BELOW_MIN=1).
      */
    case object AboveMax extends WireLiteral
    case object BelowMin extends WireLiteral
    final case class LStruct(inner: Seq[Option[WireLiteral]]) extends WireLiteral
    final case class LList(inner: Seq[Option[WireLiteral]]) extends WireLiteral
    final case class LMap(entries: Seq[(WireLiteral, Option[WireLiteral])]) extends WireLiteral
  }

  import WireLiteral._

  private def toBe16(v: BigInt, signed: Boolean): Array[Byte] = {
    val raw = v.underlying.toByteArray // minimal two's complement, BE
    require(raw.length <= 16 || (raw.length == 17 && !signed && raw(0) == 0),
      s"value $v does not fit in 128 bits")
    val out = Array.fill[Byte](16)(if (signed && v < 0) (-1).toByte else 0.toByte)
    val src = if (raw.length == 17) raw.drop(1) else raw
    System.arraycopy(src, 0, out, 16 - src.length, src.length)
    out
  }

  def encodePrimitiveLiteral(w: Writer, lit: WireLiteral): Unit = lit match {
    case PBool(v) => w.writeVarint(1, if (v) 1L else 0L, emitDefault = true)
    case PInt(v) => w.writeVarint(2, v.toLong, emitDefault = true)
    case PLong(v) => w.writeVarint(3, v, emitDefault = true)
    case PFloat(v) => w.writeFloatAlways(4, v)
    case PDouble(v) => w.writeDoubleAlways(5, v)
    case PString(v) => w.writeBytes(6, v.getBytes(java.nio.charset.StandardCharsets.UTF_8), emitEmpty = true)
    case PBinary(v) => w.writeBytes(7, v.toArray, emitEmpty = true)
    case PInt128(v) => w.writeBytes(8, toBe16(v, signed = true), emitEmpty = true)
    case PUInt128(v) => w.writeBytes(9, toBe16(v, signed = false), emitEmpty = true)
    case AboveMax => w.writeVarint(10, 0L, emitDefault = true)
    case BelowMin => w.writeVarint(10, 1L, emitDefault = true)
    case other => throw new IllegalArgumentException(s"not a primitive literal: $other")
  }

  def decodePrimitiveLiteral(r: Reader): WireLiteral = {
    var out: Option[WireLiteral] = None
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) => out = Some(PBool(r.readVarint() != 0L))
      case (2, WireVarint) => out = Some(PInt(r.readVarint().toInt))
      case (3, WireVarint) => out = Some(PLong(r.readVarint()))
      case (4, WireI32) => out = Some(PFloat(java.lang.Float.intBitsToFloat(r.readFixed32())))
      case (5, WireI64) => out = Some(PDouble(java.lang.Double.longBitsToDouble(r.readFixed64())))
      case (6, WireLen) => out = Some(PString(r.readString()))
      case (7, WireLen) => out = Some(PBinary(r.readBytes().toSeq))
      case (8, WireLen) =>
        val b = r.readBytes()
        require(b.length == 16, s"int128 literal must be 16 bytes, got ${b.length}")
        out = Some(PInt128(BigInt(new java.math.BigInteger(b))))
      case (9, WireLen) =>
        val b = r.readBytes()
        require(b.length == 16, s"uint128 literal must be 16 bytes, got ${b.length}")
        out = Some(PUInt128(BigInt(new java.math.BigInteger(1, b))))
      case (10, WireVarint) =>
        out = Some(if (r.readVarint() == 0L) AboveMax else BelowMin)
      case (_, wire) => r.skip(wire)
    }
    out.getOrElse(throw new IllegalArgumentException("PrimitiveLiteral with no kind set"))
  }

  private def encodeOptionalLiteral(w: Writer, field: Int, v: Option[WireLiteral]): Unit =
    w.writeMessage(field, inner => v.foreach(l => inner.writeMessage(1, encodeLiteral(_, l))))

  private def decodeOptionalLiteral(r: Reader): Option[WireLiteral] = {
    var out: Option[WireLiteral] = None
    while (r.hasMore) r.readTag() match {
      case (1, WireLen) => out = Some(decodeLiteral(r.readSlice()))
      case (_, wire) => r.skip(wire)
    }
    out
  }

  private def encodeStructLiteral(w: Writer, inner: Seq[Option[WireLiteral]]): Unit =
    inner.foreach(v => encodeOptionalLiteral(w, 1, v))

  private def decodeStructLiteral(r: Reader): Seq[Option[WireLiteral]] = {
    val out = mutable.Buffer[Option[WireLiteral]]()
    while (r.hasMore) r.readTag() match {
      case (1, WireLen) => out += decodeOptionalLiteral(r.readSlice())
      case (_, wire) => r.skip(wire)
    }
    out.toSeq
  }

  def encodeLiteral(w: Writer, lit: WireLiteral): Unit = lit match {
    case LStruct(inner) => w.writeMessage(2, encodeStructLiteral(_, inner))
    case LList(inner) => w.writeMessage(3, encodeStructLiteral(_, inner))
    case LMap(entries) =>
      w.writeMessage(4, { inner =>
        entries.foreach { case (k, _) => inner.writeMessage(1, encodeLiteral(_, k)) }
        entries.foreach { case (_, v) => encodeOptionalLiteral(inner, 2, v) }
      })
    case primitive => w.writeMessage(1, encodePrimitiveLiteral(_, primitive))
  }

  def decodeLiteral(r: Reader): WireLiteral = {
    var out: Option[WireLiteral] = None
    while (r.hasMore) r.readTag() match {
      case (1, WireLen) => out = Some(decodePrimitiveLiteral(r.readSlice()))
      case (2, WireLen) => out = Some(LStruct(decodeStructLiteral(r.readSlice())))
      case (3, WireLen) => out = Some(LList(decodeStructLiteral(r.readSlice())))
      case (4, WireLen) =>
        val s = r.readSlice()
        val keys = mutable.Buffer[WireLiteral]()
        val values = mutable.Buffer[Option[WireLiteral]]()
        while (s.hasMore) s.readTag() match {
          case (1, WireLen) => keys += decodeLiteral(s.readSlice())
          case (2, WireLen) => values += decodeOptionalLiteral(s.readSlice())
          case (_, wire) => s.skip(wire)
        }
        require(keys.length == values.length,
          s"map literal arity mismatch: ${keys.length} keys, ${values.length} values")
        out = Some(LMap(keys.toSeq.zip(values.toSeq)))
      case (_, wire) => r.skip(wire)
    }
    out.getOrElse(throw new IllegalArgumentException("Literal with no variant set"))
  }

  // ---- DataFile / RewriteFilesStat / RewriteFilesResponse ----------------

  final case class WireDataFile(
      content: Int,
      path: String,
      format: Int,
      partition: Seq[Option[WireLiteral]],
      recordCount: Long,
      fileSizeBytes: Long,
      columnSizes: Map[Int, Long] = Map.empty,
      valueCounts: Map[Int, Long] = Map.empty,
      nullValueCounts: Map[Int, Long] = Map.empty,
      nanValueCounts: Map[Int, Long] = Map.empty,
      lowerBounds: Map[Int, Seq[Byte]] = Map.empty,
      upperBounds: Map[Int, Seq[Byte]] = Map.empty,
      keyMetadata: Option[Seq[Byte]] = None,
      splitOffsets: Seq[Long] = Nil,
      equalityIds: Seq[Int] = Nil,
      sortOrderId: Option[Int] = None,
      partitionSpecId: Int = 0)

  /** NOTE: proto field numbers start at 2 (field 1 is unused in the
    * reference's RewriteFilesStat).
    */
  final case class WireStat(
      rewrittenFilesCount: Long,
      addedFilesCount: Long,
      rewrittenBytes: Long,
      failedDataFilesCount: Long)

  final case class WireRewriteResponse(dataFiles: Seq[WireDataFile], stat: Option[WireStat])

  private def encodeIntLongMapEntry(w: Writer, field: Int, k: Int, v: Long): Unit =
    w.writeMessage(field, { inner =>
      inner.writeVarint(1, k.toLong)
      inner.writeVarint(2, v)
    })

  private def decodeIntLongMapEntry(r: Reader): (Int, Long) = {
    var k = 0; var v = 0L
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) => k = r.readVarint().toInt
      case (2, WireVarint) => v = r.readVarint()
      case (_, wire) => r.skip(wire)
    }
    (k, v)
  }

  private def encodeIntBytesMapEntry(w: Writer, field: Int, k: Int, v: Seq[Byte]): Unit =
    w.writeMessage(field, { inner =>
      inner.writeVarint(1, k.toLong)
      inner.writeBytes(2, v.toArray, emitEmpty = true)
    })

  private def decodeIntBytesMapEntry(r: Reader): (Int, Seq[Byte]) = {
    var k = 0; var v: Seq[Byte] = Nil
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) => k = r.readVarint().toInt
      case (2, WireLen) => v = r.readBytes().toSeq
      case (_, wire) => r.skip(wire)
    }
    (k, v)
  }

  def encodeDataFile(w: Writer, f: WireDataFile): Unit = {
    w.writeVarint(1, f.content.toLong)
    w.writeString(2, f.path)
    w.writeVarint(3, f.format.toLong)
    w.writeMessage(4, encodeStructLiteral(_, f.partition))
    w.writeVarint(5, f.recordCount)
    w.writeVarint(6, f.fileSizeBytes)
    f.columnSizes.toSeq.sortBy(_._1).foreach { case (k, v) => encodeIntLongMapEntry(w, 7, k, v) }
    f.valueCounts.toSeq.sortBy(_._1).foreach { case (k, v) => encodeIntLongMapEntry(w, 8, k, v) }
    f.nullValueCounts.toSeq.sortBy(_._1).foreach { case (k, v) => encodeIntLongMapEntry(w, 9, k, v) }
    f.nanValueCounts.toSeq.sortBy(_._1).foreach { case (k, v) => encodeIntLongMapEntry(w, 10, k, v) }
    f.lowerBounds.toSeq.sortBy(_._1).foreach { case (k, v) => encodeIntBytesMapEntry(w, 11, k, v) }
    f.upperBounds.toSeq.sortBy(_._1).foreach { case (k, v) => encodeIntBytesMapEntry(w, 12, k, v) }
    f.keyMetadata.foreach(b => w.writeBytes(13, b.toArray, emitEmpty = true))
    w.writePackedVarints(14, f.splitOffsets)
    w.writePackedVarints(15, f.equalityIds.map(_.toLong))
    f.sortOrderId.foreach(id => w.writeVarint(16, id.toLong, emitDefault = true))
    w.writeVarint(17, f.partitionSpecId.toLong)
  }

  def decodeDataFile(r: Reader): WireDataFile = {
    var content = 0; var path = ""; var format = 0
    var partition: Seq[Option[WireLiteral]] = Nil
    var recordCount = 0L; var fileSize = 0L
    val colSizes = mutable.Map[Int, Long](); val valCounts = mutable.Map[Int, Long]()
    val nullCounts = mutable.Map[Int, Long](); val nanCounts = mutable.Map[Int, Long]()
    val lower = mutable.Map[Int, Seq[Byte]](); val upper = mutable.Map[Int, Seq[Byte]]()
    var keyMeta: Option[Seq[Byte]] = None
    val splits = mutable.Buffer[Long]()
    val eqIds = mutable.Buffer[Long]()
    var sortOrderId: Option[Int] = None
    var specId = 0
    while (r.hasMore) r.readTag() match {
      case (1, WireVarint) => content = r.readVarint().toInt
      case (2, WireLen) => path = r.readString()
      case (3, WireVarint) => format = r.readVarint().toInt
      case (4, WireLen) => partition = decodeStructLiteral(r.readSlice())
      case (5, WireVarint) => recordCount = r.readVarint()
      case (6, WireVarint) => fileSize = r.readVarint()
      case (7, WireLen) => colSizes += decodeIntLongMapEntry(r.readSlice())
      case (8, WireLen) => valCounts += decodeIntLongMapEntry(r.readSlice())
      case (9, WireLen) => nullCounts += decodeIntLongMapEntry(r.readSlice())
      case (10, WireLen) => nanCounts += decodeIntLongMapEntry(r.readSlice())
      case (11, WireLen) => lower += decodeIntBytesMapEntry(r.readSlice())
      case (12, WireLen) => upper += decodeIntBytesMapEntry(r.readSlice())
      case (13, WireLen) => keyMeta = Some(r.readBytes().toSeq)
      case (14, wire) => r.readRepeatedVarint(wire, splits)
      case (15, wire) => r.readRepeatedVarint(wire, eqIds)
      case (16, WireVarint) => sortOrderId = Some(r.readVarint().toInt)
      case (17, WireVarint) => specId = r.readVarint().toInt
      case (_, wire) => r.skip(wire)
    }
    WireDataFile(content, path, format, partition, recordCount, fileSize,
      colSizes.toMap, valCounts.toMap, nullCounts.toMap, nanCounts.toMap,
      lower.toMap, upper.toMap, keyMeta, splits.toSeq, eqIds.map(_.toInt).toSeq,
      sortOrderId, specId)
  }

  def encodeStat(w: Writer, s: WireStat): Unit = {
    w.writeVarint(2, s.rewrittenFilesCount)
    w.writeVarint(3, s.addedFilesCount)
    w.writeVarint(4, s.rewrittenBytes)
    w.writeVarint(5, s.failedDataFilesCount)
  }

  def decodeStat(r: Reader): WireStat = {
    var rewritten = 0L; var added = 0L; var bytes = 0L; var failed = 0L
    while (r.hasMore) r.readTag() match {
      case (2, WireVarint) => rewritten = r.readVarint()
      case (3, WireVarint) => added = r.readVarint()
      case (4, WireVarint) => bytes = r.readVarint()
      case (5, WireVarint) => failed = r.readVarint()
      case (_, wire) => r.skip(wire)
    }
    WireStat(rewritten, added, bytes, failed)
  }

  def encodeRewriteResponse(resp: WireRewriteResponse): Array[Byte] = {
    val w = new Writer
    resp.dataFiles.foreach(f => w.writeMessage(1, encodeDataFile(_, f)))
    resp.stat.foreach(s => w.writeMessage(2, encodeStat(_, s)))
    w.toBytes
  }

  def decodeRewriteResponse(bytes: Array[Byte]): WireRewriteResponse = {
    val r = new Reader(bytes)
    val files = mutable.Buffer[WireDataFile]()
    var stat: Option[WireStat] = None
    while (r.hasMore) r.readTag() match {
      case (1, WireLen) => files += decodeDataFile(r.readSlice())
      case (2, WireLen) => stat = Some(decodeStat(r.readSlice()))
      case (_, wire) => r.skip(wire)
    }
    WireRewriteResponse(files.toSeq, stat)
  }

  // ---- Echo --------------------------------------------------------------

  def encodeEcho(message: String): Array[Byte] = {
    val w = new Writer
    w.writeString(1, message)
    w.toBytes
  }

  def decodeEcho(bytes: Array[Byte]): String = {
    val r = new Reader(bytes)
    var msg = ""
    while (r.hasMore) r.readTag() match {
      case (1, WireLen) => msg = r.readString()
      case (_, wire) => r.skip(wire)
    }
    msg
  }
}
