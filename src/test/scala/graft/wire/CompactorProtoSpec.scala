package graft.wire

import graft.wire.CompactorProto._
import graft.wire.ProtoWire.{Reader, Writer}
import org.scalatest.funsuite.AnyFunSuite

/** Message codecs for the compactor proto surface: round-trips over the
  * full message tree, golden bytes for a hand-encodable message, and the
  * proto3 tolerance rules (unknown fields, unpacked repeats, reordering).
  */
class CompactorProtoSpec extends AnyFunSuite {

  import WireLiteral._
  import WirePrimitiveKind._

  private val fullSchema = WireSchema(3L, Seq(
    WireField(1, "id", required = true, WirePrimitive(KLong)),
    WireField(2, "name", required = false, WirePrimitive(KString)),
    WireField(3, "price", required = false, WirePrimitive(KDecimal(38, 10))),
    WireField(4, "blob", required = false, WirePrimitive(KFixed(16L))),
    WireField(5, "tags", required = false,
      WireListType(WireField(6, "element", required = true, WirePrimitive(KString)))),
    WireField(7, "attrs", required = false, WireMapType(
      WireField(8, "key", required = true, WirePrimitive(KString)),
      WireField(9, "value", required = false, WirePrimitive(KInt)))),
    WireField(10, "address", required = false, WireStructType(Seq(
      WireField(11, "street", required = false, WirePrimitive(KString)),
      WireField(12, "zip", required = false, WirePrimitive(KInt))))),
    WireField(13, "ts", required = false, WirePrimitive(KTimestamptz)),
    WireField(14, "d", required = false, WirePrimitive(KDate)),
    WireField(15, "u", required = false, WirePrimitive(KUuid))))

  private val request = WireRewriteRequest(
    tasks = Seq(
      WireScanTask(0L, 1024L, 100L, "s3://b/data-1.parquet", ContentData,
        FormatParquet, Seq(1, 2, 3), 7L, Nil),
      WireScanTask(0L, 2048L, 10L, "s3://b/posdel-1.parquet",
        ContentPositionDeletes, FormatParquet, Nil, 8L, Nil),
      WireScanTask(0L, 512L, 5L, "s3://b/eqdel-1.parquet",
        ContentEqualityDeletes, FormatParquet, Nil, 9L, Seq(1, 2)),
      WireScanTask(0L, 99L, 4L, "s3://b/data-2.avro", ContentData,
        FormatAvro, Seq(1), 6L, Nil)),
    config = Map("target_partitions" -> "4", "cluster_by" -> "id"),
    dirPath = "s3://b/out",
    fileIo = Some(WireFileIo("s3://b", Map("s3.region" -> "us-east-1",
      "s3.access-key-id" -> "k"))),
    schema = Some(fullSchema),
    partitionSpec = Some(WirePartitionSpec(2, Seq(
      WirePartitionField(13, Some(1000), "ts_day", WireTransform.Day),
      WirePartitionField(1, Some(1001), "id_bucket", WireTransform.Bucket(16)),
      WirePartitionField(2, None, "name_tr", WireTransform.Truncate(4)),
      WirePartitionField(1, Some(1002), "nothing", WireTransform.Void)))))

  test("RewriteFilesRequest round-trips through the wire") {
    val decoded = decodeRewriteRequest(encodeRewriteRequest(request))
    assert(decoded == request)
  }

  test("golden bytes: FileScanTaskDescriptor matches hand-assembled encoding") {
    val t = WireScanTask(0L, 300L, 2L, "f.parquet", ContentPositionDeletes,
      FormatParquet, Seq(4, 5), -3L, Nil)
    val w = new Writer
    encodeScanTask(w, t)
    val expected: Seq[Int] =
      Seq(0x10, 0xac, 0x02) ++ // field 2 (length) varint 300
        Seq(0x18, 0x02) ++ // field 3 (record_count) varint 2
        Seq(0x22, 0x09) ++ "f.parquet".getBytes.map(_ & 0xff).toSeq ++ // field 4
        Seq(0x28, 0x01) ++ // field 5 content = POSITION_DELETES
        Seq(0x30, 0x02) ++ // field 6 format = PARQUET
        Seq(0x3a, 0x02, 0x04, 0x05) ++ // field 7 packed [4, 5]
        // field 8 sequence_number = -3 (int64 → 10-byte two's complement)
        Seq(0x40, 0xfd, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01)
    assert(w.toBytes.map(_ & 0xff).toSeq == expected)
    assert(decodeScanTask(new Reader(w.toBytes)) == t)
  }

  test("literal tree round-trips, including int128/uint128 and sentinels") {
    val big = BigInt("170141183460469231731687303715884105727") // i128 max
    val lits: Seq[WireLiteral] = Seq(
      PBool(true), PBool(false), PInt(-42), PLong(Long.MinValue),
      PFloat(1.5f), PDouble(-2.25), PString(""), PString("héllo"),
      PBinary(Seq[Byte](0, 1, 2, -1)),
      PInt128(big), PInt128(-big - 1), PInt128(BigInt(-1)), PInt128(BigInt(0)),
      PUInt128(BigInt(2).pow(128) - 1), PUInt128(BigInt(7)),
      AboveMax, BelowMin,
      LStruct(Seq(Some(PInt(1)), None, Some(PString("x")))),
      LList(Seq(Some(PLong(5L)), None)),
      LMap(Seq(PString("k1") -> Some(PInt(1)), PString("k2") -> None)),
      LStruct(Seq(Some(LMap(Seq(PInt(3) -> Some(LList(Seq(Some(PBool(true)))))))))))
    for (lit <- lits) {
      // encodeLiteral writes the Literal MESSAGE content (its oneof field);
      // decodeLiteral consumes the same framing
      val w = new Writer
      encodeLiteral(w, lit)
      assert(decodeLiteral(new Reader(w.toBytes)) == lit, s"round-trip of $lit")
    }
  }

  test("int128 literals are exactly 16 bytes big-endian") {
    val w = new Writer
    encodePrimitiveLiteral(w, PInt128(BigInt(-1)))
    // field 8, LEN 16, then 16 bytes of 0xff
    assert(w.toBytes.map(_ & 0xff).toSeq == Seq(0x42, 0x10) ++ Seq.fill(16)(0xff))
    val w2 = new Writer
    encodePrimitiveLiteral(w2, PUInt128(BigInt(256)))
    assert(w2.toBytes.map(_ & 0xff).toSeq ==
      Seq(0x4a, 0x10) ++ Seq.fill(14)(0x00) ++ Seq(0x01, 0x00))
  }

  test("sentinel enum values: ABOVE_MAX=0, BELOW_MIN=1 on field 10") {
    val w = new Writer
    encodePrimitiveLiteral(w, AboveMax)
    assert(w.toBytes.map(_ & 0xff).toSeq == Seq(0x50, 0x00))
    val w2 = new Writer
    encodePrimitiveLiteral(w2, BelowMin)
    assert(w2.toBytes.map(_ & 0xff).toSeq == Seq(0x50, 0x01))
  }

  test("DataFile and response round-trip with all stat maps") {
    val df = WireDataFile(
      content = ContentData,
      path = "/out/part-0.parquet",
      format = FormatParquet,
      partition = Seq(Some(PInt(2024)), None),
      recordCount = 1000L,
      fileSizeBytes = 123456L,
      columnSizes = Map(1 -> 100L, 2 -> 200L),
      valueCounts = Map(1 -> 1000L),
      nullValueCounts = Map(2 -> 5L),
      nanValueCounts = Map(3 -> 0L),
      lowerBounds = Map(1 -> Seq[Byte](1, 0, 0, 0)),
      upperBounds = Map(1 -> Seq[Byte](-1, 3, 0, 0)),
      keyMetadata = Some(Seq[Byte](9, 9)),
      splitOffsets = Seq(0L, 4096L),
      equalityIds = Seq(1, 2),
      sortOrderId = Some(0),
      partitionSpecId = 2)
    val resp = WireRewriteResponse(Seq(df), Some(WireStat(3L, 1L, 999L, 0L)))
    assert(decodeRewriteResponse(encodeRewriteResponse(resp)) == resp)
  }

  test("RewriteFilesStat uses field numbers 2-5 (field 1 unused)") {
    val w = new Writer
    encodeStat(w, WireStat(1L, 2L, 3L, 4L))
    assert(w.toBytes.map(_ & 0xff).toSeq ==
      Seq(0x10, 0x01, 0x18, 0x02, 0x20, 0x03, 0x28, 0x04))
  }

  test("decoder tolerates unknown fields and field reordering") {
    // hand-build a scan task with fields out of order plus an unknown field
    val w = new Writer
    w.writeVarint(8, 11L) // sequence_number first
    w.writeString(4, "x.parquet")
    w.writeString(99, "future extension") // unknown
    w.writeVarint(6, FormatOrc.toLong)
    val t = decodeScanTask(new Reader(w.toBytes))
    assert(t == WireScanTask(0L, 0L, 0L, "x.parquet", ContentData, FormatOrc,
      Nil, 11L, Nil))
  }

  test("unpacked repeated project_field_ids decode (proto2-style writers)") {
    val w = new Writer
    w.writeString(4, "y.parquet")
    w.writeVarint(7, 1L, emitDefault = true)
    w.writeVarint(7, 2L, emitDefault = true)
    w.writeVarint(7, 3L, emitDefault = true)
    assert(decodeScanTask(new Reader(w.toBytes)).projectFieldIds == Seq(1, 2, 3))
  }

  test("schema descriptor with nested types round-trips") {
    val w = new Writer
    encodeSchema(w, fullSchema)
    assert(decodeSchema(new Reader(w.toBytes)) == fullSchema)
  }

  test("missing oneof variants fail loudly, like the reference decoder") {
    assert(intercept[IllegalArgumentException] {
      decodeField(new Reader(Array[Byte](0x08, 0x01))) // id only, no field_type
    }.getMessage.contains("field_type is null"))
    assert(intercept[IllegalArgumentException] {
      decodeTransform(new Reader(Array.empty[Byte]))
    }.getMessage.contains("Transform params is None"))
    assert(intercept[IllegalArgumentException] {
      decodePrimitiveType(new Reader(Array.empty[Byte]))
    }.getMessage.contains("kind is null"))
  }

  test("echo round-trips") {
    assert(decodeEcho(encodeEcho("ping")) == "ping")
    assert(decodeEcho(encodeEcho("")) == "")
  }
}
