package graft.wire

import graft.wire.CompactorProto._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style fuzz (seeded random message trees) pinning
  * encode→decode to the identity across the whole wire surface — varint
  * boundaries, deep literal nesting, optional-field presence, empty
  * strings/maps, negative and 128-bit extremes.
  */
class CompactorProtoPropertySpec extends AnyFunSuite {

  import WireLiteral._
  import WirePrimitiveKind._

  private val rnd = new scala.util.Random(20260812L)

  private def randLong(): Long = rnd.nextInt(5) match {
    case 0 => rnd.nextLong()
    case 1 => rnd.nextInt(3).toLong
    case 2 => Long.MaxValue
    case 3 => Long.MinValue
    case _ => -rnd.nextInt(1000).toLong
  }

  private def randString(): String = rnd.nextInt(4) match {
    case 0 => ""
    case 1 => "s3://bucket/" + rnd.alphanumeric.take(rnd.nextInt(20)).mkString
    case 2 => "üñïçödé-" + rnd.nextInt(100)
    case _ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString
  }

  private def randInt128(): BigInt = {
    val bits = rnd.nextInt(127)
    val v = BigInt(bits max 1, rnd)
    if (rnd.nextBoolean()) -v else v
  }

  private def randPrimitive(): WireLiteral = rnd.nextInt(11) match {
    case 0 => PBool(rnd.nextBoolean())
    case 1 => PInt(rnd.nextInt())
    case 2 => PLong(randLong())
    case 3 => PFloat(java.lang.Float.intBitsToFloat(rnd.nextInt()) match {
      case f if f.isNaN => 1.5f // NaN != NaN breaks equality; keep it simple
      case f => f
    })
    case 4 => PDouble(rnd.nextDouble() * (if (rnd.nextBoolean()) 1 else -1e18))
    case 5 => PString(randString())
    case 6 => PBinary(Seq.fill(rnd.nextInt(24))(rnd.nextInt().toByte))
    case 7 => PInt128(randInt128())
    case 8 => PUInt128(BigInt(rnd.nextInt(127) max 1, rnd))
    case 9 => AboveMax
    case _ => BelowMin
  }

  private def randLiteral(depth: Int): WireLiteral =
    if (depth <= 0) randPrimitive()
    else rnd.nextInt(6) match {
      case 0 => LStruct(Seq.fill(rnd.nextInt(4))(
        if (rnd.nextBoolean()) Some(randLiteral(depth - 1)) else None))
      case 1 => LList(Seq.fill(rnd.nextInt(4))(
        if (rnd.nextBoolean()) Some(randLiteral(depth - 1)) else None))
      case 2 => LMap(Seq.fill(rnd.nextInt(3))(
        randLiteral(depth - 1) ->
          (if (rnd.nextBoolean()) Some(randLiteral(depth - 1)) else None)))
      case _ => randPrimitive()
    }

  private def randKind(): WirePrimitiveKind = rnd.nextInt(16) match {
    case 0 => KBoolean
    case 1 => KInt
    case 2 => KLong
    case 3 => KFloat
    case 4 => KDouble
    case 5 => KDate
    case 6 => KTime
    case 7 => KTimestamp
    case 8 => KTimestamptz
    case 9 => KTimestampNs
    case 10 => KTimestamptzNs
    case 11 => KString
    case 12 => KUuid
    case 13 => KBinary
    case 14 => KDecimal(1 + rnd.nextInt(38), rnd.nextInt(10))
    case _ => KFixed(rnd.nextInt(64).toLong)
  }

  private def randField(depth: Int): WireField = {
    val tpe: WireFieldType =
      if (depth <= 0) WirePrimitive(randKind())
      else rnd.nextInt(5) match {
        case 0 => WireStructType(Seq.fill(rnd.nextInt(3))(randField(depth - 1)))
        case 1 => WireListType(randField(depth - 1))
        case 2 => WireMapType(randField(depth - 1), randField(depth - 1))
        case _ => WirePrimitive(randKind())
      }
    WireField(rnd.nextInt(2000), randString(), rnd.nextBoolean(), tpe)
  }

  private def randTransform(): WireTransform = rnd.nextInt(9) match {
    case 0 => WireTransform.Identity
    case 1 => WireTransform.Year
    case 2 => WireTransform.Month
    case 3 => WireTransform.Day
    case 4 => WireTransform.Hour
    case 5 => WireTransform.Void
    case 6 => WireTransform.Unknown
    case 7 => WireTransform.Bucket(1 + rnd.nextInt(1024))
    case _ => WireTransform.Truncate(1 + rnd.nextInt(64))
  }

  private def randTask(): WireScanTask = WireScanTask(
    math.abs(randLong()) max 0L, math.abs(randLong()) max 0L,
    rnd.nextInt(100000).toLong, randString(), rnd.nextInt(3), rnd.nextInt(3),
    Seq.fill(rnd.nextInt(6))(rnd.nextInt(100)), randLong(),
    Seq.fill(rnd.nextInt(3))(rnd.nextInt(100)))

  private def randRequest(): WireRewriteRequest = WireRewriteRequest(
    tasks = Seq.fill(rnd.nextInt(6))(randTask()),
    config = Seq.fill(rnd.nextInt(4))(randString() -> randString()).toMap,
    dirPath = randString(),
    fileIo = if (rnd.nextBoolean())
      Some(WireFileIo(randString(),
        Seq.fill(rnd.nextInt(3))(randString() -> randString()).toMap))
    else None,
    schema = if (rnd.nextBoolean())
      Some(WireSchema(rnd.nextInt(100).toLong, Seq.fill(rnd.nextInt(5))(randField(2))))
    else None,
    partitionSpec = if (rnd.nextBoolean())
      Some(WirePartitionSpec(rnd.nextInt(10), Seq.fill(rnd.nextInt(4))(
        WirePartitionField(rnd.nextInt(100),
          if (rnd.nextBoolean()) Some(1000 + rnd.nextInt(100)) else None,
          randString(), randTransform()))))
    else None)

  private def randDataFile(): WireDataFile = WireDataFile(
    content = rnd.nextInt(3),
    path = randString(),
    format = rnd.nextInt(3),
    partition = Seq.fill(rnd.nextInt(3))(
      if (rnd.nextBoolean()) Some(randLiteral(2)) else None),
    recordCount = rnd.nextInt(1000000).toLong,
    fileSizeBytes = rnd.nextInt(Int.MaxValue).toLong,
    columnSizes = Seq.fill(rnd.nextInt(4))(rnd.nextInt(50) -> (math.abs(randLong()) max 0L)).toMap,
    valueCounts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(50) -> rnd.nextInt(1000).toLong).toMap,
    nullValueCounts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(50) -> rnd.nextInt(10).toLong).toMap,
    nanValueCounts = Seq.fill(rnd.nextInt(2))(rnd.nextInt(50) -> 0L).toMap,
    lowerBounds = Seq.fill(rnd.nextInt(3))(
      rnd.nextInt(50) -> Seq.fill(rnd.nextInt(9))(rnd.nextInt().toByte)).toMap,
    upperBounds = Seq.fill(rnd.nextInt(3))(
      rnd.nextInt(50) -> Seq.fill(rnd.nextInt(9))(rnd.nextInt().toByte)).toMap,
    keyMetadata = if (rnd.nextBoolean())
      Some(Seq.fill(rnd.nextInt(8))(rnd.nextInt().toByte)) else None,
    splitOffsets = Seq.fill(rnd.nextInt(4))(math.abs(randLong()) max 0L),
    equalityIds = Seq.fill(rnd.nextInt(3))(rnd.nextInt(100)),
    sortOrderId = if (rnd.nextBoolean()) Some(rnd.nextInt(5)) else None,
    partitionSpecId = rnd.nextInt(5))

  test("random RewriteFilesRequests round-trip (300 cases)") {
    for (i <- 1 to 300) {
      val req = randRequest()
      assert(decodeRewriteRequest(encodeRewriteRequest(req)) == req, s"case $i")
    }
  }

  test("random literal trees round-trip (500 cases)") {
    for (i <- 1 to 500) {
      val lit = randLiteral(3)
      val w = new ProtoWire.Writer
      encodeLiteral(w, lit)
      assert(decodeLiteral(new ProtoWire.Reader(w.toBytes)) == lit, s"case $i")
    }
  }

  test("random responses with data files round-trip (200 cases)") {
    for (i <- 1 to 200) {
      val resp = WireRewriteResponse(
        Seq.fill(rnd.nextInt(4))(randDataFile()),
        if (rnd.nextBoolean())
          Some(WireStat(rnd.nextInt(100).toLong, rnd.nextInt(100).toLong,
            math.abs(randLong()) max 0L, rnd.nextInt(5).toLong))
        else None)
      assert(decodeRewriteResponse(encodeRewriteResponse(resp)) == resp, s"case $i")
    }
  }

  test("decoding arbitrary junk never reads out of bounds (it throws or returns)") {
    for (_ <- 1 to 300) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      try decodeRewriteRequest(junk)
      catch { case _: IllegalArgumentException | _: scala.MatchError => () }
    }
  }
}
