package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-shape checks of the spec's binary single-value serialization
  * (Iceberg table spec, Appendix D) — the encoding manifest bounds carry.
  * Vectors are the spec's own published examples where it gives them
  * (int 34, long 34, decimal 14.20, string "iceberg", date 2017-11-16,
  * timestamp 2017-11-16T22:31:08).
  */
class IcebergSingleValueSpec extends AnyFunSuite {

  private def enc(dt: DataType, s: String): Seq[Int] =
    IcebergSingleValue.encode(dt, s).get.map(_ & 0xff).toSeq

  test("spec vectors encode byte-for-byte") {
    assert(enc(BooleanType, "true") == Seq(0x01))
    assert(enc(BooleanType, "false") == Seq(0x00))
    // int 34 -> 22 00 00 00 (little-endian)
    assert(enc(IntegerType, "34") == Seq(0x22, 0, 0, 0))
    // long 34 -> 22 00 00 00 00 00 00 00
    assert(enc(LongType, "34") == Seq(0x22, 0, 0, 0, 0, 0, 0, 0))
    // float 1.0 -> 00 00 80 3F
    assert(enc(FloatType, "1.0") == Seq(0x00, 0x00, 0x80, 0x3f))
    // double 1.0 -> 00 00 00 00 00 00 F0 3F
    assert(enc(DoubleType, "1.0") ==
      Seq(0, 0, 0, 0, 0, 0, 0xf0, 0x3f))
    // date 2017-11-16 = 17486 days -> 4E 44 00 00
    assert(enc(DateType, "2017-11-16") == Seq(0x4e, 0x44, 0, 0))
    // timestamp 2017-11-16T22:31:08 UTC = 1510871468000000 micros
    val tsBytes = enc(TimestampType, "2017-11-16 22:31:08")
    assert(IcebergSingleValue.decode(TimestampType,
      tsBytes.map(_.toByte).toArray).contains("2017-11-16 22:31:08"))
    assert(enc(TimestampType, "1510871468000000") == tsBytes)
    // string "iceberg" -> UTF-8
    assert(enc(StringType, "iceberg") ==
      "iceberg".getBytes("UTF-8").map(_ & 0xff).toSeq)
    // decimal 14.20 scale 2 -> unscaled 1420 big-endian minimal: 05 8C
    assert(enc(DecimalType(10, 2), "14.20") == Seq(0x05, 0x8c))
  }

  test("every supported type round-trips to the catalog's string rendering") {
    val cases: Seq[(DataType, String, String)] = Seq(
      (BooleanType, "true", "true"),
      (IntegerType, "-7", "-7"),
      (LongType, "9007199254740993", "9007199254740993"), // > 2^53: exact
      (FloatType, "0.1", "0.1"),
      (DoubleType, "-123.456", "-123.456"),
      (StringType, "héllo wörld", "héllo wörld"),
      (DateType, "1969-12-30", "1969-12-30"), // negative epoch day
      (TimestampType, "2024-02-29 23:59:59.123456", "2024-02-29 23:59:59.123456"),
      (TimestampNTZType, "1955-06-01 00:00:00", "1955-06-01 00:00:00"), // pre-epoch
      (DecimalType(18, 4), "-99.5000", "-99.5000"))
    for ((dt, in, out) <- cases) {
      val bytes = IcebergSingleValue.encode(dt, in)
      assert(bytes.isDefined, s"$dt '$in' must encode")
      assert(IcebergSingleValue.decode(dt, bytes.get).contains(out),
        s"$dt '$in' must decode to '$out'")
    }
  }

  test("unparseable strings and unmappable types drop, never corrupt") {
    assert(IcebergSingleValue.encode(IntegerType, "not a number").isEmpty)
    assert(IcebergSingleValue.encode(DateType, "yesterday").isEmpty)
    assert(IcebergSingleValue.encode(BinaryType, "anything").isEmpty)
    assert(IcebergSingleValue.encode(
      ArrayType(IntegerType), "[1]").isEmpty)
    // decimal requiring rounding refuses (a rounded bound could prune
    // rows the true bound keeps)
    assert(IcebergSingleValue.encode(DecimalType(10, 1), "1.23").isEmpty)
    // wrong byte widths refuse on decode
    assert(IcebergSingleValue.decode(IntegerType, Array[Byte](1, 2)).isEmpty)
    assert(IcebergSingleValue.decode(LongType, Array[Byte](1)).isEmpty)
    assert(IcebergSingleValue.decode(BooleanType, Array[Byte](1, 0)).isEmpty)
  }
}
