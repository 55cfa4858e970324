package graft.functions

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Iceberg spec "Appendix B: 32-bit Hash Requirements" published test
  * vectors — the byte-compat contract for the bucket transform.
  */
class Murmur3Spec extends AnyFunSuite {

  import IcebergMurmur3._

  test("int/long 34 hash to 2017239379 (widened-long encoding)") {
    assert(hashLong(34L) == 2017239379)
  }

  test("string 'iceberg' hashes to 1210000089 (UTF-8 bytes)") {
    assert(hashBytes("iceberg".getBytes(StandardCharsets.UTF_8)) == 1210000089)
  }

  test("date 2017-11-16 (17486 days) hashes to -653330422") {
    assert(hashLong(17486L) == -653330422)
  }

  test("time 22:31:08 (micros) hashes to -662762989") {
    assert(hashLong(81068000000L) == -662762989)
  }

  test("timestamp 2017-11-16T22:31:08 (micros) hashes to -2047944441") {
    assert(hashLong(1510871468000000L) == -2047944441)
  }

  test("timestamp with micros 2017-11-16T22:31:08.000001 hashes to -1207196810") {
    assert(hashLong(1510871468000001L) == -1207196810)
  }

  test("decimal 14.20 hashes to -500754589 (minimal two's-complement BE)") {
    val unscaled = java.math.BigInteger.valueOf(1420)
    assert(hashBytes(unscaled.toByteArray) == -500754589)
  }

  test("uuid f79c3e09-677c-4bbd-a479-3f349cb785e7 hashes to 1488055340") {
    val u = java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    assert(hashBytes(bb.array()) == 1488055340)
  }

  test("binary 0x00010203 hashes to -188683207") {
    assert(hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207)
  }

  test("bucket is non-negative and stable") {
    assert(bucketLong(34L, 16) == (2017239379 & Int.MaxValue) % 16)
    assert(bucketLong(-34L, 16) >= 0)
    assert(bucketBytes(Array[Byte](-1, -2), 7) >= 0)
  }
}
