package graft.functions

import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** Murmur3 32-bit (x86) hash as required by the Iceberg spec for the
  * `bucket[N]` partition transform (spec "Appendix B: 32-bit Hash
  * Requirements": murmur3_x86_32 seed 0; ints/longs hashed as 8
  * little-endian bytes, strings as UTF-8 bytes, decimals as the minimal
  * two's-complement big-endian unscaled value).
  *
  * Hand-implemented from the public MurmurHash3 algorithm (Austin Appleby,
  * public domain) because Spark's `hash()` / `Murmur3_x86_32.hashUnsafeBytes`
  * use different seeds/tail handling and are NOT byte-compatible with
  * Iceberg. Verified against the spec's published test vectors in
  * `Murmur3Spec`.
  *
  * Reference behavior being matched: transform decode at
  * `core/src/parser/proto.rs:334-377` (Bucket arm).
  *
  * Methods are on a top-level object so whole-stage codegen can call the
  * static forwarders (`graft.functions.IcebergMurmur3.bucketLong(...)`).
  */
object IcebergMurmur3 {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    var h1 = 0 // seed
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val b = i << 2
      var k1 = (data(b) & 0xff) | ((data(b + 1) & 0xff) << 8) |
        ((data(b + 2) & 0xff) << 16) | ((data(b + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks << 2
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    fmix(h1 ^ len)
  }

  /** Longs (and widened ints/dates/timestamps) hash as 8 LE bytes; unrolled. */
  def hashLong(v: Long): Int = {
    var h1 = 0
    var k1 = v.toInt // low 32 bits (LE bytes 0-3)
    k1 *= C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 *= C2
    h1 ^= k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 = h1 * 5 + 0xe6546b64
    k1 = (v >>> 32).toInt // high 32 bits (LE bytes 4-7)
    k1 *= C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 *= C2
    h1 ^= k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 = h1 * 5 + 0xe6546b64
    fmix(h1 ^ 8)
  }

  private def fmix(h: Int): Int = {
    var h1 = h
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  private def toBucket(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n

  def bucketLong(v: Long, n: Int): Int = toBucket(hashLong(v), n)
  def bucketBytes(v: Array[Byte], n: Int): Int = toBucket(hashBytes(v), n)
  def bucketUTF8(v: UTF8String, n: Int): Int = toBucket(hashBytes(v.getBytes), n)
  def bucketDecimal(v: Decimal, n: Int): Int =
    toBucket(hashBytes(v.toJavaBigDecimal.unscaledValue.toByteArray), n)
}
