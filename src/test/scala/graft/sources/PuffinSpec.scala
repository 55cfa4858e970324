package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg-v3 Puffin deletion vectors: offline byte-shape checks against
  * the published Puffin + v3 specs (magic framing, footer layout, blob
  * encoding, CRC, roaring portable serialization), plus round-trips.
  */
class PuffinSpec extends AnyFunSuite {

  private val conf = new Configuration()

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-puffin").resolve(name).toString

  test("file framing: PFA1 magics, LE footer size, flags, blob index") {
    val path = tmp("t.puffin")
    val positions = Array(0L, 1L, 5L, 1000L)
    val total = Puffin.writeDv(path,
      Seq("/data/a.parquet" -> positions), conf)
    assert(total == 4L)
    val bytes = Files.readAllBytes(Paths.get(path))
    val magic = "PFA1".getBytes("UTF-8")
    // leading magic; footer = Magic | payload | size i32 LE | flags | Magic
    assert(bytes.slice(0, 4).sameElements(magic), "head magic")
    assert(bytes.slice(bytes.length - 4, bytes.length).sameElements(magic),
      "trailing magic")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val payloadSize = bb.getInt(bytes.length - 12)
    val flags = bb.getInt(bytes.length - 8)
    assert(flags == 0, "uncompressed footer payload")
    val payloadStart = bytes.length - 12 - payloadSize
    assert(bytes.slice(payloadStart - 4, payloadStart).sameElements(magic),
      "footer-open magic before the payload")
    val payload = new String(
      bytes.slice(payloadStart, payloadStart + payloadSize), "UTF-8")
    assert(payload.contains("\"deletion-vector-v1\""))
    assert(payload.contains("\"referenced-data-file\":\"/data/a.parquet\""))
    assert(payload.contains("\"cardinality\":\"4\""))
    assert(payload.contains(s""""fields":[${Int.MaxValue - 102}]"""),
      "DV blobs carry the DELETE_FILE_POS field id")
    val (blobs, _) = Puffin.readFooter(path, conf)
    assert(blobs.size == 1 && blobs.head.blobType == "deletion-vector-v1")
    assert(blobs.head.offset == 4L, "first blob starts right after the magic")
  }

  test("DV blob: BE length prefix, D1 D3 39 64 magic, CRC-32 over magic+vector") {
    val path = tmp("t.puffin")
    Puffin.writeDv(path, Seq("/data/a.parquet" -> Array(7L, 9L)), conf)
    val bytes = Files.readAllBytes(Paths.get(path))
    val (blobs, _) = Puffin.readFooter(path, conf)
    val b = blobs.head
    val blob = bytes.slice(b.offset.toInt, (b.offset + b.length).toInt)
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val vlen = bb.getInt(0)
    assert(vlen == blob.length - 8,
      "BE length prefix covers magic + vector (not the CRC)")
    assert(blob.slice(4, 8).map(_ & 0xff).toSeq == Seq(0xd1, 0xd3, 0x39, 0x64),
      "the v3 DV blob magic")
    val crc = new java.util.zip.CRC32()
    crc.update(blob, 4, blob.length - 8)
    assert(bb.getInt(blob.length - 4) == crc.getValue.toInt, "trailing CRC-32")
    // corrupting one vector byte must fail the CRC check on read
    blob(10) = (blob(10) ^ 0x5a).toByte
    val corrupted = bytes.clone()
    System.arraycopy(blob, 0, corrupted, b.offset.toInt, blob.length)
    val cpath = tmp("corrupt.puffin")
    Files.write(Paths.get(cpath), corrupted)
    val err = intercept[IllegalArgumentException](Puffin.readDv(cpath, conf))
    assert(err.getMessage.contains("CRC"))
  }

  test("roaring64 portable: LE bucket framing and container encodings") {
    // values crossing the 32-bit boundary and both container kinds:
    // a sparse array container and a dense >4096-cardinality bitmap one
    val dense = (0L until 5000L).map(_ * 2 + 100000L) // one 16-bit chunk? no — spread
    val vals = (Array(0L, 1L, 65536L, (1L << 32) + 3L, (5L << 32)) ++ dense).sorted
    val ser = Puffin.serializeBitmap64(vals)
    val bb = ByteBuffer.wrap(ser).order(ByteOrder.LITTLE_ENDIAN)
    val buckets = bb.getLong(0)
    assert(buckets == 3L, s"high-32 buckets 0, 1, 5 — got $buckets")
    assert(bb.getInt(8) == 0, "first bucket key (high bits) is 0, LE")
    assert(bb.getInt(12) == 12346,
      "32-bit bitmap opens with the no-run portable cookie")
    assert(Puffin.deserializeBitmap64(ser).toSeq == vals.toSeq)
  }

  test("roaring container split: >4096 values in one chunk becomes a bitmap container") {
    // 5000 values inside ONE 16-bit chunk -> bitmap container (8KB words)
    val vals = (0L until 5000L).toArray
    val ser = Puffin.serializeBitmap64(vals)
    val bb = ByteBuffer.wrap(ser).order(ByteOrder.LITTLE_ENDIAN)
    // u64 buckets | u32 high | cookie | size | key u16 | card-1 u16 | offset
    assert(bb.getLong(0) == 1L)
    assert(bb.getInt(12) == 12346)
    assert(bb.getInt(16) == 1, "one container")
    assert((bb.getShort(22).toInt & 0xffff) == 4999, "cardinality-1 descriptor")
    val containerBytes = ser.length - (8 + 4 + 8 + 4 + 4)
    assert(containerBytes == 8192, s"bitmap container is 1024 LE words, got $containerBytes")
    assert(Puffin.deserializeBitmap64(ser).toSeq == vals.toSeq)
    // and a 4096-cardinality chunk stays an array container (2 bytes/value)
    val arr = Puffin.serializeBitmap64((0L until 4096L).toArray)
    assert(arr.length == 8 + 4 + 8 + 4 + 4 + 4096 * 2)
  }

  test("multi-file round-trip and DeletionVectors dispatch by magic") {
    val path = tmp("multi.puffin")
    val byFile = Seq(
      "/d/a.parquet" -> Array(3L, 1L, 3L, 99L), // dup + unsorted: writer normalizes
      "/d/b.parquet" -> Array.tabulate(10000)(i => i * 3L))
    val total = Puffin.writeDv(path, byFile, conf)
    assert(total == 3L + 10000L)
    val back = Puffin.readDv(path, conf)
    assert(back.keySet == Set("/d/a.parquet", "/d/b.parquet"))
    assert(back("/d/a.parquet").toSeq == Seq(1L, 3L, 99L))
    assert(back("/d/b.parquet").length == 10000)
    // the generic DV reader sniffs the Puffin magic and dispatches
    assert(DeletionVectors.isDv(path, conf))
    assert(DeletionVectors.read(path, conf).view.mapValues(_.toSeq).toMap ==
      back.view.mapValues(_.toSeq).toMap)
    // legacy GDV1 files still read through the same entry point
    val legacy = tmp("legacy.gdv")
    DeletionVectors.write(legacy, Map("/d/c.parquet" -> Array(5L, 2L)), conf)
    assert(DeletionVectors.isDv(legacy, conf))
    assert(DeletionVectors.read(legacy, conf)("/d/c.parquet").toSeq == Seq(2L, 5L))
  }

  test("empty bitmap and Long.MaxValue positions survive") {
    val path = tmp("edge.puffin")
    Puffin.writeDv(path,
      Seq("/d/x.parquet" -> Array(Long.MaxValue, 0L, Long.MaxValue - 1)), conf)
    val back = Puffin.readDv(path, conf)
    assert(back("/d/x.parquet").toSeq ==
      Seq(0L, Long.MaxValue - 1, Long.MaxValue))
    val ser = Puffin.serializeBitmap64(Array.empty[Long])
    assert(ser.length == 8 && Puffin.deserializeBitmap64(ser).isEmpty)
  }
}
