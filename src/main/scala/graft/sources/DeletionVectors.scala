package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Position deletes as PER-DATA-FILE COMPRESSED BITMAPS — the Iceberg-v3
  * deletion-vector direction (one small sidecar replaces N (file_path,
  * pos) parquet row files; the reference's roadmap carries the same item).
  * Kept BEHIND the existing pos-delete surface: a DV file commits as an
  * ordinary `posdel` snapshot entry, readers sniff the magic and decode,
  * and [[GraftCatalog.compactDeleteFiles]] is the migration path (rewrite
  * accumulated parquet pos-deletes into one DV).
  *
  * Encoding (all big-endian, DataOutputStream primitives):
  * {{{
  *   "GDV1" | int nFiles | nFiles × (utf8 dataFilePath | int n |
  *       varlong first, varlong gap…)   // sorted positions, delta-coded
  * }}}
  * Delta-varint beats a fixed bitmap for the sparse deletes MoR tables
  * accumulate (a 1M-row file with 1k deletes costs ~2 KB, not 125 KB) and
  * never loses: dense runs cost ≤ ~1 byte per position.
  */
object DeletionVectors {

  private val Magic: Array[Byte] = Array('G', 'D', 'V', '1').map(_.toByte)

  /** True iff `path` starts with a deletion-vector magic — the legacy
    * GDV1 encoding or an Iceberg-v3 Puffin sidecar ([[Puffin]], what the
    * writer emits now) — how every reader dispatches a posdel entry
    * between the parquet rows format and the sidecar formats (no format
    * threading through task lists).
    */
  def isDv(path: String, conf: Configuration): Boolean =
    try {
      val p = new Path(path)
      val in = p.getFileSystem(conf).open(p)
      try {
        val head = new Array[Byte](4)
        in.readFully(0, head)
        java.util.Arrays.equals(head, Magic) ||
          java.util.Arrays.equals(head, Puffin.Magic)
      } finally in.close()
    } catch { case _: Throwable => false }

  /** Write one DV file; positions per data file are sorted+deduped here.
    * Returns the total position count (the entry's record_count).
    */
  def write(
      path: String,
      byFile: Map[String, Array[Long]],
      conf: Configuration): Long = {
    val p = new Path(path)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      p.getFileSystem(conf).create(p, false)))
    var total = 0L
    try {
      out.write(Magic)
      out.writeInt(byFile.size)
      byFile.toSeq.sortBy(_._1).foreach { case (file, raw) =>
        val ps = raw.distinct.sorted
        out.writeUTF(file)
        out.writeInt(ps.length)
        var prev = 0L
        var i = 0
        while (i < ps.length) {
          writeVarLong(out, if (i == 0) ps(0) else ps(i) - prev)
          prev = ps(i)
          i += 1
        }
        total += ps.length
      }
    } finally out.close()
    total
  }

  /** Decode a DV file — Puffin (the written format) or legacy GDV1 — to
    * (canonical data file path → sorted positions).
    */
  def read(path: String, conf: Configuration): Map[String, Array[Long]] = {
    if (Puffin.isPuffin(path, conf)) return Puffin.readDv(path, conf)
    val p = new Path(path)
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      p.getFileSystem(conf).open(p)))
    try {
      val head = new Array[Byte](4)
      in.readFully(head)
      require(java.util.Arrays.equals(head, Magic),
        s"$path is not a deletion-vector file")
      val nFiles = in.readInt()
      (0 until nFiles).map { _ =>
        val file = in.readUTF()
        val n = in.readInt()
        val ps = new Array[Long](n)
        var prev = 0L
        var i = 0
        while (i < n) {
          prev = (if (i == 0) 0L else prev) + readVarLong(in)
          ps(i) = prev
          i += 1
        }
        file -> ps
      }.toMap
    } finally in.close()
  }

  private def writeVarLong(out: java.io.DataOutputStream, v0: Long): Unit = {
    require(v0 >= 0L, s"positions are non-negative and sorted, got delta $v0")
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.writeByte(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.writeByte(v.toInt)
  }

  private def readVarLong(in: java.io.DataInputStream): Long = {
    var v = 0L
    var shift = 0
    var b = 0
    do {
      b = in.readUnsignedByte()
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }
}
