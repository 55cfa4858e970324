package graft.sources.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column bounds accumulated AS THE WRITER STREAMS ROWS — the
  * ingest-time half of stats pruning (Iceberg's writers collect
  * `lower_bounds`/`upper_bounds` the same way; the reference stamps them
  * from its writer metrics). Zero extra IO: one typed compare per stat
  * column per row, and the commit message carries the rendered bounds
  * into the snapshot entry, so a doorway-written file is stats-prunable
  * from its very first snapshot — without this, only compacted files had
  * bounds and every fresh INSERT was un-prunable until maintenance ran.
  *
  * Strictly conservative encodings only (a wrong bound silently prunes a
  * file that has matches — worse than no bound):
  *  - integral / floating / decimal columns render `toString`, the exact
  *    form [[graft.sources.GraftCatalog.scanTableWhere]] parses back via
  *    `toDoubleOption`; a float/double column containing any NaN drops
  *    its bounds for the file (NaN comparisons would corrupt them).
  *  - string columns keep bounds only when both ends are pure ASCII and
  *    ≤ 64 chars: the accumulator compares in UTF8String binary order but
  *    the eq-string pruner compares java-lexically — identical orders on
  *    ASCII, divergent beyond it, so non-ASCII bounds are dropped rather
  *    than risked (and unbounded-length bounds would bloat the manifest).
  *  - all-null columns record a null count but no bounds.
  *  - every other type (dates, timestamps, nested, binary) is skipped —
  *    no pruner consumes bounds for them today.
  */
final class WriterStats(schema: StructType) {

  private final class Col(val name: String, val ordinal: Int, val dt: DataType) {
    var nulls: Long = 0L
    var dropped: Boolean = false
    // typed running bounds; null = no non-null value seen yet
    var minL: Long = 0L; var maxL: Long = 0L; var seenL = false
    var minD: Double = 0d; var maxD: Double = 0d; var seenD = false
    var minS: UTF8String = _; var maxS: UTF8String = _
    var minDec: Decimal = _; var maxDec: Decimal = _
  }

  private val cols: Array[Col] = schema.fields.zipWithIndex.collect {
    case (f, i) if WriterStats.supported(f.dataType) => new Col(f.name, i, f.dataType)
  }

  def observe(row: InternalRow): Unit = {
    var i = 0
    while (i < cols.length) {
      val c = cols(i)
      // null counting NEVER stops: the manifest COUNT(col) pushdown
      // consumes nullCounts without a bounds check, so an undercount
      // would serve a wrong aggregate — `dropped` only disables bounds
      if (row.isNullAt(c.ordinal)) c.nulls += 1
      else if (!c.dropped) {
        c.dt match {
          case ByteType | ShortType | IntegerType | LongType =>
            val v = c.dt match {
              case ByteType => row.getByte(c.ordinal).toLong
              case ShortType => row.getShort(c.ordinal).toLong
              case IntegerType => row.getInt(c.ordinal).toLong
              case _ => row.getLong(c.ordinal)
            }
            if (!c.seenL) { c.minL = v; c.maxL = v; c.seenL = true }
            else { if (v < c.minL) c.minL = v; if (v > c.maxL) c.maxL = v }
          case FloatType | DoubleType =>
            val v = c.dt match {
              case FloatType => row.getFloat(c.ordinal).toDouble
              case _ => row.getDouble(c.ordinal)
            }
            if (java.lang.Double.isNaN(v)) c.dropped = true
            else if (!c.seenD) { c.minD = v; c.maxD = v; c.seenD = true }
            else { if (v < c.minD) c.minD = v; if (v > c.maxD) c.maxD = v }
          case d: DecimalType =>
            val v = row.getDecimal(c.ordinal, d.precision, d.scale)
            if (c.minDec == null) { c.minDec = v; c.maxDec = v }
            else {
              if (v.compare(c.minDec) < 0) c.minDec = v
              if (v.compare(c.maxDec) > 0) c.maxDec = v
            }
          case StringType =>
            val v = row.getUTF8String(c.ordinal)
            // clone only on bound movement: the row's buffer is reused
            if (c.minS == null) { c.minS = v.clone(); c.maxS = c.minS }
            else {
              if (v.compareTo(c.minS) < 0) c.minS = v.clone()
              if (v.compareTo(c.maxS) > 0) c.maxS = v.clone()
            }
          case _ => ()
        }
      }
      i += 1
    }
  }

  /** (colMins, colMaxs, nullCounts) in the catalog's string encoding. */
  def result(): (Map[String, String], Map[String, String], Map[String, Long]) = {
    val mins = Map.newBuilder[String, String]
    val maxs = Map.newBuilder[String, String]
    val nulls = Map.newBuilder[String, Long]
    cols.foreach { c =>
      nulls += c.name -> c.nulls
      if (!c.dropped) {
        def put(mn: String, mx: String): Unit = {
          mins += c.name -> mn; maxs += c.name -> mx
        }
        c.dt match {
          case ByteType | ShortType | IntegerType | LongType if c.seenL =>
            put(c.minL.toString, c.maxL.toString)
          case FloatType | DoubleType if c.seenD =>
            put(c.minD.toString, c.maxD.toString)
          case _: DecimalType if c.minDec != null =>
            put(c.minDec.toString, c.maxDec.toString)
          case StringType if c.minS != null &&
              WriterStats.asciiBounded(c.minS) && WriterStats.asciiBounded(c.maxS) =>
            put(c.minS.toString, c.maxS.toString)
          case _ => ()
        }
      }
    }
    (mins.result(), maxs.result(), nulls.result())
  }
}

object WriterStats {
  private[dsv2] def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType => true
    case _: DecimalType => true
    case _ => false
  }

  private def asciiBounded(s: UTF8String): Boolean = {
    if (s.numBytes > 64) return false
    val b = s.getBytes
    var i = 0
    while (i < b.length) { if (b(i) < 0) return false; i += 1 }
    true
  }
}
