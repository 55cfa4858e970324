package graft.functions

import graft.sources.FieldIds
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distributed Apache-DataSketches THETA sketch of one column — the REAL
  * `apache-datasketches-theta-v1` statistics blob (Puffin spec): the
  * aggregate's output bytes are a compact ordered theta sketch the stock
  * DataSketches library heapifies directly (the sandbox's own
  * datasketches-java proves it in `TableStatisticsSpec`), so an external
  * planner can UNION sketches across snapshots/partitions, not merely
  * read a scalar NDV property.
  *
  * Values enter the sketch as their Iceberg BINARY SINGLE-VALUE
  * serialization (table spec Appendix D — the same byte domain manifest
  * bounds use, and what the Puffin spec prescribes for this blob type):
  * int/date 4-byte LE, long/timestamps 8-byte LE, float/double IEEE bits
  * LE, string UTF-8, decimal minimal two's-complement BE, uuid 16 bytes
  * BE (via the [[FieldIds.IcebergTypeKey]] physical annotation),
  * fixed/binary raw bytes — so two engines sketching the same column
  * produce MERGEABLE sketches.
  *
  * Scale shape: a [[TypedImperativeAggregate]] — each map task keeps one
  * bounded sketch (k=4096 nominal, ≤ ~64 KB) and the exchange carries
  * sketch bytes, never raw values; the same one-pass ANALYZE shape at
  * 60 k rows and 100 TB.
  */
case class ThetaNdvSketch(
    child: Expression,
    physical: Option[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_ndv_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  private def le(n: Long, width: Int): Array[Byte] =
    Array.tabulate(width)(i => ((n >>> (8 * i)) & 0xff).toByte)

  /** Catalyst-internal value → Appendix-D single-value bytes. Unmappable
    * values are SKIPPED (null return): a value the codec cannot express
    * must not enter the sketch as garbage bytes.
    */
  private def valueBytes(v: Any): Array[Byte] = (child.dataType, v) match {
    case (_, null) => null
    case (StringType, s: UTF8String) if physical.contains("uuid") =>
      try {
        val u = java.util.UUID.fromString(s.toString.trim)
        val bb = java.nio.ByteBuffer.allocate(16)
        bb.putLong(u.getMostSignificantBits)
        bb.putLong(u.getLeastSignificantBits)
        bb.array()
      } catch { case _: RuntimeException => null }
    case (StringType, s: UTF8String) => s.getBytes
    case (BooleanType, b: java.lang.Boolean) =>
      Array[Byte](if (b) 1 else 0)
    case (ByteType | ShortType | IntegerType | DateType, n: Number) =>
      le(n.longValue(), 4)
    case (LongType | TimestampType | TimestampNTZType, n: Number) =>
      le(n.longValue(), 8)
    case (FloatType, f: java.lang.Float) =>
      le(java.lang.Float.floatToIntBits(f).toLong, 4)
    case (DoubleType, d: java.lang.Double) =>
      le(java.lang.Double.doubleToLongBits(d), 8)
    case (_: DecimalType, d: org.apache.spark.sql.types.Decimal) =>
      d.toJavaBigDecimal.unscaledValue.toByteArray
    case (BinaryType, b: Array[Byte]) => b
    case _ => null
  }

  override def update(buf: Union, input: InternalRow): Union = {
    val bytes = valueBytes(child.eval(input))
    if (bytes != null) buf.update(bytes)
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  /** Compact ORDERED sketch bytes — the exact `statistics` blob payload. */
  override def eval(buf: Union): Any = buf.getResult(true, null).toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaNdvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaNdvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaNdvSketch =
    copy(child = newChildren(0))
}

object ThetaNdvSketch {

  /** `theta_ndv_sketch(col)` as a DataFrame aggregate column. `field`
    * supplies the physical-type annotation (uuid → 16-byte updates).
    */
  def sketch(c: Column, field: Option[StructField]): Column =
    ColumnBridge.column(
      ThetaNdvSketch(ColumnBridge.expression(c),
        field.flatMap(FieldIds.physicalOf)).toAggregateExpression())

  /** Estimate from a compact sketch payload (what the `ndv` blob property
    * publishes, rounded).
    */
  def estimate(payload: Array[Byte]): Long =
    math.round(Sketches.heapifySketch(Memory.wrap(payload)).getEstimate)

  /** Union two compact payloads into one — what lets incremental ANALYZE
    * sketch only the files added since the last statistics snapshot.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(a)))
    u.union(Sketches.heapifySketch(Memory.wrap(b)))
    u.getResult(true, null).toByteArray
  }
}
