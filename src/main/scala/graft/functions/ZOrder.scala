package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) curve kernel for data-clustered compaction — the
  * multi-dimensional analogue of the linear `clusterBy` rewrite: sorting
  * files along the space-filling curve makes per-file min/max bounds tight
  * in EVERY clustered dimension at once, so stats-based pruning skips
  * files for box predicates no single-column sort order can serve. The
  * Iceberg ecosystem exposes the same strategy as
  * `rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a, b)')`;
  * the reference's `DataFile` carries the resulting `sort_order_id` on the
  * wire (`core/proto/iceberg.proto:200`).
  *
  * The kernel round-robin-interleaves 2–4 sixteen-bit bucket ordinals
  * (bit i of dimension j lands at z bit `i*n + j`, so dimension 0 owns the
  * even bits in the 2-D case) into one long in [0, 2^(16n)). Inputs
  * outside [0, 65535] clamp — [[graft.sources.CompactionRunner]] feeds
  * range-normalized ordinals, but the SQL surface
  * (`graft_interleave_bits`, 2–4 args) accepts raw longs. One static call
  * per row inside whole-stage codegen; the same arithmetic unrolls to
  * plain bit-ops in the q113 DuckDB oracle.
  */
object ZOrder {

  val MaxDims = 4 // 4 × 16 bits fills the long

  /** Morton-interleave two clamped 16-bit values into a 32-bit z-value
    * (the hot 2-D case, kept allocation-free; identical to
    * [[interleaveBitsN]] for n = 2).
    */
  def interleaveBits(a: Long, b: Long): Long = {
    val x = math.min(math.max(a, 0L), 65535L)
    val y = math.min(math.max(b, 0L), 65535L)
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** n-dimensional round-robin interleave, n = values.length ∈ [2, 4]. */
  def interleaveBitsN(values: Array[Long]): Long = {
    val n = values.length
    var z = 0L
    var j = 0
    while (j < n) {
      val v = math.min(math.max(values(j), 0L), 65535L)
      var i = 0
      while (i < 16) {
        z |= ((v >> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }

  // fixed-arity entry points for the codegen'd expressions
  def interleave3(a: Long, b: Long, c: Long): Long =
    interleaveBitsN(Array(a, b, c))
  def interleave4(a: Long, b: Long, c: Long, d: Long): Long =
    interleaveBitsN(Array(a, b, c, d))

  /** The z-value column for 2–4 ordinal columns. */
  def interleaveC(cols: Column*): Column = {
    val es = cols.map(ColumnBridge.expression)
    val e = es.size match {
      case 2 => InterleaveBits(es(0), es(1))
      case 3 => InterleaveBits3(es(0), es(1), es(2))
      case 4 => InterleaveBits4(es(0), es(1), es(2), es(3))
      case n => throw new IllegalArgumentException(
        s"interleave_bits takes 2 to $MaxDims ordinals, got $n")
    }
    ColumnBridge.column(e)
  }

  private[functions] def ordinalTypeOk(t: DataType): Boolean =
    t == LongType || t == IntegerType

  private[functions] def typeFailure(ts: Seq[DataType]): TypeCheckResult =
    TypeCheckResult.TypeCheckFailure(
      s"interleave_bits expects int/long ordinals, got " +
        ts.map(_.catalogString).mkString("(", ", ", ")"))

  private[functions] def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }
}

/** `ZOrder.interleaveBits(long, long)` as a codegen'd binary expression. */
case class InterleaveBits(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(c => ZOrder.ordinalTypeOk(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else ZOrder.typeFailure(Seq(left, right).map(_.dataType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleaveBits(ZOrder.asLong(left, a), ZOrder.asLong(right, b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // int operands widen to long implicitly at the static-call site
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleaveBits($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

/** 3-dimensional round-robin interleave (48-bit z-values). */
case class InterleaveBits3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => ZOrder.ordinalTypeOk(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else ZOrder.typeFailure(children.map(_.dataType))

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrder.interleave3(ZOrder.asLong(first, a), ZOrder.asLong(second, b),
      ZOrder.asLong(third, c))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.ZOrder.interleave3($a, $b, $c)")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): InterleaveBits3 =
    copy(first = a, second = b, third = c)
}

/** 4-dimensional round-robin interleave (64-bit z-values). */
case class InterleaveBits4(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => ZOrder.ordinalTypeOk(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else ZOrder.typeFailure(children.map(_.dataType))

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    ZOrder.interleave4(ZOrder.asLong(first, a), ZOrder.asLong(second, b),
      ZOrder.asLong(third, c), ZOrder.asLong(fourth, d))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.ZOrder.interleave4($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): InterleaveBits4 =
    copy(first = a, second = b, third = c, fourth = d)
}
