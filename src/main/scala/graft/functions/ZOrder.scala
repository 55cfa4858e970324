package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) curve kernel for data-clustered compaction — the
  * multi-dimensional analogue of the linear `clusterBy` rewrite: sorting
  * files along the space-filling curve makes per-file min/max bounds tight
  * in BOTH dimensions at once, so stats-based pruning skips files for box
  * predicates no single-column sort order can serve. The Iceberg ecosystem
  * exposes the same strategy as `rewrite_data_files(strategy => 'sort',
  * sort_order => 'zorder(a, b)')`; the reference's `DataFile` carries the
  * resulting `sort_order_id` on the wire (`core/proto/iceberg.proto:200`).
  *
  * The kernel interleaves two 16-bit bucket ordinals (a → even bits,
  * b → odd bits) into one long in [0, 2³²). Inputs outside [0, 65535]
  * clamp — [[graft.sources.CompactionRunner]] feeds range-normalized
  * ordinals, but the SQL surface (`graft_interleave_bits`) accepts raw
  * longs. One static call per row inside whole-stage codegen; the same
  * arithmetic unrolls to plain bit-ops in the q113 DuckDB oracle.
  */
object ZOrder {

  /** Morton-interleave two clamped 16-bit values into a 32-bit z-value. */
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

  def interleaveC(a: Column, b: Column): Column =
    ColumnBridge.column(
      InterleaveBits(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `ZOrder.interleaveBits(long, long)` as a codegen'd binary expression. */
case class InterleaveBits(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == LongType || t == IntegerType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits expects two int/long ordinals, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleaveBits(asLong(left, a), asLong(right, b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // int operands widen to long implicitly at the static-call site
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleaveBits($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}
