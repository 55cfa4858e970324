package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels (same pattern as [[TextOps]]): one static JVM
  * call per row inside whole-stage codegen. The higher-order-function
  * formulation (`zip_with` + `aggregate` per bit) is interpreted
  * per-element-per-bit and measured ~4× slower for the SRP signature.
  */
object VectorOps {

  /** ±1 hyperplane entry (j, i) — fixed pseudo-random, embedded verbatim in
    * the q54 oracle SQL (both engines read the same literals).
    */
  def srpSign(j: Int, i: Int): Int =
    if (((j * 1000003L + i * 7919L) * 2654435761L % 97 % 2 + 2) % 2 == 0) 1 else -1

  /** 16-bit signed-random-projection signature. The per-bit dot product is
    * a sequential left fold in element order — bit-identical to the
    * oracle's `list_sum(list_transform(...))` and to the previous
    * `aggregate(zip_with(...))` formulation.
    */
  def srpSig(v: ArrayData, isFloat: Boolean): Long = {
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < 16) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * srpSign(j, i)
        i += 1
      }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def srpSigC(c: Column): Column =
    ColumnBridge.column(SrpSignature(ColumnBridge.expression(c)))

  /** Sequential left-fold dot product — bit-identical to the
    * `aggregate(zip_with(a, b, x·y), 0.0, +)` higher-order formulation it
    * replaces (same element order, same double rounding at every step) and
    * to the oracle's `list_sum(list_transform(...))`, but one codegen'd
    * static call per row instead of an interpreted per-element lambda tree.
    */
  def dotFold(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      // ArrayData silently unboxes a null slot to 0.0 — reachable from SQL
      // (`graft_dot(array(CAST(NULL AS DOUBLE)), ...)`); fail loudly rather
      // than treat it as a zero component
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"dot_fold: null element at position $i (vectors must be dense)")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def dotC(a: Column, b: Column): Column =
    ColumnBridge.column(DotFold(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Per-vector int8 scalar quantization in ONE kernel call: max|x| →
    * scale 127/max|x| (0 for all-zero vectors) → `floor(x·scale + 0.5)`,
    * emitted as exact small-integer doubles so [[dotFold]] applies
    * directly. Exists because the equivalent `transform`/`array_max`
    * formulation is un-hoistable: `CollapseProject` re-inlines the scale
    * into the per-element lambda (O(d²)/row) no matter how the projection
    * is staged — a kernel is opaque to that rewrite.
    */
  def quantizeInt8(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"quantize_int8: null element at position $i (vectors must be dense)")
      val x = math.abs(if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      if (x > mx) mx = x
      i += 1
    }
    val scale = if (mx == 0.0) 0.0 else 127.0 / mx
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = math.floor(x * scale + 0.5)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def quantizeInt8C(c: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(c)))
}

/** `VectorOps.dotFold(array<float|double>, array<float|double>)` as a
  * codegen'd binary expression.
  */
case class DotFold(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_fold"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_fold expects (array<float|double>, array<float|double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotFold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.dotFold($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

/** `VectorOps.srpSig(array<float|double>)` as a codegen'd unary expression. */
case class SrpSignature(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_signature"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_signature expects array<float|double>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.srpSig(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.srpSig($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

/** `VectorOps.quantizeInt8(array<float|double>)` as a codegen'd unary
  * expression: one static call per row, no per-element lambda for the
  * optimizer to re-expand.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantize_int8"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 expects array<float|double>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.quantizeInt8(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.quantizeInt8($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}
