package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Iceberg partition transforms (SURVEY §2.6; wire enum
  * `core/proto/iceberg.proto:18-46`, decode `parser/proto.rs:334-377`).
  *
  * All but `bucket` compose from built-in (codegen'd) Spark functions.
  * `bucket` needs the Iceberg-spec murmur3 — a custom [[IcebergBucket]]
  * expression with full whole-stage-codegen support (`doGenCode` emits a
  * static call, so the hot path never leaves generated Java).
  */
object IcebergTransforms {

  /** T1 Identity. */
  def identityT(c: Column): Column = c

  /** T2 Year: years since 1970 of a date/timestamp. */
  def yearsT(c: Column): Column = (year(c) - lit(1970)).cast("int")

  /** T3 Month: months since 1970-01. */
  def monthsT(c: Column): Column =
    ((year(c) - lit(1970)) * lit(12) + month(c) - lit(1)).cast("int")

  /** T4 Day: days since 1970-01-01. */
  def daysT(c: Column): Column = datediff(c, to_date(lit("1970-01-01")))

  /** T5 Hour: hours since epoch (timestamp interpreted in session TZ=UTC). */
  def hoursT(c: Column): Column =
    floor(unix_timestamp(c) / lit(3600)).cast("int")

  /** T6 Bucket(n): Iceberg murmur3 bucket (spec-exact hash). */
  def bucketT(n: Int, c: Column): Column =
    ColumnBridge.column(IcebergBucket(ColumnBridge.expression(c), n))

  /** T7 Truncate(w): string prefix / integral floor-to-width. The final
    * subtraction uses LEGACY (wrapping) semantics: for source values
    * within w of Long.MinValue the true floor is unrepresentable and
    * Iceberg's own Java impl wraps — an ANSI subtract would instead FAIL
    * the whole write for one extreme row. The wrap is consistent across
    * the fanout writer, the lookup projection ([[graft.sources.dsv2
    * .GraftV2Functions]]), and the pruner's near-wrap keep-guard.
    */
  def truncateT(w: Int, c: Column, isString: Boolean): Column =
    if (isString) substring(c, 1, w)
    else {
      val m = ((c % w) + w) % w
      ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.Subtract(
          ColumnBridge.expression(c), ColumnBridge.expression(m),
          org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
    }

  /** T8 Void: always null, typed as the source column (Iceberg's void keeps
    * the source type so partitioned writes stay schema-stable).
    */
  def voidT(c: Column): Column =
    // `when(false, c)` is always-null typed as c, resolved lazily by the
    // analyzer (c may be an unresolved attribute here) and constant-folded
    // to a typed null literal by the optimizer.
    when(lit(false), c)
}

/** `bucket[numBuckets]` as a native Catalyst expression.
  *
  * `(murmur3_x86_32(encode(v)) & Int.MaxValue) % numBuckets`, with the
  * type-specific encodings of the Iceberg spec. Null in → null out
  * (`nullIntolerant`).
  */
case class IcebergBucket(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
        StringType | BinaryType | _: DecimalType =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket does not support type ${t.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType => IcebergMurmur3.bucketLong(v.asInstanceOf[Int].toLong, numBuckets)
    case LongType | TimestampType | TimestampNTZType => IcebergMurmur3.bucketLong(v.asInstanceOf[Long], numBuckets)
    case StringType => IcebergMurmur3.bucketUTF8(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], numBuckets)
    case BinaryType => IcebergMurmur3.bucketBytes(v.asInstanceOf[Array[Byte]], numBuckets)
    case _: DecimalType => IcebergMurmur3.bucketDecimal(v.asInstanceOf[Decimal], numBuckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = "graft.functions.IcebergMurmur3"
    defineCodeGen(ctx, ev, c => child.dataType match {
      case IntegerType | DateType => s"$m.bucketLong((long)$c, $numBuckets)"
      case LongType | TimestampType | TimestampNTZType => s"$m.bucketLong($c, $numBuckets)"
      case StringType => s"$m.bucketUTF8($c, $numBuckets)"
      case BinaryType => s"$m.bucketBytes($c, $numBuckets)"
      case _: DecimalType => s"$m.bucketDecimal($c, $numBuckets)"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}
