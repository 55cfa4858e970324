package graft.sources.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.functions.IcebergMurmur3

/** The partition transforms as Spark V2 CATALOG FUNCTIONS — what lets the
  * engine resolve a reported `KeyGroupedPartitioning(bucket(4, k))` into a
  * catalyst expression (`V2ExpressionUtils` loads the transform by name
  * from the table's `FunctionCatalog`) and therefore plan STORAGE-
  * PARTITIONED JOINS between co-partitioned tables. Exactly how
  * Iceberg-Spark ships its `system.bucket`/`truncate`/`years`/... —
  * and usable directly: `SELECT graft.system.bucket(4, k)`.
  *
  * Semantics MUST equal the write-side fanout transforms
  * ([[graft.functions.IcebergTransforms]]) bit for bit — the reported
  * partitioning claims "rows in this partition satisfy transform(src) =
  * key", and the join planner trusts it.
  */
object GraftV2Functions {

  val names: Seq[String] =
    Seq("bucket", "truncate", "years", "months", "days", "hours")

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketFunction)
    case "truncate" => Some(TruncateFunction)
    case "years" => Some(new TemporalFunction("years"))
    case "months" => Some(new TemporalFunction("months"))
    case "days" => Some(new TemporalFunction("days"))
    case "hours" => Some(new TemporalFunction("hours"))
    case _ => None
  }

  private def micros(v: Long): java.time.Instant =
    java.time.Instant.EPOCH.plus(v, java.time.temporal.ChronoUnit.MICROS)

  /** `bucket(n, col)` — Iceberg's murmur3 bucket (spec-exact hash). */
  object BucketFunction extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): Iceberg murmur3 bucket of col"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets, col), got ${inputType.catalogString}")
      require(inputType.fields.head.dataType == IntegerType,
        s"bucket's first argument is the integer bucket count")
      val colType = inputType.fields(1).dataType
      colType match {
        case IntegerType | LongType | DateType | TimestampType |
            TimestampNTZType | StringType => ()
        case t => throw new UnsupportedOperationException(
          s"bucket does not support ${t.catalogString}")
      }
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] =
          Array(IntegerType, colType)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = s"graft.bucket($colType)"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(0) || input.isNullAt(1)) return null
          val n = input.getInt(0)
          colType match {
            case IntegerType | DateType =>
              IcebergMurmur3.bucketLong(input.getInt(1).toLong, n)
            case LongType | TimestampType | TimestampNTZType =>
              IcebergMurmur3.bucketLong(input.getLong(1), n)
            case StringType =>
              IcebergMurmur3.bucketUTF8(input.getUTF8String(1), n)
            case _ => null
          }
        }
      }
    }
  }

  /** `truncate(w, col)` — string prefix / integral floor-to-width. */
  object TruncateFunction extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col): Iceberg truncate transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate takes (width, col), got ${inputType.catalogString}")
      require(inputType.fields.head.dataType == IntegerType,
        "truncate's first argument is the integer width")
      val colType = inputType.fields(1).dataType
      colType match {
        case IntegerType | LongType | StringType => ()
        case t => throw new UnsupportedOperationException(
          s"truncate does not support ${t.catalogString}")
      }
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] =
          Array(IntegerType, colType)
        override def resultType(): DataType = colType
        override def name(): String = "truncate"
        override def canonicalName(): String = s"graft.truncate($colType)"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Any = {
          if (input.isNullAt(0) || input.isNullAt(1)) return null
          val w = input.getInt(0)
          colType match {
            case IntegerType =>
              val v = input.getInt(1)
              Integer.valueOf(v - (((v % w) + w) % w))
            case LongType =>
              val v = input.getLong(1)
              java.lang.Long.valueOf(v - (((v % w) + w) % w))
            case StringType =>
              input.getUTF8String(1).substringSQL(1, w)
          }
        }
      }
    }
  }

  /** `years`/`months`/`days`/`hours` — units since epoch (UTC), matching
    * the write-side temporal transforms.
    */
  final class TemporalFunction(unit: String) extends UnboundFunction {
    override def name(): String = unit
    override def description(): String =
      s"$unit(col): Iceberg $unit-since-epoch transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$unit takes one date/timestamp argument, got ${inputType.catalogString}")
      val colType = inputType.fields.head.dataType
      colType match {
        case DateType | TimestampType | TimestampNTZType => ()
        case t => throw new UnsupportedOperationException(
          s"$unit does not support ${t.catalogString}")
      }
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(colType)
        override def resultType(): DataType = IntegerType
        override def name(): String = unit
        override def canonicalName(): String = s"graft.$unit($colType)"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Integer = {
          if (input.isNullAt(0)) return null
          // hours must FLOOR (the write side is floor(unix/3600)):
          // Duration.toHours truncates toward zero, which would put a
          // pre-epoch 23:30 in the wrong hour partition
          if (unit == "hours") return java.lang.Math.toIntExact(colType match {
            case DateType => input.getInt(0).toLong * 24L
            case _ => java.lang.Math.floorDiv(input.getLong(0), 3_600_000_000L)
          })
          val local: java.time.LocalDateTime = colType match {
            case DateType => java.time.LocalDate
              .ofEpochDay(input.getInt(0).toLong).atStartOfDay()
            case _ => java.time.LocalDateTime
              .ofInstant(micros(input.getLong(0)), java.time.ZoneOffset.UTC)
          }
          unit match {
            case "years" => local.getYear - 1970
            case "months" => (local.getYear - 1970) * 12 + local.getMonthValue - 1
            case "days" => java.lang.Math.toIntExact(
              local.toLocalDate.toEpochDay)
          }
        }
      }
    }
  }
}
