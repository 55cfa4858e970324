package graft.sources

import graft.operators.MorPlanner
import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Distributed Avro container-file reader built directly on the avro-1.12
  * runtime jars that ship with the Spark distribution (the `spark-avro`
  * DataSource connector is NOT on this environment's classpath, so S2's
  * third wire format — decoded by the reference alongside parquet/ORC at
  * `core/src/parser/proto.rs:282-289` — gets a real read path here instead
  * of a dispatch stub).
  *
  * Scale shape:
  *   - ONE Spark task per file (`parallelize` over the file list), each
  *     task streaming records through Hadoop `FsInput` — works against any
  *     Hadoop-visible filesystem, not just local disk.
  *   - The two scan-time hidden columns (canonical file path + 0-based row
  *     position) are fabricated inline during the single forward pass —
  *     exactly the reference's running `index_start += batch.num_rows()`
  *     (`iceberg_file_task_scan.rs:283-314`). Zero shuffle, unlike the
  *     per-file window fallback the ORC path needs.
  *   - Schema comes from the first file's self-describing container header
  *     (driver-side header read only — no data). All files of one task
  *     group share the table schema, and each task re-resolves records
  *     against it via avro schema resolution, so column order differences
  *     between files are handled.
  *
  * Type bridge: the full wire-type tree of the reference's proto schema
  * (`core/proto/iceberg.proto:63-110`) — primitives, nested
  * record/array/map, `[null, T]` unions as nullable, and the logical types
  * date (→ DateType), timestamp-millis/micros (→ TimestampType), and
  * decimal (→ DecimalType(p,s)).
  */
object AvroScan {

  /** Avro record schema → Spark StructType. */
  def toStructType(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"top-level avro type must be record, got ${avro.getType}")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = fieldType(f.schema())
      StructField(f.name(), t, nullable)
    })
  }

  /** Unwrap `[null, T]` → (T, nullable). */
  private def nonNull(s: Schema): (Schema, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"only [null, T] unions are supported, got $s")
      (branches.head, true)
    case _ => (s, false)
  }

  private def logicalName(s: Schema): String =
    Option(s.getLogicalType).map(_.getName).getOrElse("")

  private def fieldType(s: Schema): (DataType, Boolean) = {
    val (b, nullable) = nonNull(s)
    val t = (b.getType, logicalName(b)) match {
      case (Schema.Type.INT, "date") => DateType
      case (Schema.Type.LONG, "timestamp-micros") => TimestampType
      case (Schema.Type.LONG, "timestamp-millis") => TimestampType
      case (Schema.Type.BYTES | Schema.Type.FIXED, "decimal") =>
        val d = b.getLogicalType.asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
        DecimalType(d.getPrecision, d.getScale)
      case (Schema.Type.BOOLEAN, _) => BooleanType
      case (Schema.Type.INT, _) => IntegerType
      case (Schema.Type.LONG, _) => LongType
      case (Schema.Type.FLOAT, _) => FloatType
      case (Schema.Type.DOUBLE, _) => DoubleType
      case (Schema.Type.STRING, _) => StringType
      case (Schema.Type.BYTES, _) => BinaryType
      case (Schema.Type.FIXED, _) => BinaryType
      case (Schema.Type.RECORD, _) => toStructType(b)
      case (Schema.Type.ARRAY, _) =>
        val (et, en) = fieldType(b.getElementType)
        ArrayType(et, containsNull = en)
      case (Schema.Type.MAP, _) =>
        val (vt, vn) = fieldType(b.getValueType)
        MapType(StringType, vt, valueContainsNull = vn)
      case (other, _) =>
        throw new IllegalArgumentException(s"unsupported avro type: $other")
    }
    (t, nullable)
  }

  private def bytesOf(v: Any): Array[Byte] = v match {
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
  }

  /** Schema-directed value converter, avro runtime value → Spark external
    * Row value (java.sql date/timestamp, java BigDecimal, nested Row/Seq/Map).
    */
  private def converter(s: Schema): Any => Any = {
    val (b, _) = nonNull(s)
    (b.getType, logicalName(b)) match {
      case (Schema.Type.INT, "date") =>
        v => if (v == null) null
          else java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case (Schema.Type.LONG, "timestamp-micros") =>
        v => if (v == null) null else {
          val us = v.asInstanceOf[Long]
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
        }
      case (Schema.Type.LONG, "timestamp-millis") =>
        v => if (v == null) null
          else java.sql.Timestamp.from(
            java.time.Instant.ofEpochMilli(v.asInstanceOf[Long]))
      case (Schema.Type.BYTES | Schema.Type.FIXED, "decimal") =>
        val scale = b.getLogicalType
          .asInstanceOf[org.apache.avro.LogicalTypes.Decimal].getScale
        v => if (v == null) null
          else new java.math.BigDecimal(
            new java.math.BigInteger(bytesOf(v)), scale)
      case (Schema.Type.RECORD, _) =>
        val fieldConvs = b.getFields.asScala.map(f => converter(f.schema())).toArray
        v => if (v == null) null else {
          val rec = v.asInstanceOf[GenericRecord]
          Row.fromSeq(fieldConvs.indices.map(i => fieldConvs(i)(rec.get(i))))
        }
      case (Schema.Type.ARRAY, _) =>
        val ec = converter(b.getElementType)
        v => if (v == null) null
          else v.asInstanceOf[java.util.Collection[Any]].asScala.map(ec).toSeq
      case (Schema.Type.MAP, _) =>
        val vc = converter(b.getValueType)
        v => if (v == null) null
          else v.asInstanceOf[java.util.Map[Any, Any]].asScala
            .map { case (k, vv) => k.toString -> vc(vv) }.toMap
      case (Schema.Type.STRING, _) =>
        v => if (v == null) null else v.toString
      case (Schema.Type.BYTES | Schema.Type.FIXED, _) =>
        v => if (v == null) null else bytesOf(v)
      case _ => identity[Any]
    }
  }

  /** Read avro container files, appending `sys_hidden_file_path` (canonical
    * task-path rendering, matching `_metadata.file_path`) and
    * `sys_hidden_pos` (0-based per-file row index) during the scan itself.
    * Sequence numbers attach later via the shared broadcast join in
    * [[CompactionRunner.scanWithHiddenCols]].
    */
  def readWithHiddenCols(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no avro files to read")
    // the SESSION's Hadoop conf (spark.hadoop.* / fs.* overrides included),
    // serialized for the executor-side readers — a bare `new Configuration()`
    // only sees classpath defaults and loses e.g. s3a credentials
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val head = new DataFileReader(
      new FsInput(new Path(paths.head), serConf.value),
      new GenericDatumReader[GenericRecord]())
    val avroSchema = try head.getSchema finally head.close()
    val userSchema = toStructType(avroSchema)
    val schemaJson = avroSchema.toString
    val outSchema = userSchema
      .add(StructField(MorPlanner.FilePathCol, StringType, nullable = false))
      .add(StructField(MorPlanner.PosCol, LongType, nullable = false))
    val n = userSchema.size
    val rows = spark.sparkContext
      .parallelize(paths, paths.size)
      .flatMap { p =>
        val expected = new Schema.Parser().parse(schemaJson)
        val reader = new DataFileReader(
          new FsInput(new Path(p), serConf.value),
          new GenericDatumReader[GenericRecord](expected))
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; reader.close() }
        // Close on TASK COMPLETION, not just iterator exhaustion: an early-
        // terminating consumer (limit, head, failed task) never drives
        // hasNext to false, and a leaked FsInput fd per file would
        // accumulate for the executor's lifetime.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        val convs = expected.getFields.asScala.map(f => converter(f.schema())).toArray
        val canon = CompactionRunner.canonPath(p)
        var pos = -1L
        val base = reader.iterator().asScala.map { rec =>
          pos += 1
          val vals = new Array[Any](n + 2)
          var i = 0
          while (i < n) { vals(i) = convs(i)(rec.get(i)); i += 1 }
          vals(n) = canon
          vals(n + 1) = pos
          Row.fromSeq(vals.toIndexedSeq)
        }
        new Iterator[Row] { // still close eagerly on exhaustion
          def hasNext: Boolean = {
            val h = base.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): Row = base.next()
        }
      }
    spark.createDataFrame(rows, outSchema)
  }
}
