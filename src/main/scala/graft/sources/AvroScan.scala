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
  * Type bridge: the wire-primitive subset (boolean/int/long/float/double/
  * string/bytes/fixed, with `[null, T]` unions as nullable); nested records
  * would pass through the same GenericRecord→Row conversion.
  */
object AvroScan {

  /** Avro record schema → Spark StructType (primitive subset). */
  def toStructType(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"top-level avro type must be record, got ${avro.getType}")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = fieldType(f.schema())
      StructField(f.name(), t, nullable)
    })
  }

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"only [null, T] unions are supported, got $s")
      (fieldType(branches.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.FIXED => (BinaryType, false)
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  private def convert(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case f: org.apache.avro.generic.GenericFixed => f.bytes().clone()
    case other => other
  }

  /** Read avro container files, appending `sys_hidden_file_path` (canonical
    * task-path rendering, matching `_metadata.file_path`) and
    * `sys_hidden_pos` (0-based per-file row index) during the scan itself.
    * Sequence numbers attach later via the shared broadcast join in
    * [[CompactionRunner.scanWithHiddenCols]].
    */
  def readWithHiddenCols(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no avro files to read")
    val head = new DataFileReader(
      new FsInput(new Path(paths.head), new Configuration()),
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
          new FsInput(new Path(p), new Configuration()),
          new GenericDatumReader[GenericRecord](expected))
        val canon = CompactionRunner.canonPath(p)
        var pos = -1L
        val base = reader.iterator().asScala.map { rec =>
          pos += 1
          val vals = new Array[Any](n + 2)
          var i = 0
          while (i < n) { vals(i) = convert(rec.get(i)); i += 1 }
          vals(n) = canon
          vals(n + 1) = pos
          Row.fromSeq(vals.toIndexedSeq)
        }
        new Iterator[Row] { // close the container on exhaustion
          def hasNext: Boolean = {
            val h = base.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row = base.next()
        }
      }
    spark.createDataFrame(rows, outSchema)
  }
}
