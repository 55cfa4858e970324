package graft.sources

import graft.sources.CompactionRunner.DataFileStats
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types.StructType

import scala.jdk.CollectionConverters._

/** Spec-shaped Iceberg manifest emission: the commit's file inventory as an
  * Avro container of manifest entries, mirroring the structures a real
  * catalog writes (Iceberg spec "Manifests"; the reference materializes the
  * same `DataFile` metadata before its catalog commit,
  * `core/src/parser/proto.rs:404-434`):
  *
  *   - `status` 1 = ADDED, 2 = DELETED (existing files don't occur in a
  *     full-compaction commit);
  *   - `data_file` with the spec's field names (`file_path`, `file_format`,
  *     `record_count`, `file_size_in_bytes`, `null_value_counts`,
  *     `lower_bounds`, `upper_bounds`), bounds/counts keyed by **field id**
  *     as arrays of `{key, value}` structs exactly like the spec's k/v maps.
  *
  * Documented deviation: bound values are the column's string rendering,
  * not Iceberg's single-value binary serialization — the pruning contract
  * ([[CompactionRunner.pruneByStats]]) consumes the same numbers either
  * way, and the dump stays engine/debugger-readable.
  */
object IcebergManifest {

  final case class ManifestEntry(
      status: Int,
      file: DataFileStats,
      format: String = "parquet")

  val StatusAdded = 1
  val StatusDeleted = 2

  private def kvSchema(name: String, valueType: Schema): Schema =
    SchemaBuilder.array().items(
      SchemaBuilder.record(name).fields()
        .requiredInt("key")
        .name("value").`type`(valueType).noDefault()
        .endRecord())

  private val EntrySchema: Schema = {
    val str = Schema.create(Schema.Type.STRING)
    val lng = Schema.create(Schema.Type.LONG)
    SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status")
      .name("data_file").`type`(SchemaBuilder.record("data_file").fields()
        .requiredString("file_path")
        .requiredString("file_format")
        .requiredLong("record_count")
        .requiredLong("file_size_in_bytes")
        .name("null_value_counts").`type`(kvSchema("null_count_kv", lng)).noDefault()
        .name("lower_bounds").`type`(kvSchema("lower_bound_kv", str)).noDefault()
        .name("upper_bounds").`type`(kvSchema("upper_bound_kv", str)).noDefault()
        .endRecord()).noDefault()
      .endRecord()
  }

  /** Resolve each stats column to its field id via the written schema's
    * `parquet.field.id` metadata. Id-less fields fall back to NEGATIVE
    * positions `-(i+1)`: a positive fallback could collide with another
    * field's REAL id (e.g. a gap left by a dropped column), silently
    * crossing bounds between columns on read. Write and read share the
    * convention, so round-trips stay exact.
    */
  private def idFor(schema: StructType, name: String): Int =
    schema.fields.zipWithIndex.collectFirst {
      case (f, i) if f.name == name =>
        FieldIds.idOf(f).getOrElse(-(i + 1))
    }.getOrElse(throw new IllegalArgumentException(s"no field '$name' in schema"))

  def write(
      path: String,
      entries: Seq[ManifestEntry],
      schema: StructType,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = {
    val dfSchema = EntrySchema.getField("data_file").schema()
    // one helper for all three k/v lists — avro's put accepts both long and
    // string values; the id resolution and ordering must not drift apart
    def kvRecords(field: String, m: Map[String, Any]): java.util.List[GenericRecord] =
      m.toSeq.sortBy(_._1).map { case (col, v) =>
        val r = new GenericData.Record(
          dfSchema.getField(field).schema().getElementType)
        r.put("key", idFor(schema, col))
        r.put("value", v)
        r: GenericRecord
      }.asJava
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](EntrySchema))
    // scheme-aware: the manifest must land wherever the data files did
    val hp = new org.apache.hadoop.fs.Path(path)
    w.create(EntrySchema, hp.getFileSystem(conf).create(hp, true))
    try entries.foreach { e =>
      val df = new GenericData.Record(dfSchema)
      df.put("file_path", e.file.path)
      df.put("file_format", e.format)
      df.put("record_count", e.file.recordCount)
      df.put("file_size_in_bytes", e.file.sizeBytes)
      df.put("null_value_counts", kvRecords("null_value_counts", e.file.nullCounts))
      df.put("lower_bounds", kvRecords("lower_bounds", e.file.colMins))
      df.put("upper_bounds", kvRecords("upper_bounds", e.file.colMaxs))
      val rec = new GenericData.Record(EntrySchema)
      rec.put("status", e.status)
      rec.put("data_file", df)
      w.append(rec)
    } finally w.close()
  }

  /** Read a manifest back into entries, resolving field ids to names via
    * `schema` — the inverse of [[write]], and the structure
    * [[CompactionRunner.pruneByStats]] consumes.
    */
  def read(
      path: String,
      schema: StructType,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Seq[ManifestEntry] = {
    val idToName: Map[Int, String] =
      schema.fields.zipWithIndex.map { case (f, i) =>
        FieldIds.idOf(f).getOrElse(-(i + 1)) -> f.name
      }.toMap
    // scheme-aware like write(): a manifest the compactor lands on s3a/hdfs
    // must be readable back through the same FileSystem, not java.io.File
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(conf)
    val fileLen = fs.getFileStatus(hp).getLen
    val in = fs.open(hp)
    val seekable = new org.apache.avro.file.SeekableInput {
      override def read(b: Array[Byte], off: Int, len: Int): Int = in.read(b, off, len)
      override def seek(p: Long): Unit = in.seek(p)
      override def tell(): Long = in.getPos
      override def length(): Long = fileLen
      override def close(): Unit = in.close()
    }
    val r = new DataFileReader(seekable,
      new GenericDatumReader[GenericRecord](EntrySchema))
    try r.iterator().asScala.map { rec =>
      val df = rec.get("data_file").asInstanceOf[GenericRecord]
      def kv(field: String): Map[String, String] =
        df.get(field).asInstanceOf[java.util.List[GenericRecord]].asScala.map { e =>
          idToName(e.get("key").asInstanceOf[Int]) -> e.get("value").toString
        }.toMap
      val nulls =
        df.get("null_value_counts").asInstanceOf[java.util.List[GenericRecord]]
          .asScala.map { e =>
            idToName(e.get("key").asInstanceOf[Int]) ->
              e.get("value").asInstanceOf[Long]
          }.toMap
      ManifestEntry(
        status = rec.get("status").asInstanceOf[Int],
        file = DataFileStats(
          path = df.get("file_path").toString,
          sizeBytes = df.get("file_size_in_bytes").asInstanceOf[Long],
          recordCount = df.get("record_count").asInstanceOf[Long],
          colMins = kv("lower_bounds"),
          colMaxs = kv("upper_bounds"),
          nullCounts = nulls),
        format = df.get("file_format").toString)
    }.toList
    finally r.close()
  }
}
