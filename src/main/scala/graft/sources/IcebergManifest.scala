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
  * `core/src/parser/proto.rs:404-434`, and its wire `DataFile` message
  * carries the same `content` discriminator, `core/proto/iceberg.proto`):
  *
  *   - `status` 1 = ADDED, 2 = DELETED (existing files don't occur in a
  *     full-compaction commit);
  *   - `data_file` with the spec's field names (`file_path`, `file_format`,
  *     `record_count`, `file_size_in_bytes`, `null_value_counts`,
  *     `lower_bounds`, `upper_bounds`), bounds/counts keyed by **field id**
  *     as arrays of `{key, value}` structs exactly like the spec's k/v maps;
  *   - v3 delete-file fields: `content` (0 = data, 1 = position deletes,
  *     2 = equality deletes), `equality_ids` for eq-delete files, and the
  *     deletion-vector reference triple `referenced_data_file` /
  *     `content_offset` / `content_size_in_bytes` locating one DV blob
  *     inside its Puffin sidecar — so a stock v3 reader can DISCOVER the
  *     vectors through exported metadata, not merely decode them;
  *   - `sequence_number`, the entry's data sequence number (delete
  *     applicability: a delete applies to strictly older data files).
  *
  * All v3 fields carry Avro defaults, so manifests written before round 15
  * read back unchanged (schema resolution fills content = 0).
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
      format: String = "parquet",
      content: Int = ContentData,
      sequenceNumber: Long = 0L,
      equalityIds: Seq[Int] = Nil,
      referencedDataFile: Option[String] = None,
      contentOffset: Option[Long] = None,
      contentSizeInBytes: Option[Long] = None)

  val StatusAdded = 1
  val StatusDeleted = 2

  /** The spec's `content` values for a data_file entry. */
  val ContentData = 0
  val ContentPositionDeletes = 1
  val ContentEqualityDeletes = 2

  /** One manifest file's row in a manifest list (spec "Manifest Lists",
    * the v2 required fields): where the manifest is, whether it inventories
    * data or delete files, and its summary counts — what a planner reads
    * to decide whether to open the manifest at all.
    */
  final case class ManifestFile(
      manifestPath: String,
      manifestLength: Long,
      partitionSpecId: Int,
      content: Int, // 0 = data manifest, 1 = delete manifest
      sequenceNumber: Long,
      minSequenceNumber: Long,
      addedSnapshotId: Long,
      addedFilesCount: Int,
      existingFilesCount: Int,
      deletedFilesCount: Int,
      addedRowsCount: Long,
      existingRowsCount: Long,
      deletedRowsCount: Long)

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
      // v3 additions default so pre-round-15 manifests resolve cleanly
      .name("sequence_number").`type`().longType().longDefault(0L)
      .name("data_file").`type`(SchemaBuilder.record("data_file").fields()
        .name("content").`type`().intType().intDefault(ContentData)
        .requiredString("file_path")
        .requiredString("file_format")
        .requiredLong("record_count")
        .requiredLong("file_size_in_bytes")
        .name("null_value_counts").`type`(kvSchema("null_count_kv", lng)).noDefault()
        .name("lower_bounds").`type`(kvSchema("lower_bound_kv", str)).noDefault()
        .name("upper_bounds").`type`(kvSchema("upper_bound_kv", str)).noDefault()
        .name("equality_ids").`type`().array().items().intType()
        .arrayDefault(java.util.Collections.emptyList[Integer]())
        .name("referenced_data_file").`type`().optional().stringType()
        .name("content_offset").`type`().optional().longType()
        .name("content_size_in_bytes").`type`().optional().longType()
        .endRecord()).noDefault()
      .endRecord()
  }

  /** Manifest-list rows (spec "Manifest Lists", v2 required fields). */
  private val ListSchema: Schema =
    SchemaBuilder.record("manifest_file").fields()
      .requiredString("manifest_path")
      .requiredLong("manifest_length")
      .requiredInt("partition_spec_id")
      .name("content").`type`().intType().intDefault(0)
      .name("sequence_number").`type`().longType().longDefault(0L)
      .name("min_sequence_number").`type`().longType().longDefault(0L)
      .requiredLong("added_snapshot_id")
      .requiredInt("added_files_count")
      .requiredInt("existing_files_count")
      .requiredInt("deleted_files_count")
      .requiredLong("added_rows_count")
      .requiredLong("existing_rows_count")
      .requiredLong("deleted_rows_count")
      .endRecord()

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
      df.put("content", e.content)
      df.put("file_path", e.file.path)
      df.put("file_format", e.format)
      df.put("record_count", e.file.recordCount)
      df.put("file_size_in_bytes", e.file.sizeBytes)
      df.put("null_value_counts", kvRecords("null_value_counts", e.file.nullCounts))
      df.put("lower_bounds", kvRecords("lower_bounds", e.file.colMins))
      df.put("upper_bounds", kvRecords("upper_bounds", e.file.colMaxs))
      df.put("equality_ids",
        e.equalityIds.map(Integer.valueOf).asJava)
      df.put("referenced_data_file", e.referencedDataFile.orNull)
      df.put("content_offset",
        e.contentOffset.map(java.lang.Long.valueOf).orNull)
      df.put("content_size_in_bytes",
        e.contentSizeInBytes.map(java.lang.Long.valueOf).orNull)
      val rec = new GenericData.Record(EntrySchema)
      rec.put("status", e.status)
      rec.put("sequence_number", e.sequenceNumber)
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
    val r = openReader(path, conf, EntrySchema)
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
      def optLong(field: String): Option[Long] =
        Option(df.get(field)).map(_.asInstanceOf[Long])
      ManifestEntry(
        status = rec.get("status").asInstanceOf[Int],
        file = DataFileStats(
          path = df.get("file_path").toString,
          sizeBytes = df.get("file_size_in_bytes").asInstanceOf[Long],
          recordCount = df.get("record_count").asInstanceOf[Long],
          colMins = kv("lower_bounds"),
          colMaxs = kv("upper_bounds"),
          nullCounts = nulls),
        format = df.get("file_format").toString,
        content = df.get("content").asInstanceOf[Int],
        sequenceNumber = rec.get("sequence_number").asInstanceOf[Long],
        equalityIds = df.get("equality_ids")
          .asInstanceOf[java.util.List[Integer]].asScala.map(_.intValue).toSeq,
        referencedDataFile = Option(df.get("referenced_data_file")).map(_.toString),
        contentOffset = optLong("content_offset"),
        contentSizeInBytes = optLong("content_size_in_bytes"))
    }.toList
    finally r.close()
  }

  /** Write a manifest list — the hop between a snapshot's `manifest-list`
    * pointer in `metadata.json` and its manifests.
    */
  def writeList(
      path: String,
      manifests: Seq[ManifestFile],
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](ListSchema))
    val hp = new org.apache.hadoop.fs.Path(path)
    w.create(ListSchema, hp.getFileSystem(conf).create(hp, true))
    try manifests.foreach { m =>
      val rec = new GenericData.Record(ListSchema)
      rec.put("manifest_path", m.manifestPath)
      rec.put("manifest_length", m.manifestLength)
      rec.put("partition_spec_id", m.partitionSpecId)
      rec.put("content", m.content)
      rec.put("sequence_number", m.sequenceNumber)
      rec.put("min_sequence_number", m.minSequenceNumber)
      rec.put("added_snapshot_id", m.addedSnapshotId)
      rec.put("added_files_count", m.addedFilesCount)
      rec.put("existing_files_count", m.existingFilesCount)
      rec.put("deleted_files_count", m.deletedFilesCount)
      rec.put("added_rows_count", m.addedRowsCount)
      rec.put("existing_rows_count", m.existingRowsCount)
      rec.put("deleted_rows_count", m.deletedRowsCount)
      w.append(rec)
    } finally w.close()
  }

  /** Read a manifest list back — the inverse of [[writeList]]. */
  def readList(
      path: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Seq[ManifestFile] = {
    val r = openReader(path, conf, ListSchema)
    try r.iterator().asScala.map { rec =>
      ManifestFile(
        manifestPath = rec.get("manifest_path").toString,
        manifestLength = rec.get("manifest_length").asInstanceOf[Long],
        partitionSpecId = rec.get("partition_spec_id").asInstanceOf[Int],
        content = rec.get("content").asInstanceOf[Int],
        sequenceNumber = rec.get("sequence_number").asInstanceOf[Long],
        minSequenceNumber = rec.get("min_sequence_number").asInstanceOf[Long],
        addedSnapshotId = rec.get("added_snapshot_id").asInstanceOf[Long],
        addedFilesCount = rec.get("added_files_count").asInstanceOf[Int],
        existingFilesCount = rec.get("existing_files_count").asInstanceOf[Int],
        deletedFilesCount = rec.get("deleted_files_count").asInstanceOf[Int],
        addedRowsCount = rec.get("added_rows_count").asInstanceOf[Long],
        existingRowsCount = rec.get("existing_rows_count").asInstanceOf[Long],
        deletedRowsCount = rec.get("deleted_rows_count").asInstanceOf[Long])
    }.toList
    finally r.close()
  }

  /** Scheme-aware Avro container reader over a Hadoop FileSystem — a
    * manifest the compactor lands on s3a/hdfs must be readable back
    * through the same FileSystem, not java.io.File. The file's embedded
    * writer schema resolves against `expected` (the CURRENT schema), so
    * pre-v3 manifests fill the new fields from their defaults.
    */
  private def openReader(
      path: String,
      conf: org.apache.hadoop.conf.Configuration,
      expected: Schema): DataFileReader[GenericRecord] = {
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
    new DataFileReader(seekable, new GenericDatumReader[GenericRecord](expected))
  }
}
