package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.types._

/** Iceberg v2 `metadata.json` EXPORT for [[GraftCatalog]] tables — the
  * interop doorway for external Iceberg tooling: the catalog's snapshot
  * chain, per-snapshot canonical schemas (field ids included), and HEAD
  * render as a spec-shaped table-metadata document
  * (format per the public Iceberg table spec, "Table Metadata" fields;
  * the reference consumes the same structures through `iceberg-rust`).
  *
  * Deviations, documented: the `manifest-list` of each snapshot points at
  * the catalog's `snap-N.tsv` (this catalog's manifest-list stand-in;
  * [[IcebergManifest]] covers the Avro manifest shape separately), and
  * `sequence-number` equals the snapshot id (commits are totally ordered).
  */
object IcebergMetadataJson {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Spark → Iceberg type names (spec "Schemas and Data Types"). Nested
    * types render as nested JSON objects; field ids for nested levels are
    * not tracked by this catalog and render as 0 (top-level ids are real).
    */
  private def icebergType(dt: DataType): String = dt match {
    case BooleanType => "\"boolean\""
    case IntegerType | ShortType | ByteType => "\"int\""
    case LongType => "\"long\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case DateType => "\"date\""
    case TimestampType => "\"timestamptz\""
    case TimestampNTZType => "\"timestamp\""
    case StringType => "\"string\""
    case BinaryType => "\"binary\""
    case d: DecimalType => s""""decimal(${d.precision}, ${d.scale})""""
    case a: ArrayType =>
      s"""{"type":"list","element-id":0,"element":${icebergType(a.elementType)},""" +
        s""""element-required":${!a.containsNull}}"""
    case m: MapType =>
      s"""{"type":"map","key-id":0,"key":${icebergType(m.keyType)},""" +
        s""""value-id":0,"value":${icebergType(m.valueType)},""" +
        s""""value-required":${!m.valueContainsNull}}"""
    case s: StructType =>
      s"""{"type":"struct","fields":[${structFields(s)}]}"""
    case other =>
      throw GraftError.Metadata(s"no Iceberg rendering for ${other.catalogString}")
  }

  private def structFields(s: StructType): String =
    s.fields.map { f =>
      val id = FieldIds.idOf(f).getOrElse(0)
      s"""{"id":$id,"name":"${esc(f.name)}","required":${!f.nullable},""" +
        s""""type":${icebergType(f.dataType)}}"""
    }.mkString(",")

  private def schemaJson(id: Long, s: StructType): String =
    s"""{"schema-id":$id,"type":"struct","fields":[${structFields(s)}]}"""

  /** Write `vN.metadata.json` (N = current snapshot id) into the table
    * directory and return its path.
    */
  def export(catalog: GraftCatalog, root: String, table: String): Path = {
    val dir = Paths.get(root, table)
    val head = catalog.currentSnapshotId(table)
    val ids = catalog.snapshotIds(table)
    val schemas = ids.flatMap(id => catalog.schemaAt(table, id).map(id -> _))
    val currentSchemaId = schemas.collect { case (id, _) if id <= head => id }
      .maxOption.getOrElse(0L)
    // spec: highest column id ever ASSIGNED (all schemas, not just current)
    // — an external writer allocates last-column-id + 1 for its next column,
    // and a dropped column's id must never be reachable that way
    val lastColumnId = schemas
      .flatMap { case (_, s) => s.fields.flatMap(FieldIds.idOf) }
      .maxOption.getOrElse(0)
    def mtime(id: Long): Long =
      try Files.getLastModifiedTime(dir.resolve(s"snap-$id.tsv")).toMillis
      catch { case _: Exception => 0L }
    val snapshots = ids.map { id =>
      val schemaRef = schemas.collect { case (sid, _) if sid <= id => sid }
        .maxOption.map(sid => s""","schema-id":$sid""").getOrElse("")
      s"""{"snapshot-id":$id,"sequence-number":$id,"timestamp-ms":${mtime(id)},""" +
        s""""manifest-list":"${esc(dir.resolve(s"snap-$id.tsv").toString)}",""" +
        s""""summary":{"operation":"append"}$schemaRef}"""
    }.mkString(",")
    val snapshotLog = ids.map(id =>
      s"""{"timestamp-ms":${mtime(id)},"snapshot-id":$id}""").mkString(",")
    val uuid = java.util.UUID.nameUUIDFromBytes(
      s"graft:$root/$table".getBytes("UTF-8"))
    val json =
      s"""{"format-version":2,
         |"table-uuid":"$uuid",
         |"location":"${esc(dir.toString)}",
         |"last-sequence-number":$head,
         |"last-updated-ms":${mtime(head)},
         |"last-column-id":$lastColumnId,
         |"current-schema-id":$currentSchemaId,
         |"schemas":[${schemas.map { case (id, s) => schemaJson(id, s) }.mkString(",")}],
         |"default-spec-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[]}],
         |"last-partition-id":999,
         |"default-sort-order-id":0,
         |"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":$head,
         |"snapshots":[$snapshots],
         |"snapshot-log":[$snapshotLog],
         |"metadata-log":[]}""".stripMargin
    val out = dir.resolve(s"v$head.metadata.json")
    Files.writeString(out, json)
    out
  }
}
