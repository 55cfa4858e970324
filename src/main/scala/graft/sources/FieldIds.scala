package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Field-ID schema discipline (SURVEY §1.3): Iceberg identifies columns by
  * globally numbered field IDs, and projection — eq-delete columns
  * especially — is by ID, not name (`core/src/parser/proto.rs:125,137-142`).
  * Spark's analog is the `parquet.field.id` key in `StructField.metadata`:
  * the parquet writer persists it into the file footer
  * (`spark.sql.parquet.fieldId.write.enabled`, default on) and the reader
  * surfaces it back into the scan schema, so IDs survive a write→read
  * round-trip and column renames between files.
  */
object FieldIds {

  /** Spark's parquet field-id metadata key (ParquetUtils contract). */
  val MetaKey = "parquet.field.id"

  def idOf(f: StructField): Option[Int] =
    if (f.metadata.contains(MetaKey)) Some(f.metadata.getLong(MetaKey).toInt)
    else None

  /** Name of the field carrying `id`, if any. */
  def nameById(schema: StructType, id: Int): Option[String] =
    schema.fields.find(f => idOf(f).contains(id)).map(_.name)

  private def withId(m: Metadata, id: Int): Metadata =
    new MetadataBuilder().withMetadata(m).putLong(MetaKey, id.toLong).build()

  /** `f` stamped with exactly `id` (schema-evolution helpers mint fresh
    * ids for ADDED columns; renames keep theirs).
    */
  def withFieldId(f: StructField, id: Int): StructField =
    f.copy(metadata = withId(f.metadata, id))

  /** Stamp sequential 1-based ids onto top-level fields that lack one;
    * fields that already carry an id keep it.
    */
  def stamp(schema: StructType): StructType = {
    var next = schema.fields.flatMap(idOf).foldLeft(0)(math.max) // resume after max
    StructType(schema.fields.map { f =>
      if (idOf(f).isDefined) f
      else { next += 1; f.copy(metadata = withId(f.metadata, next)) }
    })
  }

  /** Re-alias every column with its (possibly freshly stamped) field-id
    * metadata — a pure projection, stays inside whole-stage codegen.
    */
  def withFieldIds(df: DataFrame): DataFrame = {
    val stamped = stamp(df.schema)
    df.select(stamped.fields.map(f => col(f.name).as(f.name, f.metadata)).toSeq: _*)
  }

  /** Drop field-id metadata from every top-level field. A read schema that
    * CARRIES ids demands them from every parquet footer it touches — a
    * table whose generations mix id-stamped files (compaction outputs)
    * with id-less ones (plain appends against a schema-less catalog) then
    * fails to scan. Stripping the ids switches the whole read to name
    * resolution, the documented fallback when no canonical schema governs.
    */
  def stripIds(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (!f.metadata.contains(MetaKey)) f
      else {
        val kept = new MetadataBuilder().withMetadata(f.metadata)
          .remove(MetaKey).build()
        f.copy(metadata = kept)
      }
    })

  /** Align a DataFrame to a canonical schema's ids by NAME: each column that
    * the canonical schema also has takes that field's metadata (so an
    * upsert/append writes the table's current ids into its files); columns
    * the canonical schema doesn't know keep their own. Pure projection.
    */
  def alignToSchema(df: DataFrame, canonical: StructType): DataFrame =
    df.select(df.schema.fields.map { f =>
      canonical.fields.find(_.name == f.name) match {
        case Some(cf) => col(f.name).as(f.name, cf.metadata)
        case None => col(f.name)
      }
    }.toSeq: _*)
}
