package graft.sources.dsv2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.GraftCatalog

import scala.jdk.CollectionConverters._

/** Iceberg's metadata tables through the DSv2 doorway:
  * `SELECT * FROM graft.db.t.files | .partitions | .snapshots | .history | .refs`
  * — read-only views over the catalog's snapshot documents
  * ([[GraftCatalog.metadataTable]], the same rows the `graft_meta` TVF
  * and the REST routes serve), rebuilt from metadata on every scan so
  * they always reflect the current snapshot. Driver-sized by
  * construction (manifest entries, never data rows) — at 100 TB these
  * stay metadata reads.
  */
final class GraftMetadataV2Table(
    root: String,
    parent: String,
    kind: String)
    extends Table
    with SupportsRead {

  private def df = new GraftCatalog(root)
    .metadataTable(SparkSession.active, parent, kind)

  override def name(): String = s"$parent.$kind"

  override lazy val schema: StructType = df.schema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def description(): String =
          s"GraftMetadataTable($parent.$kind)"
        override def toBatch: org.apache.spark.sql.connector.read.Batch =
          new GraftRddBatch(() => Seq(GraftRowGroup(null,
            org.apache.spark.sql.graftbridge.DatasetBridge.internalRowRdd(df))))
      }
    }
}

private[dsv2] object GraftMetadataV2Table {
  /** The metadata views servable per table (the catalog-level `tables`
    * listing stays a TVF — it has no parent table to hang off).
    */
  val Kinds: Set[String] =
    Set("files", "partitions", "snapshots", "history", "refs", "statistics")
}
