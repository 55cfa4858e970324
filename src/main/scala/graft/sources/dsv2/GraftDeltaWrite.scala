package graft.sources.dsv2

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.graftbridge.ParquetWriteBridge
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.sources.{FieldIds, GraftCatalog}

/** DELTA-based (merge-on-read) row-level operation — the DSv2 write shape
  * that matches this engine's native MoR layout: instead of rewriting
  * whole files (copy-on-write, [[GraftRowLevelOperation]]), Spark's
  * `WriteDelta` plan hands each affected row to a [[GraftDeltaWriter]]
  * with its PHYSICAL identity (`_file`, `_pos` — the metadata columns the
  * scan exposes), and the commit lands position-delete files (suppressing
  * the old versions) plus data files (the new versions) in ONE snapshot.
  * At 100 TB this is the difference between rewriting a table to update a
  * row and writing a few KB of deletes — the reference's whole reason for
  * being (`datafusion_processor.rs:281-304` is the read side of exactly
  * these files).
  *
  * Selected per statement by the Iceberg table properties
  * `write.delete.mode` / `write.update.mode` / `write.merge.mode` =
  * `merge-on-read` ([[GraftV2Table.newRowLevelOperationBuilder]]);
  * copy-on-write remains the default, matching Iceberg.
  */
final class GraftDeltaRowLevelOperation(
    root: String,
    table: String,
    cmd: RowLevelOperation.Command,
    wapFork: Option[GraftWapFork] = None)
    extends RowLevelOperation with SupportsDelta {

  private val baseSnapshot =
    new GraftCatalog(root).currentSnapshotId(table)

  /** wap.branch's deferred fork ([[GraftWapFork]]): the scan reads
    * `table` (main, pinned), the delta commits onto the branch fork the
    * commit itself creates — resolved lazily so EXPLAIN of MoR DML never
    * mutates the catalog.
    */
  private lazy val commitBase: Long =
    wapFork.fold(baseSnapshot)(_.fork(baseSnapshot))
  private def commitTable: String = wapFork.fold(table)(_.commitTable)

  override def command(): RowLevelOperation.Command = cmd

  /** Row identity = the scan's physical-position metadata columns. */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val cat = new GraftCatalog(root)
    // schema from the PINNED snapshot, never the head: a schema-evolution
    // commit racing this statement would otherwise pair snapshot-N files
    // with snapshot-N+1's names (a rename then resolves to nulls and the
    // delta commits new row versions computed from them)
    val schema = FieldIds.stripIds(cat.schemaAt(table, baseSnapshot)
      .getOrElse(cat.scanTableAt(SparkSession.active, table, baseSnapshot).schema))
    // rowLevel = false: DELTA queries only touch MATCHING rows (plus the
    // residual Spark re-applies), so row-level filter application is SAFE
    // here — unlike copy-on-write, where the pushed condition is a group
    // hint and applying it to rows would drop the keep-set
    new GraftScanBuilder(root, table, Some(baseSnapshot), schema,
      rowLevel = false)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new GraftDeltaBatchWrite(root, commitTable, info.schema(),
            () => commitBase,
            prepare = () => { commitBase; () },
            metaTable = wapFork.map(_ => table))
      }
    }

  override def description(): String =
    s"GraftDeltaRowLevelOperation($cmd, $table @ $baseSnapshot, merge-on-read)"
}

/** Per-task parquet pair (data + position deletes), one locked commit.
  * `base` is a thunk evaluated inside [[commit]] after `prepare` runs —
  * the deferred wap.branch fork's head only exists by then; `metaTable`
  * names where schema/spec metadata reads go until the fork exists
  * (main — the fork is created as a copy of exactly that state).
  */
final class GraftDeltaBatchWrite(
    root: String,
    table: String,
    dataSchema: StructType,
    base: () => Long,
    prepare: () => Unit = () => (),
    metaTable: Option[String] = None)
    extends DeltaBatchWrite {

  private val dir =
    s"$root/_data/$table/v2delta-${java.util.UUID.randomUUID()}"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    val spark = SparkSession.active
    Files.createDirectories(Paths.get(dir))
    val cat = new GraftCatalog(root)
    val metaT =
      if (metaTable.isDefined && !cat.tableExists(table)) metaTable.get
      else table
    // footers carry the canonical ids; a declared partition spec fans the
    // NEW row versions out per tuple so they stay partition-prunable
    // (the delete half is position-keyed — no tuple applies)
    val writeSchema = cat.currentSchema(metaT)
      .fold(dataSchema)(graft.sources.FieldIds.adoptCanonicalIds(dataSchema, _))
    val spec = cat.partitionSpec(metaT)
    // a pure-DELETE delta carries NO data columns (only row ids for the
    // position-delete half) — nothing to fan out, so don't bind a layout
    // that would fail resolving the spec sources against an empty schema
    val layout =
      if (spec.isEmpty ||
          !spec.forall(f => writeSchema.fieldNames.contains(f.source))) None
      else Some(PartitionLayout.bind(spark, writeSchema, spec))
    val conf = ParquetWriteBridge.hadoopConfOf(spark)
    val (dataFactory, dataConf) =
      ParquetWriteBridge.prepare(spark, writeSchema, conf)
    val (posFactory, posConf) = ParquetWriteBridge.prepare(
      spark, GraftDeltaBatchWrite.PosDeleteSchema,
      ParquetWriteBridge.hadoopConfOf(spark))
    GraftDeltaWriterFactory(dir, writeSchema,
      dataFactory, dataConf, posFactory, posConf, layout)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val deltas = messages.collect { case d: GraftDeltaCommit => d }
    val dataFiles = deltas.flatMap(_.data).map(f =>
      GraftCatalog.AddedFile(f.path, "parquet", f.rows, f.bytes,
        f.colMins, f.colMaxs, f.nullCounts))
    val posFiles = deltas.flatMap(_.deletes).map(f =>
      GraftCatalog.AddedFile(f.path, "parquet", f.rows, f.bytes))
    // a no-match statement produces an EMPTY delta: nothing to commit,
    // the table stays at its head (no empty snapshot) — and the deferred
    // wap fork is NOT created for it either (prepare only runs when a
    // commit actually lands)
    if (dataFiles.nonEmpty || posFiles.nonEmpty) {
      prepare()
      new GraftCatalog(root).commitRowDelta(table, base(),
        dataFiles.toSeq, posFiles.toSeq)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftDeltaCommit(d, p) =>
        (d ++ p).foreach(f =>
          Files.deleteIfExists(Paths.get(f.path.stripPrefix("file:"))))
      case _ => ()
    }
}

object GraftDeltaBatchWrite {
  /** The layout every position-delete file in this catalog has. */
  val PosDeleteSchema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))
}

final case class GraftDeltaWriterFactory(
    dir: String,
    dataSchema: StructType,
    dataFactory: OutputWriterFactory,
    dataConf: SerializableConfiguration,
    posFactory: OutputWriterFactory,
    posConf: SerializableConfiguration,
    layout: Option[PartitionLayout] = None)
    extends DeltaWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(dir, dataSchema,
      dataFactory, dataConf, posFactory, posConf, partitionId, taskId, layout)
}

/** Streams inserts into a data file and deletes into a position-delete
  * file; an update is delete(old identity) + insert(new version). Files
  * open lazily — a task that only deletes writes no data file and vice
  * versa.
  */
final class GraftDeltaWriter(
    dir: String,
    dataSchema: StructType,
    dataFactory: OutputWriterFactory,
    dataConf: SerializableConfiguration,
    posFactory: OutputWriterFactory,
    posConf: SerializableConfiguration,
    partitionId: Int,
    taskId: Long,
    layout: Option[PartitionLayout] = None)
    extends DeltaWriter[InternalRow] {

  private lazy val tupleDir: Option[InternalRow => String] =
    layout.map(_.dirEvaluator())
  /** Open DATA writers by relative partition dir ("" = unpartitioned). */
  private val openData = scala.collection.mutable.LinkedHashMap
    .empty[String, GraftDataWriter.OpenFile]
  private def dataFileFor(rel: String): GraftDataWriter.OpenFile =
    openData.getOrElseUpdate(rel, {
      val d = if (rel.isEmpty) dir else s"$dir/$rel"
      Files.createDirectories(Paths.get(d.stripPrefix("file:")))
      val path = f"$d/part-$partitionId%05d-$taskId-data.parquet"
      new GraftDataWriter.OpenFile(path, ParquetWriteBridge.newWriter(
        dataFactory, dataConf, dataSchema, path, partitionId, taskId),
        new WriterStats(dataSchema))
    })
  private val posPath = f"$dir/part-$partitionId%05d-$taskId-deletes.parquet"
  private lazy val posWriter = ParquetWriteBridge.newWriter(
    posFactory, posConf, GraftDeltaBatchWrite.PosDeleteSchema, posPath,
    partitionId, taskId)
  private var posRows = 0L

  /** `id` rows arrive in [[GraftDeltaRowLevelOperation.rowId]] order —
    * (_file, _pos) — which is exactly the position-delete layout.
    */
  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    posWriter.write(id)
    posRows += 1
  }

  override def update(
      metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(metadata, id)
    insert(row)
  }

  override def insert(row: InternalRow): Unit = {
    val f = dataFileFor(tupleDir.fold("")(_.apply(row)))
    f.writer.write(row)
    f.stats.observe(row)
    f.rows += 1
  }

  override def commit(): WriterCommitMessage = {
    openData.values.foreach(_.writer.close())
    val d = openData.values.map { f =>
      val (mins, maxs, nulls) = f.stats.result()
      GraftFileCommit(f.path, f.rows,
        Files.size(Paths.get(f.path.stripPrefix("file:"))),
        mins, maxs, nulls)
    }.toSeq
    val p =
      if (posRows == 0) None
      else {
        posWriter.close()
        Some(GraftFileCommit(posPath, posRows,
          Files.size(Paths.get(posPath.stripPrefix("file:")))))
      }
    GraftDeltaCommit(d, p)
  }

  override def abort(): Unit = {
    openData.values.foreach { f =>
      f.writer.close()
      Files.deleteIfExists(Paths.get(f.path.stripPrefix("file:")))
    }
    if (posRows > 0) posWriter.close()
    Files.deleteIfExists(Paths.get(posPath.stripPrefix("file:")))
  }

  override def close(): Unit = ()
}

final case class GraftDeltaCommit(
    data: Seq[GraftFileCommit],
    deletes: Option[GraftFileCommit])
    extends WriterCommitMessage
