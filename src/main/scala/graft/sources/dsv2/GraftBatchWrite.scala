package graft.sources.dsv2

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.graftbridge.ParquetWriteBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.sources.GraftCatalog

/** [[GraftBatchWrite]] as a `Write`, requesting the table's declared sort
  * order (Iceberg's `write-order`, `GraftCatalog.sortOrder`) from the
  * ENGINE: Spark range-partitions and sorts the incoming rows BEFORE they
  * reach the writers (`RequiresDistributionAndOrdering`), so an INSERT
  * into a sort-ordered table lands range-clustered files whose per-column
  * bounds immediately feed stats pruning — the ingest-time half of the
  * clustering story (compaction enforces it for pre-existing layouts).
  * Tables without a declared order skip both requirements (no extra
  * exchange on the hot append path).
  */
final class GraftOrderedWrite(
    batch: GraftBatchWrite,
    sortCols: Seq[String],
    streaming: Option[() => org.apache.spark.sql.connector.write.streaming.StreamingWrite] = None,
    clusterExprs: Seq[org.apache.spark.sql.connector.expressions.Expression] = Nil)
    extends Write
    with RequiresDistributionAndOrdering {

  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}

  private def orders: Array[SortOrder] =
    sortCols.map(c => Expressions.sort(Expressions.column(c),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)).toArray

  /** Declared write-order wins (range clustering feeds stats pruning); a
    * PARTITIONED table without one clusters by its partition TRANSFORMS —
    * rows sharing a partition tuple land in one task, so the fanout
    * writer's per-task open-file count is ~1 (Iceberg's hash write
    * distribution; without it every task can touch every partition tuple
    * and a 1000-task insert into bucket(16) writes 16k files). The
    * transforms resolve through the catalog's V2 FunctionCatalog
    * ([[GraftV2Functions]] — bit-equal to the fanout writer's own
    * projection, so the clustering and the file layout agree).
    */
  override def requiredDistribution(): Distribution =
    if (sortCols.nonEmpty) Distributions.ordered(orders)
    else if (clusterExprs.nonEmpty)
      Distributions.clustered(clusterExprs.toArray)
    else Distributions.unspecified()

  // clustering is an OPTIMIZATION, not a correctness need: let AQE pick
  // partition counts and fall back freely
  override def distributionStrictlyRequired(): Boolean = false

  override def requiredOrdering(): Array[SortOrder] =
    if (sortCols.isEmpty) Array.empty else orders

  override def toBatch: BatchWrite = batch

  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    streaming.fold(super.toStreaming)(_.apply())
}

/** Distributed parquet write for the DSv2 doorway: each task streams its
  * rows through Spark's own parquet `OutputWriter` (identical bytes to
  * `df.write.parquet`) into a fresh generation directory under the
  * catalog-managed data location; the driver-side [[commit]] lands every
  * non-empty file in ONE catalog commit.
  *
  *  - `replaceAt = None`: append (AppendData / INSERT INTO) —
  *    [[GraftCatalog.commitAppend]].
  *  - `replaceAt = Some(base)`: copy-on-write replacement (ReplaceData
  *    from DELETE/UPDATE/MERGE) — [[GraftCatalog.commitReplaceAt]]
  *    retires EVERY entry of the pinned base snapshot (the scan read all
  *    of them) and asserts the base under the table lock, so a
  *    concurrent commit conflicts instead of losing rows.
  *
  * Scale shape: writers are per-task (no driver data path), file count =
  * task count (AQE coalescing upstream controls it), and the commit is
  * O(files) driver metadata — the same contract every other catalog
  * commit has.
  */
final class GraftBatchWrite(
    root: String,
    table: String,
    schema: StructType,
    // base snapshots arrive as THUNKS evaluated inside commit() after
    // `prepare` runs: non-WAP writes pass an eagerly-captured constant
    // (the plan-time pinning the optimistic contract wants), wap.branch
    // overwrites pass a deferred read of the fork's head — the fork
    // itself only exists once prepare() creates it, so resolving the
    // base any earlier would force the fork at plan time (EXPLAIN
    // INSERT OVERWRITE would mutate the catalog)
    replaceAt: Option[() => Long],
    replaceOnly: () => Option[Set[String]] = () => None,
    overwriteWhere: Option[(Array[org.apache.spark.sql.sources.Filter], () => Long)] = None,
    dynamicOverwriteAt: Option[() => Long] = None,
    // wap.branch's DEFERRED fork: `table` may not exist until commit time
    // — `prepare` creates it first thing in commit() (never at plan time,
    // so EXPLAIN mutates nothing), and `metaTable` names where to read
    // schema/spec metadata until then (main — the fork is created as a
    // copy of exactly that state, so the answers are identical)
    prepare: () => Unit = () => (),
    metaTable: Option[String] = None)
    extends BatchWrite {

  private val dir =
    s"$root/_data/$table/v2-${java.util.UUID.randomUUID()}"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
    Files.createDirectories(Paths.get(dir))
    val cat = new GraftCatalog(root)
    val metaT =
      if (metaTable.isDefined && !cat.tableExists(table)) metaTable.get
      else table
    // footers carry the canonical schema's field ids — NESTED ones
    // included, which only schema-level adoption can attach — so every
    // id-resolving read (renames, eq-delete projection) binds to these
    // files by id, not name
    val writeSchema = cat.currentSchema(metaT)
      .fold(schema)(graft.sources.FieldIds.adoptCanonicalIds(schema, _))
    val (factory, conf) = ParquetWriteBridge.prepare(
      spark, writeSchema, ParquetWriteBridge.hadoopConfOf(spark))
    // a declared partition spec turns every task into a fanout writer:
    // rows land under `name=value/` dirs, and the commit below records
    // each file's tuple into the snapshot for partition pruning
    val spec = cat.partitionSpec(metaT)
    val layout =
      if (spec.isEmpty) None else Some(PartitionLayout.bind(spark, schema, spec))
    GraftDataWriterFactory(dir, writeSchema, factory, conf, layout)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = GraftFilesCommit.all(messages).map(f =>
      GraftCatalog.AddedFile(f.path, "parquet", f.rows, f.bytes,
        f.colMins, f.colMaxs, f.nullCounts))
    val cat = new GraftCatalog(root)
    // the no-op conditions decide FIRST: `prepare` (the deferred wap-branch
    // fork) runs only on paths that actually land a commit — the same
    // contract as GraftDeltaWrite, where a match-nothing statement leaves
    // no empty snapshot AND no spurious branch fork
    dynamicOverwriteAt match {
      case Some(base) =>
        // replace exactly the partition tuples the written files carry
        // (empty data = no-op, Spark's dynamic-overwrite semantics)
        if (files.nonEmpty) {
          prepare()
          cat.commitDynamicOverwrite(table, base(), files)
        }
        return
      case None => ()
    }
    overwriteWhere match {
      case Some((filters, base)) =>
        // atomic filter-overwrite: suppression pos-deletes + the written
        // replacement files in ONE base-asserted commit (always a commit —
        // the suppression scan is part of the commit itself)
        val cond = filters.flatMap(V1FilterColumns.toColumn)
          .reduceOption(_ && _)
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        prepare()
        cat.overwriteWhere(SparkSession.active, table, base(), cond, files, dir)
        return
      case None => ()
    }
    replaceAt match {
      case Some(base) => replaceOnly() match {
        case Some(group) =>
          // runtime group filtering pruned the scan to these files; the
          // commit retires exactly them (an empty group = the statement
          // matched nothing — no files read, nothing to commit)
          if (group.nonEmpty || files.nonEmpty) {
            prepare()
            cat.commitReplaceFilesAt(table, base(), group, files)
          }
        case None =>
          prepare()
          cat.commitReplaceAt(table, base(), files)
      }
      case None => if (files.nonEmpty) {
        prepare()
        cat.commitAppend(table, files)
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    GraftFilesCommit.all(messages).foreach(f =>
      Files.deleteIfExists(Paths.get(f.path.stripPrefix("file:"))))
  }
}

/** One parquet file per committed task — per distinct partition tuple when
  * the table declares a spec (fanout); empty tasks commit no file.
  */
final case class GraftDataWriterFactory(
    dir: String,
    schema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    layout: Option[PartitionLayout] = None)
    extends DataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(dir, schema, factory, conf, partitionId, taskId, layout)
}

final class GraftDataWriter(
    dir: String,
    schema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    partitionId: Int,
    taskId: Long,
    layout: Option[PartitionLayout] = None)
    extends DataWriter[InternalRow] {

  /** Partition-tuple evaluator (None = unpartitioned, one file). */
  private lazy val tupleDir: Option[InternalRow => String] =
    layout.map(_.dirEvaluator())

  /** Open writers by relative partition dir ("" = unpartitioned). Lazily
    * opened on the first row that lands in a tuple, so empty tasks — and
    * tuples a task never sees — put nothing on disk.
    */
  private val open = scala.collection.mutable.LinkedHashMap
    .empty[String, GraftDataWriter.OpenFile]

  private def fileFor(rel: String): GraftDataWriter.OpenFile =
    open.getOrElseUpdate(rel, {
      val d = if (rel.isEmpty) dir else s"$dir/$rel"
      // streaming epochs (and fanout tuples) write under subdirs the
      // driver has not pre-created; local-FS runs need the mkdir
      Files.createDirectories(Paths.get(d.stripPrefix("file:")))
      val path = f"$d/part-$partitionId%05d-$taskId.parquet"
      new GraftDataWriter.OpenFile(path,
        ParquetWriteBridge.newWriter(factory, conf, schema, path, partitionId, taskId),
        new WriterStats(schema))
    })

  /** Strips the leading `__row_operation` marker Spark 4's group-based
    * `ReplaceData` prepends to every written row (the plain
    * `DataWritingSparkTask` hands rows through UNPROJECTED when the
    * operation declares no metadata attributes — the marker is field 0,
    * the data columns follow in write-schema order).
    */
  private lazy val stripMarker =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      schema.fields.zipWithIndex.map { case (f, i) =>
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          i + 1, f.dataType, f.nullable): org.apache.spark.sql.catalyst.expressions.Expression
      }.toIndexedSeq)

  override def write(record: InternalRow): Unit = {
    val row =
      if (record.numFields == schema.length) record
      else {
        require(record.numFields == schema.length + 1,
          s"row width ${record.numFields} matches neither the write schema " +
            s"(${schema.length}) nor schema+operation-marker (${schema.length + 1})")
        stripMarker(record)
      }
    val f = fileFor(tupleDir.fold("")(_.apply(row)))
    f.writer.write(row)
    f.stats.observe(row)
    f.rows += 1
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_.writer.close())
    GraftFilesCommit(open.values.map { f =>
      val (mins, maxs, nulls) = f.stats.result()
      GraftFileCommit(f.path, f.rows,
        Files.size(Paths.get(f.path.stripPrefix("file:"))),
        mins, maxs, nulls)
    }.toSeq)
  }

  override def abort(): Unit = {
    open.values.foreach { f =>
      f.writer.close()
      Files.deleteIfExists(Paths.get(f.path.stripPrefix("file:")))
    }
    open.clear()
  }

  override def close(): Unit = ()
}

object GraftDataWriter {
  /** One task-open output file: path + writer + running row count +
    * streaming column-bounds accumulator.
    */
  private[dsv2] final class OpenFile(
      val path: String,
      val writer: org.apache.spark.sql.execution.datasources.OutputWriter,
      val stats: WriterStats) {
    var rows: Long = 0L
  }
}

/** `writeStream.toTable("graft.t")` — the DSv2 streaming SINK: executor
  * tasks stream rows straight into parquet files (same
  * `OutputWriterFactory` plumbing as the batch writers, one file per
  * non-empty task per epoch), and the driver lands each epoch as ONE
  * exactly-once catalog commit keyed by (queryId, epochId) through the
  * same per-query batch marks the V1 `format("graft")` sink uses —
  * replayed epochs after a restart skip, torn commits roll forward at
  * the next lock entry. Append output mode only (the catalog is an
  * append-of-immutable-files store; complete/update modes are refused by
  * the engine because the table declares no streaming truncate).
  */
final class GraftStreamingWrite(
    root: String,
    table: String,
    schema: StructType,
    queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val dir =
    s"$root/_data/$table/v2stream-${java.util.UUID.randomUUID()}"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val spark = SparkSession.active
    Files.createDirectories(Paths.get(dir))
    val cat = new GraftCatalog(root)
    val writeSchema = cat.currentSchema(table)
      .fold(schema)(graft.sources.FieldIds.adoptCanonicalIds(schema, _))
    val (factory, conf) = ParquetWriteBridge.prepare(
      spark, writeSchema, ParquetWriteBridge.hadoopConfOf(spark))
    val spec = cat.partitionSpec(table)
    val layout =
      if (spec.isEmpty) None else Some(PartitionLayout.bind(spark, schema, spec))
    GraftStreamingWriterFactory(dir, writeSchema, factory, conf, layout)
  }

  override def commit(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = GraftFilesCommit.all(messages).map(f =>
      GraftCatalog.AddedFile(f.path, "parquet", f.rows, f.bytes,
        f.colMins, f.colMaxs, f.nullCounts))
    new GraftCatalog(root).commitStreamFiles(table, queryId, epochId, files)
  }

  override def abort(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftFilesCommit.all(messages).foreach(f =>
      Files.deleteIfExists(Paths.get(f.path.stripPrefix("file:"))))
}

final case class GraftStreamingWriterFactory(
    dir: String,
    schema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    layout: Option[PartitionLayout] = None)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(s"$dir/epoch-$epochId", schema, factory, conf,
      partitionId, taskId, layout)
}

final case class GraftFileCommit(
    path: String, rows: Long, bytes: Long,
    colMins: Map[String, String] = Map.empty,
    colMaxs: Map[String, String] = Map.empty,
    nullCounts: Map[String, Long] = Map.empty)
    extends WriterCommitMessage

/** All files one task committed (several under a partition fanout). */
final case class GraftFilesCommit(files: Seq[GraftFileCommit])
    extends WriterCommitMessage

object GraftFilesCommit {
  /** Flatten a commit-message batch to its file commits (either message
    * shape; foreign messages ignored).
    */
  def all(messages: Array[WriterCommitMessage]): Seq[GraftFileCommit] =
    messages.toSeq.flatMap {
      case GraftFilesCommit(fs) => fs
      case f: GraftFileCommit => Seq(f)
      case _ => Nil
    }
}
