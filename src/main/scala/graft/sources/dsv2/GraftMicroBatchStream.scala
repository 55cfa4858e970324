package graft.sources.dsv2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.sources.{CompactionRunner, GraftCatalog, GraftStreamSource}

/** Snapshot-id offset: the catalog's commit log IS the stream's WAL. */
final case class GraftStreamOffset(snapshotId: Long) extends Offset {
  override def json(): String = snapshotId.toString
}

/** DSv2 micro-batch stream over a catalog table —
  * `spark.readStream.table("graft.db.t")`, the engine-native spelling of
  * the V1 `format("graft")` source. Both doorways share ONE offset
  * semantics ([[GraftStreamSource.deltaTasks]]): appends stream exactly
  * once, a fresh stream initial-loads (full-loading across tag-island
  * retention), rewrites fail loudly unless `skipRewrites`, and a resumed
  * stream that fell behind expiry fails rather than duplicate.
  *
  * Each batch's partitions come from planning the delta files' scan into
  * its final-stage `RDD[InternalRow]` (the same serving shape the
  * row-level batch path uses): delta files only — at any table size a
  * batch costs O(new data), never O(table).
  */
final class GraftMicroBatchStream(
    root: String,
    table: String,
    required: StructType,
    skipRewrites: Boolean)
    extends MicroBatchStream {

  private def cat = new GraftCatalog(root)

  override def initialOffset(): Offset = GraftStreamOffset(0L)

  override def latestOffset(): Offset =
    GraftStreamOffset(cat.currentSnapshotId(table))

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].snapshotId
    val e = end.asInstanceOf[GraftStreamOffset].snapshotId
    val tasks = GraftStreamSource.deltaTasks(cat, table, s, e, skipRewrites)
    if (tasks.isEmpty) return Array.empty
    val spark = SparkSession.active
    // resolve columns against the schema AS OF the end offset, not the
    // live head: a schema evolution committed between offset capture and
    // batch planning (a dropped/renamed column) would otherwise fail the
    // projection below or bind columns differently from the stream's
    // analyzed schema — a batch must be planned against the snapshot
    // range it reads
    val groups = CompactionRunner.scanWithHiddenColsGroups(
      spark, tasks, cat.schemaAt(table, e).orElse(cat.currentSchema(table)))
    val projected = groups.map(
      _.select(required.fieldNames.map(col).toIndexedSeq: _*))
    GraftInnerFrame.servableRdds(projected).flatMap(rdd =>
      rdd.partitions.map(p =>
        GraftRddInputPartition(rdd, p): InputPartition)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRddReaderFactory

  override def stop(): Unit = ()
}
