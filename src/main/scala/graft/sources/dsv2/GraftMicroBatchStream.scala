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
    skipRewrites: Boolean,
    maxFilesPerTrigger: Option[Int] = None,
    maxRowsPerTrigger: Option[Long] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadLimit, ReadMaxFiles, ReadMaxRows}

  private def cat = new GraftCatalog(root)

  override def initialOffset(): Offset = GraftStreamOffset(0L)

  override def latestOffset(): Offset =
    GraftStreamOffset(cat.currentSnapshotId(table))

  // ---- admission control: `.option("maxFilesPerTrigger", n)` ------------

  /** Trigger.AvailableNow pins the run's end snapshot here; without this
    * the engine would wrap the stream in its AvailableNow wrapper, whose
    * `latestOffset(start, limit)` returns the captured offset DIRECTLY —
    * silently discarding the read limit (one giant catch-up batch).
    * Implementing the trigger natively keeps the budget honored: each
    * batch advances snapshot-aligned within the limit until the pinned
    * head is reached.
    */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(cat.currentSnapshotId(table))

  override def getDefaultReadLimit: ReadLimit =
    (maxFilesPerTrigger, maxRowsPerTrigger) match {
      case (Some(f), Some(r)) => ReadLimit.compositeLimit(
        Array(ReadLimit.maxFiles(f), ReadLimit.maxRows(r)))
      case (Some(f), None) => ReadLimit.maxFiles(f)
      case (None, Some(r)) => ReadLimit.maxRows(r)
      case _ => ReadLimit.allAvailable()
    }

  override def reportLatestOffset(): Offset =
    GraftStreamOffset(cat.currentSnapshotId(table))

  private def maxFilesOf(l: ReadLimit): Option[Int] = l match {
    case m: ReadMaxFiles => Some(m.maxFiles)
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(maxFilesOf).minOption
    case _ => None
  }

  private def maxRowsOf(l: ReadLimit): Option[Long] = l match {
    case m: ReadMaxRows => Some(m.maxRows)
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(maxRowsOf).minOption
    case _ => None
  }

  /** A catching-up stream must not plan one giant batch: advance the end
    * offset only as far as the file budget allows, SNAPSHOT-ALIGNED (an
    * offset is a snapshot id, so a batch can never split a commit — the
    * batch that exceeds the budget is the one containing the first
    * oversized commit, Iceberg's own semantics). The candidate counts use
    * the REAL batch planner (`deltaTasks` from the held start), so the
    * admitted count is exactly what the batch will read — including the
    * fresh-start full-load shape. Always admits at least one snapshot so
    * the stream makes progress.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = availableNowCap
      .fold(cat.currentSnapshotId(table))(math.min(_, cat.currentSnapshotId(table)))
    val s = start.asInstanceOf[GraftStreamOffset].snapshotId
    val fileBudget = maxFilesOf(limit)
    val rowBudget = maxRowsOf(limit)
    if (fileBudget.isEmpty && rowBudget.isEmpty) return GraftStreamOffset(head)
    val ids = cat.snapshotIds(table).filter(id => id > s && id <= head)
    if (ids.isEmpty) return GraftStreamOffset(head)
    val freshStart = s == 0L
    val contiguous = ids.zip(ids.tail).forall { case (a, b) => b == a + 1 }
    if (freshStart && !contiguous) {
      // tag-island retention: deltaTasks' fresh-start fallback makes every
      // candidate a FULL load at that snapshot — costs are not additive,
      // so price each candidate directly (rare shape; backlog = retained
      // islands, one manifest parse each)
      def withinBudget(e: Long): Boolean = {
        val tasks = GraftStreamSource.deltaTasks(cat, table, s, e, skipRewrites)
        fileBudget.forall(tasks.size <= _) && rowBudget.forall { rb =>
          val counts = cat.loadEntriesAt(table, e)
            .collect { case en if en.kind == "data" => en.path -> en.recordCount }
            .toMap
          val rows = tasks.map(t => counts.getOrElse(t.path, -1L))
          rows.forall(_ >= 0L) && rows.sum <= rb
        }
      }
      var end = ids.head // at least one snapshot — progress guarantee
      var rest = ids.tail
      while (rest.nonEmpty && withinBudget(rest.head)) {
        end = rest.head
        rest = rest.tail
      }
      return GraftStreamOffset(end)
    }
    // Contiguous walk: per-snapshot deltas are additive (deltaTasks over
    // (a, b] is the union of the per-snapshot appends), so accumulate the
    // cumulative cost incrementally — O(backlog) manifest parses per
    // trigger, not O(backlog^2) for a catching-up stream. Rows priced from
    // each segment's OWN snapshot entries (a file appended at `id` always
    // has its count there); unknown counts price as over-budget.
    var end = ids.head
    var segStart = s
    var cumFiles = 0
    var cumRows = 0L
    var rowsKnown = true
    var admitted = 0
    var stop = false
    for (id <- ids if !stop) {
      val tasks = GraftStreamSource.deltaTasks(cat, table, segStart, id, skipRewrites)
      cumFiles += tasks.size
      if (rowBudget.nonEmpty && tasks.nonEmpty && rowsKnown) {
        val counts = cat.loadEntriesAt(table, id)
          .collect { case en if en.kind == "data" => en.path -> en.recordCount }
          .toMap
        val rows = tasks.map(t => counts.getOrElse(t.path, -1L))
        if (rows.exists(_ < 0L)) rowsKnown = false else cumRows += rows.sum
      }
      val fits = fileBudget.forall(cumFiles <= _) &&
        rowBudget.forall(rb => rowsKnown && cumRows <= rb)
      if (admitted == 0 || fits) { end = id; admitted += 1; segStart = id }
      if (!fits) stop = true
    }
    GraftStreamOffset(end)
  }

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  /** Last planned window → its partitions (same memo as the changelog
    * stream, [[GraftChangesMicroBatchStream]]): the engine re-plans the
    * same pinned window several times per micro-batch, and the window's
    * parts are deterministic over immutable snapshots. One entry,
    * replaced as the stream advances.
    */
  @volatile private var lastPlanned
      : ((Long, Long), Array[InputPartition]) = null

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].snapshotId
    val e = end.asInstanceOf[GraftStreamOffset].snapshotId
    val cached = lastPlanned
    if (cached != null && cached._1 == ((s, e))) return cached._2
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
    val served = GraftInnerFrame.servableRdds(projected).flatMap(rdd =>
      rdd.partitions.map(p =>
        GraftRddInputPartition(rdd, p): InputPartition)).toArray
    lastPlanned = ((s, e), served)
    served
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRddReaderFactory

  override def stop(): Unit = ()
}
