package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("graft")` — a catalog table AS A STREAM: each
  * micro-batch is the rows appended between two snapshot ids, so a
  * downstream pipeline (the dedup loop, a training-shard writer) consumes
  * the table incrementally with exactly-once progress tracked in its own
  * checkpoint. The offset domain is the snapshot id — the catalog's
  * commit log IS the stream's write-ahead log, the same equivalence
  * Iceberg/Delta streaming reads are built on.
  *
  * Semantics per snapshot in `(start, end]`:
  *
  *  - `append` snapshots (and the table's FIRST retained snapshot — the
  *    initial load) stream their delta files' rows exactly once;
  *  - anything else (compaction/overwrite/delete rewrites) is NOT an
  *    append: its "new" files carry rows already streamed. By default the
  *    source FAILS LOUDLY on one — silently re-streaming a compaction
  *    would duplicate the whole table downstream. `option("skipRewrites",
  *    "true")` opts into skipping them (the Delta `ignoreChanges` trade:
  *    row-level deletes/updates inside the rewrite are then invisible to
  *    the stream).
  *
  * Reads resolve through the canonical schema by field id like every
  * other scan; delete files are deliberately NOT applied — the stream
  * reports what was appended, not the table's current MoR view (that is
  * [[GraftCatalog.scanTable]]'s job; the changelog shape with deletes is
  * q120's).
  */
final class GraftStreamSource(
    sqlContext: SQLContext,
    root: String,
    table: String,
    skipRewrites: Boolean,
    changeFeed: Boolean = false) extends Source {

  private val catalog = new GraftCatalog(root)
  private def spark = sqlContext.sparkSession

  override val schema: StructType =
    if (changeFeed)
      catalog.scanTable(spark, table).schema
        .add(GraftStreamSource.ChangeTypeCol, org.apache.spark.sql.types.StringType)
    else catalog.scanTable(spark, table).schema

  override def getOffset: Option[Offset] = {
    val head = catalog.currentSnapshotId(table)
    if (head < 1) None else Some(LongOffset(head))
  }

  private def longOf(o: Offset): Long = o.json().toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val s = start.map(longOf).getOrElse(0L)
    val e = longOf(end)
    val batch =
      if (changeFeed)
        GraftStreamSource.changelogBatch(catalog, spark, table, s, e,
            skipRewrites, schema)
          .select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
            .toIndexedSeq: _*)
      else {
        val tasks = GraftStreamSource.deltaTasks(catalog, table, s, e, skipRewrites)
        if (tasks.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else {
          // schema AS OF the end offset (see GraftMicroBatchStream: a schema
          // evolution landing between offset capture and batch planning must
          // not re-bind the batch's columns)
          val scan = CompactionRunner.scanWithHiddenCols(spark, tasks,
            catalog.schemaAt(table, e).orElse(catalog.currentSchema(table)))
          scan.select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
            .toIndexedSeq: _*)
        }
      }
    org.apache.spark.sql.graftbridge.DatasetBridge.asStreaming(batch)
  }

  override def stop(): Unit = ()
}

object GraftStreamSource {

  /** The CDC tag column streamed changelog batches carry (`'I'`/`'D'`) —
    * the Delta-CDF `_change_type` spelling, matching the batch changelog
    * ([[GraftCatalog.changelog]]) and the `graft_changes` TVF.
    */
  val ChangeTypeCol = "_change_type"

  /** CHANGELOG-mode stream batch (`readChangeFeed` / the `.changes`
    * DSv2 table): the net row-level changes in `(s, e]`, one
    * [[GraftCatalog.changelog]] window PER SNAPSHOT STEP so the result
    * is well-defined whatever commits the window spans — this is what a
    * downstream index or materialized view consumes from a continuously
    * UPSERTED table, where the plain append stream must fail (delete
    * snapshots are not appends). Semantics mirror [[deltaTasks]]:
    *
    *  - fresh stream (s == 0): the first retained snapshot full-loads as
    *    `'I'` (the initial image), per-snapshot diffs follow; a
    *    non-contiguous retained set (tag-island retention) full-loads at
    *    `e` instead — nothing has been emitted yet;
    *  - a resumed stream that fell behind snapshot expiry fails loudly
    *    (emitting a reload would duplicate downstream);
    *  - a REWRITE step (data files removed AND added — compaction) has
    *    no net change to report and cannot be diffed without content
    *    compare: fail loudly, or skip under `skipRewrites` (the same
    *    contract as the append stream; row-level changes folded INTO the
    *    rewrite become invisible);
    *  - steps that touch no data files (metadata-only commits) emit
    *    nothing.
    *
    * Cost per batch: the step's delta files plus the old files its
    * deletes reference — never O(table) after the initial load.
    */
  private[graft] def changelogBatch(
      catalog: GraftCatalog,
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      s: Long,
      e: Long,
      skipRewrites: Boolean,
      schema: StructType): DataFrame = {
    // the empty batch builds from the STREAM's declared schema — the
    // table itself may be a schema-less empty creation the scan refuses
    val parts = changelogBatchParts(catalog, spark, table, s, e, skipRewrites)
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else parts.reduce(_.unionByName(_))
  }

  /** [[changelogBatch]] WITHOUT the final union: one frame per window
    * branch (initial image, per-window I and D), in union order — empty
    * for a windowless batch. The DSv2 changelog stream serves the parts
    * group-wise (each is narrow in the common case: file scans +
    * broadcast marker joins), so a micro-batch's partitions stay LAZY
    * file-task slices; the single-frame union forced the eager
    * materialize-then-reshuffle serving shape — a full extra shuffle of
    * every CDC batch, paid at planning time.
    */
  private[graft] def changelogBatchParts(
      catalog: GraftCatalog,
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      s: Long,
      e: Long,
      skipRewrites: Boolean): Seq[DataFrame] = {
    import org.apache.spark.sql.functions.lit
    def tagged(df: DataFrame): DataFrame =
      df.withColumn(ChangeTypeCol, lit("I"))
    def hasData(id: Long): Boolean =
      catalog.loadEntriesAt(table, id).exists(_.kind == "data")
    val retained = catalog.snapshotIds(table).sorted
    val first = retained.headOption.getOrElse(0L)
    val ids = retained.filter(id => id > s && id <= e)
    val freshStart = s == 0L
    val contiguous = ids.isEmpty ||
      ids.zip(ids.tail).forall { case (a, b) => b == a + 1 }
    if (ids.isEmpty) return Nil
    val parts: Seq[DataFrame] =
      if (freshStart && !contiguous) {
        if (hasData(e)) Seq(tagged(catalog.scanTableAt(spark, table, e)))
        else Nil
      }
      else ids.flatMap { id =>
        val initial = freshStart && id == first
        if (!initial && !retained.contains(id - 1))
          throw GraftError.Metadata(
            s"cannot stream changes of snapshot $id of $table: diff base " +
              s"${id - 1} has been expired (retained: " +
              s"${retained.mkString(", ")}; checkpointed offset $s). The " +
              "stream fell behind snapshot expiry — restart with a fresh " +
              "checkpoint to re-load, and retain snapshots longer than " +
              "the stream's maximum lag")
        if (initial) {
          // a data-less first snapshot (created-then-appended tables)
          // contributes no initial image
          if (hasData(id)) Seq(tagged(catalog.scanTableAt(spark, table, id)))
          else Nil
        }
        else {
          val before = catalog.loadEntriesAt(table, id - 1)
            .collect { case en if en.kind == "data" => en.path }.toSet
          val now = catalog.loadEntriesAt(table, id)
            .collect { case en if en.kind == "data" => en.path }.toSet
          if (before.isEmpty && now.isEmpty) Nil // metadata-only step
          else if ((before -- now).nonEmpty && (now -- before).nonEmpty) {
            if (skipRewrites) Nil
            else throw GraftError.Metadata(
              s"snapshot $id of $table is a rewrite (data files removed " +
                "AND added) — a changelog stream has no net change to " +
                "report for it; pass .option(\"skipRewrites\", \"true\") " +
                "to skip rewrite snapshots (row-level changes folded " +
                "into them become invisible to the stream)")
          }
          else catalog.changelogParts(spark, table, id - 1, id)
        }
      }
    parts
  }

  /** The data-file tasks whose rows constitute the stream delta
    * `(s, e]` — the shared offset semantics behind BOTH streaming
    * doorways (the V1 `format("graft")` source above and the DSv2
    * micro-batch stream, [[graft.sources.dsv2.GraftMicroBatchStream]]).
    *
    * Rules (documented on the class): `append` snapshots stream their
    * delta exactly once; the first retained snapshot of a FRESH stream
    * (s == 0) is the initial load; a fresh stream over a NON-CONTIGUOUS
    * retained set (tag-island retention) falls back to a full load at
    * `e`; a RESUMED stream that fell behind expiry fails loudly (both
    * reload and skip would corrupt downstream exactly-once); rewrite
    * snapshots fail loudly unless `skipRewrites`.
    */
  private[graft] def deltaTasks(
      catalog: GraftCatalog,
      table: String,
      s: Long,
      e: Long,
      skipRewrites: Boolean): Seq[CompactionRunner.DataFileTask] = {
    val retained = catalog.snapshotIds(table).sorted
    val first = retained.headOption.getOrElse(0L)
    val ids = retained.filter(id => id > s && id <= e)
    // the initial-load special case applies ONLY to a fresh stream (no
    // checkpointed offset): for a resumed stream, treating the oldest
    // retained snapshot as "the table as created" would re-emit every row
    // the sink already consumed whenever expiry outran the checkpoint —
    // silent duplicates; that case must fail loudly below instead
    val freshStart = s == 0L
    // a FRESH stream over a non-contiguous retained set (tag-island
    // retention: expiry kept {2, 7, 8} because 2 is tagged) cannot walk
    // snapshot diffs — and the diff-gap error below prescribes "restart
    // with a fresh checkpoint", which is exactly what this already is, so
    // walking would make the table permanently unstreamable despite a
    // valid current state. Nothing has been emitted yet, so the initial
    // load can simply be the FULL table at the end offset instead of
    // first-then-diffs; resumed streams (s > 0) must still fail loudly
    // (rows before s were already consumed — a full reload would duplicate).
    val contiguous = ids.isEmpty ||
      ids.zip(ids.tail).forall { case (a, b) => b == a + 1 }
    if (freshStart && !contiguous) catalog.loadTableAt(table, e)
    else ids.flatMap { id =>
      val initial = freshStart && id == first
      // the diff-base check comes FIRST, before the summary is consulted:
      // an expired predecessor also makes the summary underivable
      // ('unknown'), and routing that through the rewrite arm would tell
      // the user to pass skipRewrites — which would then silently DROP
      // this snapshot's appended rows. Expiry outrunning the checkpoint is
      // unrecoverable either way (duplication or loss), so it throws even
      // under skipRewrites.
      if (!initial && !retained.contains(id - 1))
        throw GraftError.Metadata(
          s"cannot stream snapshot $id of $table: diff base ${id - 1} " +
            s"has been expired (retained: ${retained.mkString(", ")}; " +
            s"checkpointed offset $s). The stream fell behind snapshot " +
            "expiry — restart with a fresh checkpoint to re-load, and " +
            "retain snapshots longer than the stream's maximum lag")
      val op =
        if (initial) "append" // initial load: the table as created
        else catalog.snapshotSummary(table, id).map(_.operation)
          .getOrElse("unknown")
      op match {
        case "append" =>
          if (initial) catalog.loadTableAt(table, id)
          else catalog.appendedFilesBetween(table, id - 1, id)
        case other if skipRewrites => Nil
        case other => throw GraftError.Metadata(
          s"snapshot $id of $table is a '$other', not an append — " +
            "streaming it would re-emit already-streamed rows; pass " +
            ".option(\"skipRewrites\", \"true\") to skip rewrite " +
            "snapshots (row-level changes inside them become invisible " +
            "to the stream)")
      }
    }
  }
}
