package graft.sources

import graft.sources.CompactionRunner.{CommitManifest, CompactionConfig, DataFileTask}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Minimal file-based table catalog with a snapshot chain — the stand-in for
  * the reference's SQL-backed Iceberg catalog (S8,
  * `core/src/compaction/mod.rs:183-202`) and the snapshot-expiry metadata op
  * (EP3, `compaction/mod.rs:81-87`).
  *
  * Layout under a root directory:
  * {{{
  * <root>/<table>/snap-<id>.tsv   one line per data file: path<TAB>seq<TAB>format
  * <root>/<table>/HEAD            current snapshot id
  * }}}
  *
  * All operations are driver-side metadata IO (snapshot files are one line
  * per data file — the same cardinality the reference ships over its gRPC
  * wire); the data path stays fully distributed in [[CompactionRunner]].
  */
final class GraftCatalog(root: String) {

  private def tableDir(table: String) = Paths.get(root, table)
  private def headPath(table: String) = tableDir(table).resolve("HEAD")
  private def snapPath(table: String, id: Long) =
    tableDir(table).resolve(s"snap-$id.tsv")

  def createTable(table: String, files: Seq[DataFileTask]): Unit = {
    require(!Files.exists(headPath(table)), s"table $table already exists")
    Files.createDirectories(tableDir(table))
    writeSnapshot(table, 1L, files)
    Files.writeString(headPath(table), "1")
  }

  def currentSnapshotId(table: String): Long =
    Files.readString(headPath(table)).trim.toLong

  /** Load the table = the current snapshot's file-scan tasks. */
  def loadTable(table: String): Seq[DataFileTask] =
    readSnapshot(table, currentSnapshotId(table))

  /** Time travel: the file-scan tasks of a PAST snapshot (Iceberg's
    * `VERSION AS OF` — any retained snapshot id is readable until expiry).
    */
  def loadTableAt(table: String, snapshotId: Long): Seq[DataFileTask] = {
    require(snapshotIds(table).contains(snapshotId),
      s"snapshot $snapshotId of $table does not exist (expired or never committed); " +
        s"retained: ${snapshotIds(table).mkString(", ")}")
    readSnapshot(table, snapshotId)
  }

  /** Orphan detection: which of `candidates` (e.g. a storage listing) are
    * referenced by NO retained snapshot — safe to garbage-collect after
    * [[expireSnapshots]]. Pure metadata; deletion is the caller's call.
    */
  def orphanFiles(table: String, candidates: Seq[String]): Seq[String] = {
    val live: Set[String] = snapshotIds(table)
      .flatMap(id => readSnapshot(table, id))
      .flatMap(t => Seq(t.path, CompactionRunner.canonPath(t.path)))
      .toSet
    candidates.filterNot(c => live(c) || live(CompactionRunner.canonPath(c)))
  }

  def snapshotIds(table: String): Seq[Long] = {
    val stream = Files.list(tableDir(table))
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("snap-") && s.endsWith(".tsv") =>
        s.stripPrefix("snap-").stripSuffix(".tsv").toLong
      }.toSeq.sorted
    finally stream.close() // Files.list leaks a directory fd if not closed
  }

  /** Commit a rewrite: current files minus removed plus added → new snapshot,
    * advance HEAD (the `Transaction::rewrite_files` + `commit` pair,
    * `compaction/mod.rs:66-72`).
    */
  def commitRewrite(
      table: String,
      added: Seq[DataFileTask],
      removedPaths: Seq[String]): Long = {
    val removed = removedPaths.toSet
    val current = loadTable(table)
    val kept = current.filterNot(t => removed(CompactionRunner.canonPath(t.path)) ||
      removed(t.path))
    val nextId = currentSnapshotId(table) + 1
    writeSnapshot(table, nextId, kept ++ added)
    Files.writeString(headPath(table), nextId.toString)
    nextId
  }

  /** EP3: drop all snapshots but the most recent `keepLast` (HEAD's snapshot
    * is always kept).
    */
  def expireSnapshots(table: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val ids = snapshotIds(table)
    val head = currentSnapshotId(table)
    val expire = ids.filterNot(_ == head).sorted.dropRight(keepLast - 1)
    expire.foreach(id => Files.delete(snapPath(table, id)))
    expire
  }

  /** EP1 against the catalog: load → compact → commit → new snapshot id. */
  def compactTable(
      spark: SparkSession,
      table: String,
      outDir: String,
      config: CompactionConfig = CompactionConfig()): (Long, CommitManifest) = {
    val tasks = loadTable(table)
    val manifest = CompactionRunner.compact(spark, tasks, Nil, Nil, outDir, config)
    val maxSeq = tasks.map(_.seqNum).max
    val added = manifest.addedFiles.map(f => DataFileTask(f.path, maxSeq + 1))
    val snapId = commitRewrite(table, added, manifest.removedDataFiles)
    (snapId, manifest)
  }

  private def writeSnapshot(table: String, id: Long, files: Seq[DataFileTask]): Unit = {
    val body = files.map(t => s"${t.path}\t${t.seqNum}\t${t.format}").mkString("\n")
    Files.writeString(snapPath(table, id), body,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  private def readSnapshot(table: String, id: Long): Seq[DataFileTask] = {
    val text = Files.readString(snapPath(table, id))
    if (text.isEmpty) Nil
    else text.split("\n").toSeq.map { line =>
      val Array(p, s, f) = line.split("\t", 3)
      DataFileTask(p, s.toLong, f)
    }
  }
}
