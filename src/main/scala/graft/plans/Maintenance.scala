package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.GraftCatalog

/** SQL-addressable table MAINTENANCE — the graft equivalent of Iceberg's
  * Spark procedures (`CALL catalog.system.rewrite_data_files(...)`,
  * `expire_snapshots`, `rollback_to_snapshot`; the reference drives the
  * same operations through its library entry points,
  * `core/src/compaction/mod.rs:66-72` and `expire_snapshot`). Spark's
  * `CALL` statement needs a DSv2 procedure catalog; this engine serves the
  * same surface through table-valued functions
  * ([[graft.functions.GraftTableFunctions]]) that RESOLVE to this leaf
  * plan and EXECUTE the operation only when the enclosing query runs —
  * `EXPLAIN SELECT * FROM graft_compact(...)` plans without compacting
  * anything, exactly like `CALL`'s explain contract.
  *
  * The split mirrors the as-of join exemplar ([[AsOfJoinPlan]]): a logical
  * leaf carrying the operation, a one-case [[SparkStrategy]], and an exec
  * node whose `doExecute` runs the catalog operation on the driver (where
  * catalog commits live — compaction itself launches distributed Spark
  * jobs through [[GraftCatalog.compactTable]]) and returns the result
  * rows. Result sets are metadata-sized (one row per compaction / expired
  * snapshot), so the single-partition return RDD is driver-bounded by
  * design, never by data volume.
  */
sealed trait MaintenanceOp {
  /** Stable column layout, rendered fresh per plan instance (attribute ids
    * must be unique per query).
    */
  def outputNames: Seq[String]

  /** Column types, positionally matching [[outputNames]] (longs unless an
    * op overrides — orphan removal returns paths).
    */
  def outputTypes: Seq[DataType] = outputNames.map(_ => LongType)
}

object MaintenanceOp {

  /** `graft_compact`: full or incremental (watermark-diff) compaction.
    * Row: the committed snapshot plus the commit manifest's counters —
    * the same `RewriteFilesStat` shape the reference reports
    * (`executor/mod.rs:81-87`).
    */
  final case class Compact(mode: String) extends MaintenanceOp {
    override def outputNames: Seq[String] =
      Seq("snapshot_id", "rewritten_data_files", "retired_delete_files",
        "added_data_files", "output_records")
  }

  /** `graft_expire`: EP3 snapshot expiry — one row per expired id. */
  final case class Expire(keepLast: Int) extends MaintenanceOp {
    override def outputNames: Seq[String] = Seq("expired_snapshot_id")
  }

  /** `graft_rollback`: append-only rollback of `main` to a retained
    * snapshot ([[GraftCatalog.rollbackTo]]). Row: the NEW head id.
    */
  final case class Rollback(snapshotId: Long) extends MaintenanceOp {
    override def outputNames: Seq[String] = Seq("snapshot_id")
  }

  /** `graft_remove_orphans`: GC of unreferenced files under the
    * catalog-managed data location (`CALL remove_orphan_files`) — one row
    * per deleted path. Candidates come from listing `<root>/_data/<table>`
    * (the location every catalog write path commits under); files outside
    * it are never touched, referenced files never qualify
    * ([[GraftCatalog.orphanFiles]]), and the grace period shields
    * in-flight writes exactly like the API path.
    */
  final case class RemoveOrphans(graceSeconds: Long) extends MaintenanceOp {
    override def outputNames: Seq[String] = Seq("orphan_path")
    override def outputTypes: Seq[DataType] = Seq(StringType)
  }

  /** `graft_rewrite_eq_deletes`: equality-delete → position-delete
    * conversion ([[GraftCatalog.rewriteEqDeletes]]) — the cheap
    * maintenance step that bounds MoR read amplification between full
    * compactions. With `asDeletionVectors` the doomed positions land
    * directly as Puffin deletion vectors (one commit, no intermediate
    * parquet posdel generation). Row: the committed snapshot +
    * retired/added counts.
    */
  final case class RewriteEqDeletes(asDeletionVectors: Boolean = false)
      extends MaintenanceOp {
    override def outputNames: Seq[String] =
      Seq("snapshot_id", "retired_eq_files", "added_pos_files")
  }

  /** Position-delete file compaction ([[GraftCatalog.compactDeleteFiles]],
    * Iceberg's `rewrite_position_delete_files`): per-commit small delete
    * files merge into few, dangling rows drop, data untouched. Row: the
    * resulting head (unchanged head = nothing to shrink).
    */
  final case class CompactDeleteFiles(
      asDeletionVectors: Boolean = false,
      targetFiles: Int = 1)
      extends MaintenanceOp {
    override def outputNames: Seq[String] = Seq("snapshot_id")
  }

  /** Publish a WAP branch (`<table>@<branch>`, created by `ALTER TABLE
    * ... CREATE BRANCH` or [[graft.sources.GraftCatalog.forkTable]]):
    * main atomically adopts the fork's audited state, or the publish
    * conflicts if main moved since the fork.
    */
  final case class PublishBranch(branch: String) extends MaintenanceOp {
    override def outputNames: Seq[String] = Seq("snapshot_id")
  }

  /** Drop a WAP branch: the fork table and its chain are removed; main
    * is untouched.
    */
  final case class DropBranch(branch: String) extends MaintenanceOp {
    override def outputNames: Seq[String] = Seq("dropped")
  }

  /** Register a FOREIGN Iceberg table by metadata location
    * ([[graft.sources.GraftCatalog.importTable]]): parse the
    * `metadata.json`, walk its manifest chain, and mount the result as a
    * catalog table by reference. The one op whose target table must NOT
    * exist yet.
    */
  final case class ImportTable(
      metadataLocation: String,
      historyDepth: Option[Int] = None) extends MaintenanceOp {
    override def outputNames: Seq[String] = Seq("snapshot_id")
  }

  /** ANALYZE ([[graft.sources.GraftCatalog.computeTableStats]]): one
    * distributed NDV pass, recorded as a Puffin statistics file (plus the
    * partition-statistics file on partitioned tables). One row per
    * analyzed column.
    */
  final case class ComputeStats(
      incremental: Boolean = false,
      histograms: Boolean = false)
      extends MaintenanceOp {
    override def outputNames: Seq[String] = Seq("column", "ndv")
    override def outputTypes: Seq[DataType] = Seq(StringType, LongType)
  }
}

/** Logical leaf: the operation, deferred. All columns are non-null; longs
  * except [[MaintenanceOp.RemoveOrphans]]'s string path column (the exec's
  * projection converts Strings to UTF8String accordingly).
  */
final case class GraftMaintenancePlan(
    root: String,
    table: String,
    op: MaintenanceOp,
    output: Seq[Attribute],
    token: Long)
    extends LeafNode {
  // metadata-sized by construction (one row per compaction / expired
  // snapshot): always broadcastable if joined
  override def computeStats(): Statistics = Statistics(sizeInBytes = 1024)

  /** The side-effecting catalog operation, executed AT MOST ONCE per TVF
    * invocation: every action on the TVF DataFrame — and on Datasets
    * DERIVED from it (`df.count()` plans a fresh Aggregate over this leaf)
    * — re-plans and re-executes, and both the analyzer and the optimizer
    * COPY plan nodes, so neither exec-node nor leaf-instance `lazy val`
    * memoization survives to the second action. Without this, `show()`
    * then `count()` on one `graft_rollback` frame would commit TWO
    * rollback heads, and `graft_remove_orphans` would delete twice. The
    * construction-time [[token]] DOES survive copying (`makeCopy`
    * replays constructor args), so the first action to execute any copy
    * of this invocation runs the operation and later actions replay its
    * rows; a NEW `spark.sql(...)` call mints a new token and runs afresh.
    */
  def resultRows: Seq[InternalRow] = GraftMaintenanceExec
    .memoized(token, () => GraftMaintenanceExec.run(root, table, op, output))
}

object GraftMaintenancePlan {
  private val tokens = new java.util.concurrent.atomic.AtomicLong()

  def apply(root: String, table: String, op: MaintenanceOp): GraftMaintenancePlan =
    GraftMaintenancePlan(root, table, op,
      op.outputNames.zip(op.outputTypes).map { case (n, t) =>
        AttributeReference(n, t, nullable = false)()
      },
      tokens.incrementAndGet())
}

/** Runs the maintenance operation at execution time, on the driver. The
  * rows come from the LOGICAL leaf's memoized [[GraftMaintenancePlan.resultRows]]
  * so that multi-action consumption executes the operation exactly once.
  */
final case class GraftMaintenanceExec(logical: GraftMaintenancePlan)
    extends LeafExecNode {

  override def output: Seq[Attribute] = logical.output

  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(logical.resultRows, 1)
}

object GraftMaintenanceExec {

  /** COMPLETED invocations' rows, per token — never evicted: a completed
    * maintenance operation (a rollback commit, an orphan-file delete) must
    * replay its recorded rows on every later action of the same DataFrame,
    * however many other invocations ran in between — an evict-and-re-run
    * would be the exact double execution this memoization exists to
    * prevent. Unbounded is safe: rows are metadata-sized (one per
    * compaction / expired snapshot) and entries accrue only one per
    * `spark.sql` maintenance call in this driver's lifetime.
    */
  private val completed =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Seq[InternalRow]]()

  /** IN-FLIGHT once-only holders, bounded LRU (only tokens that never
    * completed can be evicted — e.g. a TVF frame that was planned but
    * whose action failed before the operation finished). The map lock
    * covers only holder install — the operation itself runs under the
    * holder's own `lazy val` lock, so two threads racing the SAME
    * invocation's first action still execute once, while maintenance on
    * OTHER tokens proceeds concurrently.
    */
  private val pending =
    new java.util.LinkedHashMap[java.lang.Long, () => Seq[InternalRow]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[java.lang.Long, () => Seq[InternalRow]]): Boolean =
        size() > 256
    }

  private[graft] def memoized(
      token: Long, body: () => Seq[InternalRow]): Seq[InternalRow] = {
    val done = completed.get(token)
    if (done != null) return done
    val holder = pending.synchronized {
      pending.computeIfAbsent(token, _ => { lazy val r = body(); () => r })
    }
    val rows = holder()
    completed.putIfAbsent(token, rows)
    pending.synchronized { pending.remove(token) }
    completed.get(token)
  }

  /** One driver-side execution of the operation, rendered as unsafe rows.
    * `private[graft]`: the CALL-procedure surface
    * ([[graft.sources.dsv2.GraftProcedures]]) executes the same operations
    * through this body.
    */
  private[graft] def run(
      root: String,
      table: String,
      op: MaintenanceOp,
      output: Seq[Attribute]): Seq[InternalRow] = {
    val spark = SparkSession.active
    val cat = new GraftCatalog(root)
    val rows: Seq[Seq[Any]] = op match {
      case MaintenanceOp.Compact(mode) =>
        // catalog-managed output location (`<root>/_data/<table>`, where
        // every catalog write path commits) with a FRESH generation dir
        // per run — the compaction writer overwrites its target, and the
        // files it replaces stay referenced by retained snapshots until
        // expiry (same per-generation discipline as appendFiles/scheduler)
        val out = s"$root/_data/$table/compact-${java.util.UUID.randomUUID()}"
        val (sid, m) =
          if (mode == "full") cat.compactTable(spark, table, out)
          else cat.compactTableIncremental(spark, table, out)
        Seq(Seq(sid, m.rewrittenFilesCount, m.removedDeleteFiles.length.toLong,
          m.addedFilesCount, m.outputRecordCount))
      case MaintenanceOp.Expire(keepLast) =>
        cat.expireSnapshots(table, keepLast).map(Seq(_))
      case MaintenanceOp.Rollback(sid) =>
        Seq(Seq(cat.rollbackTo(table, sid)))
      case MaintenanceOp.RewriteEqDeletes(asDv) =>
        val eqBefore = cat.loadEntries(table).count(_.kind == "eqdel").toLong
        val posBefore = cat.loadEntries(table).count(_.kind == "posdel").toLong
        val out = s"$root/_data/$table/eqrw-${java.util.UUID.randomUUID()}"
        val sid = cat.rewriteEqDeletes(spark, table, out,
          asDeletionVectors = asDv)
        val posAfter = cat.loadEntries(table).count(_.kind == "posdel").toLong
        Seq(Seq(sid, eqBefore, posAfter - posBefore))
      case MaintenanceOp.CompactDeleteFiles(asDv, targetFiles) =>
        val out = s"$root/_data/$table/pdrw-${java.util.UUID.randomUUID()}"
        Seq(Seq(cat.compactDeleteFiles(spark, table, out,
          targetFiles = targetFiles, asDeletionVectors = asDv)))
      case MaintenanceOp.PublishBranch(branch) =>
        Seq(Seq(cat.publishFork(s"$table@$branch")))
      case MaintenanceOp.DropBranch(branch) =>
        cat.dropFork(s"$table@$branch")
        Seq(Seq(1L))
      case MaintenanceOp.ComputeStats(incremental, histograms) =>
        cat.computeTableStats(spark, table, incremental, histograms)
          .toSeq.sortBy(_._1)
          .map { case (c, n) => Seq(c, n) }
      case MaintenanceOp.ImportTable(metadataLocation, historyDepth) =>
        // the SESSION's Hadoop conf, so fs.s3/wasb/gs FileIO mappings the
        // user configured apply to the metadata/manifest walk too
        Seq(Seq(cat.importTable(table, metadataLocation,
          spark.sessionState.newHadoopConf(), historyDepth)))
      case MaintenanceOp.RemoveOrphans(graceSeconds) =>
        // candidates = recursive listing of the catalog-managed data
        // location; a driver-side walk over file metadata (Iceberg's
        // remove_orphan_files does the same storage listing)
        val dataDir = java.nio.file.Paths.get(root, "_data", table)
        val candidates =
          if (!java.nio.file.Files.isDirectory(dataDir)) Nil
          else {
            val stream = java.nio.file.Files.walk(dataDir)
            try {
              import scala.jdk.CollectionConverters._
              stream.iterator().asScala
                .filter(java.nio.file.Files.isRegularFile(_))
                .map(_.toString).toList
            } finally stream.close()
          }
        cat.removeOrphanFiles(table, candidates, graceSeconds * 1000L)
          .sorted.map(Seq(_))
    }
    val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
    rows.map { r =>
      val cells = r.map {
        case s: String => UTF8String.fromString(s)
        case other => other
      }
      proj(InternalRow.fromSeq(cells)).copy(): InternalRow
    }
  }
}

/** Plans [[GraftMaintenancePlan]] into [[GraftMaintenanceExec]]. */
object MaintenanceStrategy extends SparkStrategy {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[SparkPlan] =
    plan match {
      case p: GraftMaintenancePlan => GraftMaintenanceExec(p) :: Nil
      case _ => Nil
    }
}
