package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

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
}

/** Logical leaf: the operation, deferred. All columns are non-null longs. */
final case class GraftMaintenancePlan(
    root: String,
    table: String,
    op: MaintenanceOp,
    output: Seq[Attribute])
    extends LeafNode {
  // metadata-sized by construction (one row per compaction / expired
  // snapshot): always broadcastable if joined
  override def computeStats(): Statistics = Statistics(sizeInBytes = 1024)
}

object GraftMaintenancePlan {
  def apply(root: String, table: String, op: MaintenanceOp): GraftMaintenancePlan =
    GraftMaintenancePlan(root, table, op,
      op.outputNames.map(n => AttributeReference(n, LongType, nullable = false)()))
}

/** Runs the maintenance operation at execution time, on the driver. */
final case class GraftMaintenanceExec(
    root: String,
    table: String,
    op: MaintenanceOp,
    output: Seq[Attribute])
    extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = SparkSession.active
    val cat = new GraftCatalog(root)
    val rows: Seq[Seq[Long]] = op match {
      case MaintenanceOp.Compact(mode) =>
        // catalog-managed output location — the same `<root>/_data/<table>`
        // the data source's SQL INSERT commits under
        val out = s"$root/_data/$table"
        val (sid, m) =
          if (mode == "full") cat.compactTable(spark, table, out)
          else cat.compactTableIncremental(spark, table, out)
        Seq(Seq(sid, m.rewrittenFilesCount, m.removedDeleteFiles.length.toLong,
          m.addedFilesCount, m.outputRecordCount))
      case MaintenanceOp.Expire(keepLast) =>
        cat.expireSnapshots(table, keepLast).map(Seq(_))
      case MaintenanceOp.Rollback(sid) =>
        Seq(Seq(cat.rollbackTo(table, sid)))
    }
    val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
    val unsafe = rows.map(r => proj(InternalRow.fromSeq(r)).copy(): InternalRow)
    sparkContext.parallelize(unsafe, 1)
  }
}

/** Plans [[GraftMaintenancePlan]] into [[GraftMaintenanceExec]]. */
object MaintenanceStrategy extends SparkStrategy {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[SparkPlan] =
    plan match {
      case GraftMaintenancePlan(root, table, op, out) =>
        GraftMaintenanceExec(root, table, op, out) :: Nil
      case _ => Nil
    }
}
