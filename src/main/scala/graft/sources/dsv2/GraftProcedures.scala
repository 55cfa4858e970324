package graft.sources.dsv2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.plans.{GraftMaintenanceExec, MaintenanceOp}
import graft.sources.GraftCatalog

/** `CALL graft.system.<procedure>(...)` — Iceberg's ACTUAL maintenance
  * surface (`CALL catalog.system.rewrite_data_files(...)`), served
  * through Spark 4's native `ProcedureCatalog` API. Each procedure
  * executes the same driver-side operation body the maintenance TVFs use
  * ([[GraftMaintenanceExec.run]]) and returns its metadata-sized rows as
  * a [[LocalScan]]. Table arguments are catalog-relative identifiers with
  * dots separating namespaces (`'db.t'` → the catalog table `db/t`).
  *
  * Procedures (Iceberg names):
  *  - `rewrite_data_files(table, mode 'incremental'|'full')`
  *  - `expire_snapshots(table, keep_last)`
  *  - `rollback_to_snapshot(table, snapshot_id)` / `rollback_to_tag(table, tag)`
  *  - `remove_orphan_files(table, older_than_seconds = 86400)`
  *  - `rewrite_position_delete_files(table)`
  *  - `rewrite_equality_deletes(table)` (graft's eq→pos conversion)
  *  - `publish_branch(table, branch)` / `drop_branch(table, branch)`
  *    (the WAP close: main adopts the audited fork, or the fork drops)
  *  - `import_table(table, metadata_location)` (register a foreign
  *    Iceberg table by metadata.json location — the one procedure whose
  *    target must NOT exist yet)
  */
object GraftProcedures {

  val SystemNamespace: Array[String] = Array("system")

  private def p(name: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(name, t).build()

  private def pDefault(name: String, t: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, t).defaultValue(default).build()

  /** dotted identifier → catalog name (`db.t` → `db/t`). */
  private def tableArg(input: InternalRow, i: Int): String =
    input.getUTF8String(i).toString.replace('.', '/')

  private final case class Spec(
      name: String,
      description: String,
      params: Seq[ProcedureParameter],
      mk: (GraftCatalog, InternalRow) => (String, MaintenanceOp),
      // import_table is the one procedure whose target must NOT exist yet
      requiresTable: Boolean = true)

  private val specs: Seq[Spec] = Seq(
    Spec("rewrite_data_files",
      "compact the table's data files (and retire pending deletes in full mode)",
      Seq(p("table", StringType),
        pDefault("mode", StringType, "'incremental'")),
      (cat, in) => {
        val mode = in.getUTF8String(1).toString
        require(mode == "full" || mode == "incremental",
          s"rewrite_data_files mode must be 'full' or 'incremental', got '$mode'")
        (tableArg(in, 0), MaintenanceOp.Compact(mode))
      }),
    Spec("expire_snapshots",
      "expire history beyond the newest keep_last snapshots (tags survive)",
      Seq(p("table", StringType), p("keep_last", IntegerType)),
      (cat, in) => {
        val keep = in.getInt(1)
        require(keep >= 1, s"keep_last must be >= 1, got $keep")
        (tableArg(in, 0), MaintenanceOp.Expire(keep))
      }),
    Spec("rollback_to_snapshot",
      "roll main back to a retained snapshot (append-only history)",
      Seq(p("table", StringType), p("snapshot_id", LongType)),
      (cat, in) => (tableArg(in, 0), MaintenanceOp.Rollback(in.getLong(1)))),
    Spec("rollback_to_tag",
      "roll main back to a tagged snapshot",
      Seq(p("table", StringType), p("tag", StringType)),
      (cat, in) => {
        val t = tableArg(in, 0)
        val tag = in.getUTF8String(1).toString
        val sid = cat.tags(t).getOrElse(tag,
          throw new IllegalArgumentException(
            s"tag '$tag' of $t does not exist " +
              s"(tags: ${cat.tags(t).keys.toSeq.sorted.mkString(", ")})"))
        (t, MaintenanceOp.Rollback(sid))
      }),
    Spec("remove_orphan_files",
      "delete unreferenced files under the managed data location (grace-shielded)",
      Seq(p("table", StringType),
        pDefault("older_than_seconds", LongType, "86400")),
      (cat, in) => {
        val grace = in.getLong(1)
        require(grace >= 0, s"older_than_seconds must be >= 0, got $grace")
        (tableArg(in, 0), MaintenanceOp.RemoveOrphans(grace))
      }),
    Spec("rewrite_position_delete_files",
      "merge small position-delete files and drop dangling delete rows; " +
        "as_deletion_vectors lands them as Puffin deletion-vector " +
        "sidecars (target_files bounds the sidecar count — each is " +
        "written by its own task, so N > 1 parallelizes the rewrite)",
      Seq(p("table", StringType),
        pDefault("as_deletion_vectors", BooleanType, "false"),
        pDefault("target_files", IntegerType, "1")),
      (cat, in) => (tableArg(in, 0),
        MaintenanceOp.CompactDeleteFiles(in.getBoolean(1), in.getInt(2)))),
    Spec("rewrite_equality_deletes",
      "convert equality deletes to position deletes (data files " +
        "untouched); as_deletion_vectors lands them directly as Puffin " +
        "deletion-vector sidecars in the same single commit",
      Seq(p("table", StringType),
        pDefault("as_deletion_vectors", BooleanType, "false")),
      (cat, in) => (tableArg(in, 0),
        MaintenanceOp.RewriteEqDeletes(in.getBoolean(1)))),
    Spec("publish_branch",
      "atomically adopt a WAP branch's audited state as main's next snapshot",
      Seq(p("table", StringType), p("branch", StringType)),
      (cat, in) => (tableArg(in, 0),
        MaintenanceOp.PublishBranch(in.getUTF8String(1).toString))),
    Spec("drop_branch",
      "remove a WAP branch (the fork table and its chain); main untouched",
      Seq(p("table", StringType), p("branch", StringType)),
      (cat, in) => (tableArg(in, 0),
        MaintenanceOp.DropBranch(in.getUTF8String(1).toString))),
    Spec("compute_table_stats",
      "ANALYZE: one distributed theta-sketch pass over the current " +
        "snapshot, recorded as a Puffin statistics file (+ partition " +
        "statistics on partitioned tables); the scan's " +
        "estimateStatistics serves the distinct counts. mode " +
        "'incremental' sketches only the files added since the last " +
        "statistics snapshot and unions with its sketches",
      Seq(p("table", StringType),
        pDefault("mode", StringType, "'full'"),
        pDefault("histograms", org.apache.spark.sql.types.BooleanType, "false")),
      (cat, in) => {
        val mode = in.getUTF8String(1).toString
        require(mode == "full" || mode == "incremental",
          s"compute_table_stats mode must be 'full' or 'incremental', " +
            s"got '$mode'")
        (tableArg(in, 0),
          MaintenanceOp.ComputeStats(incremental = mode == "incremental",
            histograms = in.getBoolean(2)))
      }),
    Spec("import_table",
      "register a foreign Iceberg table by metadata.json location: walk " +
        "its manifest chain and mount it BY REFERENCE as a new catalog " +
        "table (data/delete/Puffin files stay in place); history_depth " +
        "limits the walk to the head plus its N-1 nearest ancestors " +
        "(0 = full history)",
      Seq(p("table", StringType), p("metadata_location", StringType),
        pDefault("history_depth", IntegerType, "0")),
      (cat, in) => {
        val depth = in.getInt(2)
        require(depth >= 0, s"history_depth must be >= 0, got $depth")
        (tableArg(in, 0),
          MaintenanceOp.ImportTable(in.getUTF8String(1).toString,
            Some(depth).filter(_ > 0)))
      },
      requiresTable = false))

  def names: Seq[String] = specs.map(_.name)

  def load(root: String, name: String): Option[UnboundProcedure] =
    specs.find(_.name == name).map(new GraftUnboundProcedure(root, _))

  private final class GraftUnboundProcedure(root: String, spec: Spec)
      extends UnboundProcedure {

    override def name(): String = spec.name
    override def description(): String = spec.description

    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = spec.name
      override def description(): String = spec.description
      override def parameters(): Array[ProcedureParameter] = spec.params.toArray
      override def isDeterministic: Boolean = false

      override def call(input: InternalRow): util.Iterator[Scan] = {
        val cat = new GraftCatalog(root)
        val (table, op) = spec.mk(cat, input)
        if (spec.requiresTable)
          require(cat.tableExists(table),
            s"${spec.name}: table $table does not exist in this catalog " +
              s"(tables: ${cat.tables().mkString(", ")})")
        else require(!cat.tableExists(table),
          s"${spec.name}: table $table already exists in this catalog")
        val attrs = op.outputNames.zip(op.outputTypes).map { case (n, t) =>
          AttributeReference(n, t, nullable = false)()
        }
        val resultRows = GraftMaintenanceExec.run(root, table, op, attrs)
        val schema = StructType(op.outputNames.zip(op.outputTypes).map {
          case (n, t) => StructField(n, t, nullable = false)
        })
        util.Collections.singletonList[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = resultRows.toArray
          override def readSchema(): StructType = schema
          override def description(): String = s"GraftProcedureResult(${spec.name})"
        }).iterator()
      }
    }
  }
}
