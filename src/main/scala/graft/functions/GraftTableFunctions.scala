package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{GraftMaintenancePlan, MaintenanceOp}
import graft.sources.{GraftCatalog, GraftMetadataRelation}

/** Table-valued functions: catalog tables addressable from a bare SQL
  * string, with no view registration and no graft imports at the call
  * site — the `FROM`-clause twin of the scalar kernel registry
  * ([[GraftFunctions]]).
  *
  *   - `SELECT * FROM graft_table('root', 't')` — current MoR state
  *     (deletes applied), exactly [[GraftCatalog.scanTable]].
  *   - `SELECT * FROM graft_table('root', 't', 3)` — time travel to
  *     snapshot 3 ([[GraftCatalog.scanTableAt]]); a STRING third argument
  *     resolves as a tag name. SQL `VERSION AS OF` addressing without a
  *     DSv2 catalog.
  *   - `SELECT * FROM graft_meta('root', 't', 'files')` — the metadata
  *     tables (`files` | `partitions` | `snapshots` | `history`), same
  *     rebuilt-per-scan relation the format's `metadata` option serves.
  *   - `graft_compact` / `graft_expire` / `graft_rollback` /
  *     `graft_remove_orphans` — table MAINTENANCE as TVFs (Iceberg's
  *     `CALL` procedures): these resolve to a deferred plan
  *     ([[graft.plans.GraftMaintenancePlan]]) and run the operation only
  *     when the enclosing query executes.
  *
  * Arguments must be literals: the relation (schema included) is resolved
  * at ANALYSIS time, the same moment a table name in the FROM clause
  * resolves — there is no row context to evaluate expressions in. The
  * builder only reads catalog METADATA (snapshot documents) at analysis;
  * data IO stays inside the returned plan's execution.
  */
object GraftTableFunctions {

  private def strLit(e: Expression, fn: String, pos: Int): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn argument $pos must be a string literal (the relation is " +
        s"resolved at analysis time), got: ${other.sql}")
  }

  private def spark: SparkSession = SparkSession.active

  private def graftTable(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      s"graft_table takes (root, table [, snapshot-id | tag]), got ${args.length} arguments")
    val root = strLit(args(0), "graft_table", 1)
    val table = strLit(args(1), "graft_table", 2)
    val cat = new GraftCatalog(root)
    val df =
      if (args.length == 2) cat.scanTable(spark, table)
      else args(2) match {
        case Literal(v: Long, LongType) => cat.scanTableAt(spark, table, v)
        case Literal(v: Int, IntegerType) => cat.scanTableAt(spark, table, v.toLong)
        case Literal(v: UTF8String, StringType) =>
          cat.scanTableAt(spark, table, cat.snapshotIdOfTag(table, v.toString))
        case other => throw new IllegalArgumentException(
          "graft_table argument 3 must be an integer snapshot id or a " +
            s"string tag name literal, got: ${other.sql}")
      }
    df.queryExecution.analyzed
  }

  private def graftMeta(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3,
      s"graft_meta takes (root, table, kind), got ${args.length} arguments")
    val root = strLit(args(0), "graft_meta", 1)
    val table = strLit(args(1), "graft_meta", 2)
    val kind = strLit(args(2), "graft_meta", 3)
    val rel = new GraftMetadataRelation(spark.sqlContext, root, table, kind)
    spark.baseRelationToDataFrame(rel).queryExecution.analyzed
  }

  /** `SELECT * FROM graft_tables('root')` — the catalog-level table
    * listing (name, head snapshot, per-kind file counts): the REST
    * `/v1/namespaces/default/tables` route's SQL twin, rebuilt per scan
    * from catalog metadata like the other metadata tables.
    */
  private def graftTables(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1,
      s"graft_tables takes (root), got ${args.length} arguments")
    val root = strLit(args(0), "graft_tables", 1)
    val rel = new GraftMetadataRelation(spark.sqlContext, root, "", "tables")
    spark.baseRelationToDataFrame(rel).queryExecution.analyzed
  }

  /** `SELECT * FROM graft_changes('root','t', from, to)` — the CDC scan
    * ([[GraftCatalog.changelog]]): net row-level changes in the snapshot
    * window `(from, to]`, tagged `_change_type` `'I'`/`'D'`, as a FROM
    * clause. Snapshot bounds are integer ids or string tag names.
    */
  private def graftChanges(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4,
      s"graft_changes takes (root, table, from-snapshot, to-snapshot), got ${args.length} arguments")
    val root = strLit(args(0), "graft_changes", 1)
    val table = strLit(args(1), "graft_changes", 2)
    val cat = new GraftCatalog(root)
    def snap(e: Expression, pos: Int): Long = e match {
      case Literal(v: Long, LongType) => v
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: UTF8String, StringType) =>
        cat.snapshotIdOfTag(table, v.toString)
      case other => throw new IllegalArgumentException(
        s"graft_changes argument $pos must be an integer snapshot id or a " +
          s"string tag name literal, got: ${other.sql}")
    }
    cat.changelog(spark, table, snap(args(2), 3), snap(args(3), 4))
      .queryExecution.analyzed
  }

  /** Shared by the maintenance TVFs: the table must exist at ANALYSIS time
    * (same moment a FROM-clause table name resolves) so a typo'd name is a
    * named analysis error, not a deferred execution failure.
    */
  private def requireTable(cat: GraftCatalog, table: String, fn: String): Unit =
    require(cat.tables().contains(table),
      s"$fn: table '$table' does not exist in this catalog")

  /** `SELECT * FROM graft_compact('root','t' [, mode])` — SQL-addressable
    * compaction ([[graft.plans.GraftMaintenancePlan]]): Iceberg's
    * `CALL rewrite_data_files` served as a TVF. `mode` is
    * `'incremental'` (default — the watermark-diff production path) or
    * `'full'`. The operation runs when the enclosing query EXECUTES, so
    * EXPLAIN plans without committing.
    */
  private def graftCompact(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      s"graft_compact takes (root, table [, mode]), got ${args.length} arguments")
    val root = strLit(args(0), "graft_compact", 1)
    val table = strLit(args(1), "graft_compact", 2)
    val mode =
      if (args.length == 2) "incremental" else strLit(args(2), "graft_compact", 3)
    require(mode == "full" || mode == "incremental",
      s"graft_compact mode must be 'full' or 'incremental', got '$mode'")
    requireTable(new GraftCatalog(root), table, "graft_compact")
    GraftMaintenancePlan(root, table, MaintenanceOp.Compact(mode))
  }

  /** `SELECT * FROM graft_expire('root','t', keepLast)` — EP3 snapshot
    * expiry as a TVF (`CALL expire_snapshots`): one row per expired id,
    * executed when the query runs.
    */
  private def graftExpire(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3,
      s"graft_expire takes (root, table, keep-last), got ${args.length} arguments")
    val root = strLit(args(0), "graft_expire", 1)
    val table = strLit(args(1), "graft_expire", 2)
    val keep = args(2) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) =>
        // toInt would WRAP an out-of-int-range literal — a >2^31 value to
        // a tiny keep count that silently expires history the caller asked
        // to retain, and a large NEGATIVE (e.g. -4294967295L → 1) past the
        // keep >= 1 check below
        require(v >= 1 && v <= Int.MaxValue,
          s"graft_expire keep-last out of int range: $v")
        v.toInt
      case other => throw new IllegalArgumentException(
        s"graft_expire argument 3 must be an integer literal, got: ${other.sql}")
    }
    require(keep >= 1, s"graft_expire keep-last must be >= 1, got $keep")
    requireTable(new GraftCatalog(root), table, "graft_expire")
    GraftMaintenancePlan(root, table, MaintenanceOp.Expire(keep))
  }

  /** `SELECT * FROM graft_rollback('root','t', snapshot | tag)` — rollback
    * of `main` to a retained snapshot (`CALL rollback_to_snapshot`),
    * rendered append-only ([[GraftCatalog.rollbackTo]]); returns the NEW
    * head id when the query executes.
    */
  private def graftRollback(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3,
      s"graft_rollback takes (root, table, snapshot-id | tag), got ${args.length} arguments")
    val root = strLit(args(0), "graft_rollback", 1)
    val table = strLit(args(1), "graft_rollback", 2)
    val cat = new GraftCatalog(root)
    requireTable(cat, table, "graft_rollback")
    val sid = args(2) match {
      case Literal(v: Long, LongType) => v
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: UTF8String, StringType) =>
        cat.snapshotIdOfTag(table, v.toString)
      case other => throw new IllegalArgumentException(
        "graft_rollback argument 3 must be an integer snapshot id or a " +
          s"string tag name literal, got: ${other.sql}")
    }
    GraftMaintenancePlan(root, table, MaintenanceOp.Rollback(sid))
  }

  /** `SELECT * FROM graft_remove_orphans('root','t' [, graceSeconds])` —
    * GC of unreferenced files under the catalog-managed data location
    * (`CALL remove_orphan_files`): one row per deleted path, executed when
    * the query runs. Grace defaults to 24 h (Iceberg's default) so
    * in-flight writers are never raced.
    */
  private def graftRemoveOrphans(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      s"graft_remove_orphans takes (root, table [, grace-seconds]), got ${args.length} arguments")
    val root = strLit(args(0), "graft_remove_orphans", 1)
    val table = strLit(args(1), "graft_remove_orphans", 2)
    val grace: Long =
      if (args.length == 2) 24L * 3600
      else args(2) match {
        case Literal(v: Int, IntegerType) => v.toLong
        case Literal(v: Long, LongType) => v
        case other => throw new IllegalArgumentException(
          s"graft_remove_orphans argument 3 must be an integer literal, got: ${other.sql}")
      }
    require(grace >= 0, s"grace period must be non-negative, got $grace")
    requireTable(new GraftCatalog(root), table, "graft_remove_orphans")
    GraftMaintenancePlan(root, table, MaintenanceOp.RemoveOrphans(grace))
  }

  /** `SELECT * FROM graft_rewrite_eq_deletes('root','t'[, asDv])` —
    * equality→position delete conversion
    * ([[GraftCatalog.rewriteEqDeletes]], the
    * `CALL rewrite_position_delete_files` sibling for eq-delete debt):
    * one row with the committed snapshot and retired/added file counts,
    * executed when the query runs. The optional boolean lands the doomed
    * positions directly as Puffin deletion vectors.
    */
  private def graftRewriteEqDeletes(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      s"graft_rewrite_eq_deletes takes (root, table[, as_deletion_vectors]), " +
        s"got ${args.length} arguments")
    val root = strLit(args(0), "graft_rewrite_eq_deletes", 1)
    val table = strLit(args(1), "graft_rewrite_eq_deletes", 2)
    val asDv = args.lift(2).exists {
      case org.apache.spark.sql.catalyst.expressions.Literal(b: Boolean, _) => b
      case other => throw new IllegalArgumentException(
        s"graft_rewrite_eq_deletes argument 3 must be a boolean literal, got $other")
    }
    requireTable(new GraftCatalog(root), table, "graft_rewrite_eq_deletes")
    GraftMaintenancePlan(root, table, MaintenanceOp.RewriteEqDeletes(asDv))
  }

  private val tableFunctions: Seq[(String, Seq[Expression] => LogicalPlan)] =
    Seq("graft_table" -> (graftTable _), "graft_meta" -> (graftMeta _),
      "graft_changes" -> (graftChanges _), "graft_compact" -> (graftCompact _),
      "graft_expire" -> (graftExpire _), "graft_rollback" -> (graftRollback _),
      "graft_remove_orphans" -> (graftRemoveOrphans _),
      "graft_rewrite_eq_deletes" -> (graftRewriteEqDeletes _),
      "graft_tables" -> (graftTables _))

  private[graft] def injectInto(
      ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    tableFunctions.foreach { case (name, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo(GraftTableFunctions.getClass.getCanonicalName, name),
        builder))
    }
}
