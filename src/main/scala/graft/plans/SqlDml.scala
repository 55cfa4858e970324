package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, AttributeSet, EqualTo, Expression, If,
  Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}

import graft.sources.{GraftCatalog, GraftRelation}

/** Plain-SQL row-level DML over graft catalog tables — `DELETE FROM`,
  * `UPDATE`, and `MERGE INTO` against a temp view registered over
  * `spark.read.format("graft")`, with zero graft imports at the call site.
  *
  * Spark only supports these statements against DSv2 tables; for a DSv1
  * relation the analyzer resolves the full statement (relation, condition,
  * assignments) and THEN rejects it. This rule runs in the same resolution
  * batch, matches the fully-resolved statement while its target unwraps to
  * a [[GraftRelation]], and rewrites it into a runnable command over the
  * catalog's native DML ([[GraftCatalog.deleteWhere]] /
  * [[GraftCatalog.updateWhere]] / [[GraftCatalog.mergeInto]]) — the same
  * extension-rule doorway the Iceberg Spark runtime used for row-level DML
  * before DSv2 row-level operations existed. The rewrite happens before
  * Spark's own v2-only rewrite rules see the statement, so the user-facing
  * contract is simply: build the session with
  * `spark.sql.extensions=graft.plans.GraftExtensions` and SQL DML works.
  *
  * Execution semantics are the catalog's: DELETE and UPDATE default to
  * merge-on-read (position-delete + rewrite commits, no data-file
  * rewrite), MERGE is the eq-delete upsert. Committed files land under
  * `<root>/_data/<table>` — the same location the relation's SQL INSERT
  * uses.
  *
  * Resolved references are carried into the command by NAME (the catalog
  * re-resolves them against its own scan), so statements whose conditions
  * need the original binding — subqueries — are rejected up front with a
  * named reason rather than mis-executed.
  *
  * MERGE maps onto [[GraftCatalog.mergeInto]]'s envelope:
  *   - the ON clause must be a conjunction of `target.k = source.k`
  *     equalities with MATCHING column names (the key columns);
  *   - at most one UPDATE and one DELETE matched action; their conditions
  *     compose order-aware (SQL applies the FIRST matching action, so the
  *     second action's effective condition excludes the first's);
  *   - at most one INSERT action, unconditional; star or a full assignment
  *     list. Non-identity insert values are projected onto the source
  *     frame under the target column names before the merge; key columns
  *     must be assigned their identity (the join matches on them), and an
  *     UPDATE value may not reference a source column whose INSERT
  *     assignment replaced it (the original is no longer addressable).
  *   - `WHEN NOT MATCHED BY SOURCE` and `WITH SCHEMA EVOLUTION` are
  *     rejected (no catalog counterpart).
  */
final class GraftSqlDml(spark: SparkSession) extends Rule[LogicalPlan] {

  import GraftSqlDml._

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(GraftTarget(rel), cond)
        if d.table.resolved && cond.resolved =>
      requireWritable(rel, "DELETE")
      requireNoSubquery(cond, "DELETE")
      GraftDeleteCommand(rel.root, rel.table, ExprBox(unresolve(cond)))

    case u @ UpdateTable(GraftTarget(rel), assignments, cond)
        if u.table.resolved && assignments.forall(_.resolved) &&
          cond.forall(_.resolved) =>
      requireWritable(rel, "UPDATE")
      cond.foreach(requireNoSubquery(_, "UPDATE"))
      val set = assignments.map { a =>
        requireNoSubquery(a.value, "UPDATE")
        targetColName(a.key, "UPDATE SET") -> ExprBox(unresolve(a.value))
      }
      GraftUpdateCommand(rel.root, rel.table, set,
        ExprBox(unresolve(cond.getOrElse(Literal.TrueLiteral))))

    case m @ MergeIntoTable(tgt @ GraftTarget(rel), source, mergeCond,
        matched, notMatched, notMatchedBySource, withSchemaEvolution)
        if tgt.resolved && source.resolved && mergeCond.resolved &&
          (matched ++ notMatched).forall(actionResolved) =>
      requireWritable(rel, "MERGE")
      translateMerge(rel, tgt, source, mergeCond, matched, notMatched,
        notMatchedBySource, withSchemaEvolution)

    case _ => plan
  }

  private def translateMerge(
      rel: GraftRelation,
      target: LogicalPlan,
      source: LogicalPlan,
      mergeCond: Expression,
      matched: Seq[MergeAction],
      notMatched: Seq[MergeAction],
      notMatchedBySource: Seq[MergeAction],
      withSchemaEvolution: Boolean): LogicalPlan = {
    require(notMatchedBySource.isEmpty,
      "graft SQL MERGE does not support WHEN NOT MATCHED BY SOURCE " +
        "(the catalog's mergeInto has no not-matched-by-source action)")
    require(!withSchemaEvolution,
      "graft SQL MERGE does not support WITH SCHEMA EVOLUTION " +
        "(schema changes go through GraftCatalog.evolveSchema)")
    requireNoSubquery(mergeCond, "MERGE ON")
    val tgtOut = target.outputSet
    val srcOut = source.outputSet
    val targetCols = target.output.map(_.name)
    val srcNames = source.output.map(_.name)

    // ON: a conjunction of same-named target/source equalities → key cols
    val keyCols = splitConjuncts(mergeCond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tgtOut.contains(a) && srcOut.contains(b) => keyPair(a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if tgtOut.contains(a) && srcOut.contains(b) => keyPair(a, b)
      case other => throw new IllegalArgumentException(
        "graft SQL MERGE requires the ON clause to be a conjunction of " +
          s"target.col = source.col equalities; got: ${other.sql}")
    }

    def mapSides(e: Expression, what: String): Expression = {
      requireNoSubquery(e, what)
      e.transform {
        case a: AttributeReference if srcOut.contains(a) =>
          UnresolvedAttribute.quoted(GraftCatalog.MergeSrcPrefix + a.name)
        case a: AttributeReference if tgtOut.contains(a) =>
          UnresolvedAttribute.quoted(a.name)
        case a: AttributeReference => throw new IllegalArgumentException(
          s"$what references '${a.name}', which binds to neither the " +
            "merge target nor the merge source")
      }
    }

    // matched actions, order-aware: SQL applies the FIRST matching action,
    // so the effective condition of the second excludes the first's
    var matchedSet = Seq.empty[(String, ExprBox)]
    var matchedDelete = Option.empty[ExprBox]
    var prevCond = Option.empty[Expression] // first action's RAW condition
    var sawMatched = false
    matched.foreach { action =>
      def exclusive(cond: Option[Expression], what: String): Option[Expression] = {
        val own = cond.map(mapSides(_, what))
        if (!sawMatched) own
        else {
          val notPrev = prevCond match {
            case Some(p) => org.apache.spark.sql.catalyst.expressions.Not(
              org.apache.spark.sql.catalyst.expressions.Coalesce(
                Seq(mapSides(p, what), Literal.FalseLiteral)))
            case None => Literal.FalseLiteral // unconditional first action wins
          }
          Some(own.fold(notPrev)(c =>
            org.apache.spark.sql.catalyst.expressions.And(notPrev, c)))
        }
      }
      action match {
        case UpdateAction(condOpt, assigns, _) =>
          require(matchedSet.isEmpty,
            "graft SQL MERGE supports at most one WHEN MATCHED ... UPDATE")
          val raw =
            if (assigns.nonEmpty) assigns.map(a =>
              targetColName(a.key, "MERGE UPDATE SET") ->
                mapSides(a.value, "MERGE UPDATE SET"))
            else { // UPDATE SET * — every target column from its source name
              val missing = targetCols.filterNot(srcNames.contains)
              require(missing.isEmpty,
                "MERGE ... UPDATE SET * requires the source to carry every " +
                  s"target column; missing: ${missing.mkString(", ")}")
              targetCols.map(c => c -> (UnresolvedAttribute.quoted(
                GraftCatalog.MergeSrcPrefix + c): Expression))
            }
          matchedSet = exclusive(condOpt, "MERGE UPDATE") match {
            case None => raw.map { case (c, e) => c -> ExprBox(e) }
            case Some(mc) => raw.map { case (c, e) =>
              c -> ExprBox(If(mc, e, UnresolvedAttribute.quoted(c)))
            }
          }
          sawMatched = true; prevCond = condOpt
        case UpdateStarAction(condOpt) =>
          require(matchedSet.isEmpty,
            "graft SQL MERGE supports at most one WHEN MATCHED ... UPDATE")
          val missing = targetCols.filterNot(srcNames.contains)
          require(missing.isEmpty,
            "MERGE ... UPDATE SET * requires the source to carry every " +
              s"target column; missing: ${missing.mkString(", ")}")
          val raw = targetCols.map(c => c -> (UnresolvedAttribute.quoted(
            GraftCatalog.MergeSrcPrefix + c): Expression))
          matchedSet = exclusive(condOpt, "MERGE UPDATE") match {
            case None => raw.map { case (c, e) => c -> ExprBox(e) }
            case Some(mc) => raw.map { case (c, e) =>
              c -> ExprBox(If(mc, e, UnresolvedAttribute.quoted(c)))
            }
          }
          sawMatched = true; prevCond = condOpt
        case DeleteAction(condOpt) =>
          require(matchedDelete.isEmpty,
            "graft SQL MERGE supports at most one WHEN MATCHED ... DELETE")
          matchedDelete = Some(ExprBox(
            exclusive(condOpt, "MERGE DELETE").getOrElse(Literal.TrueLiteral)))
          sawMatched = true; prevCond = condOpt
        case other => throw new IllegalArgumentException(
          s"unsupported WHEN MATCHED action: $other")
      }
    }

    // not-matched: one unconditional INSERT, star or full assignment list
    var insert = false
    var insertAssigns = Seq.empty[(String, ExprBox)]
    var passthrough = Seq.empty[String]
    def starInsert(): Unit = {
      val missing = targetCols.filterNot(srcNames.contains)
      require(missing.isEmpty,
        "MERGE ... INSERT * requires the source to carry every target " +
          s"column; missing: ${missing.mkString(", ")}")
    }
    notMatched.foreach { action =>
      require(!insert, "graft SQL MERGE supports at most one WHEN NOT MATCHED action")
      action match {
        case InsertAction(condOpt, assigns) =>
          require(condOpt.isEmpty,
            "graft SQL MERGE does not support a conditional WHEN NOT " +
              "MATCHED ... INSERT (the catalog inserts every unmatched source row)")
          insert = true
          if (assigns.isEmpty) starInsert()
          else {
            val mapped = assigns.map { a =>
              requireNoSubquery(a.value, "MERGE INSERT")
              val name = targetColName(a.key, "MERGE INSERT")
              // source-only context: plain names (projected onto the source)
              val v = a.value.transform {
                case at: AttributeReference if srcOut.contains(at) =>
                  UnresolvedAttribute.quoted(at.name)
                case at: AttributeReference => throw new IllegalArgumentException(
                  s"MERGE INSERT value for '$name' references '${at.name}', " +
                    "which does not bind to the merge source")
              }
              (name, v, a.value)
            }
            val missing = targetCols.filterNot(c => mapped.exists(_._1 == c))
            require(missing.isEmpty,
              "graft SQL MERGE INSERT must assign every target column; " +
                s"missing: ${missing.mkString(", ")}")
            def isIdentity(name: String, raw: Expression): Boolean = raw match {
              case at: AttributeReference => srcOut.contains(at) && at.name == name
              case c: org.apache.spark.sql.catalyst.expressions.Cast =>
                isIdentity(name, c.child)
              case _ => false
            }
            keyCols.foreach { k =>
              val kv = mapped.find(_._1 == k).get
              require(isIdentity(k, kv._3),
                s"MERGE INSERT must assign key column '$k' its identity " +
                  "(the join matches on the source's key value)")
            }
            // an UPDATE value referencing a source column replaced by a
            // non-identity INSERT assignment would read the INSERT value
            val replaced = mapped.collect {
              case (n, _, raw) if srcNames.contains(n) && !isIdentity(n, raw) => n
            }.toSet
            if (replaced.nonEmpty) {
              val updateRefs = matchedSet.flatMap(_._2.e.collect {
                case u: UnresolvedAttribute
                    if u.name.startsWith(GraftCatalog.MergeSrcPrefix) =>
                  u.name.stripPrefix(GraftCatalog.MergeSrcPrefix)
              }) ++ matchedDelete.toSeq.flatMap(_.e.collect {
                case u: UnresolvedAttribute
                    if u.name.startsWith(GraftCatalog.MergeSrcPrefix) =>
                  u.name.stripPrefix(GraftCatalog.MergeSrcPrefix)
              })
              val clash = updateRefs.toSet.intersect(replaced)
              require(clash.isEmpty,
                "MERGE UPDATE/DELETE references source column(s) " +
                  s"${clash.mkString(", ")} whose INSERT assignment replaced " +
                  "them; the original value is no longer addressable")
            }
            insertAssigns = mapped.map { case (n, v, _) => n -> ExprBox(v) }
            passthrough = srcNames.filterNot(targetCols.contains)
          }
        case InsertStarAction(condOpt) =>
          require(condOpt.isEmpty,
            "graft SQL MERGE does not support a conditional WHEN NOT " +
              "MATCHED ... INSERT (the catalog inserts every unmatched source row)")
          insert = true
          starInsert()
        case other => throw new IllegalArgumentException(
          s"unsupported WHEN NOT MATCHED action: $other")
      }
    }

    GraftMergeCommand(rel.root, rel.table, source, keyCols, matchedSet,
      matchedDelete, insert, insertAssigns, passthrough)
  }
}

object GraftSqlDml {

  /** Carries a (deliberately name-resolved) expression through a command
    * without exposing it to TreeNode reflection: a raw `Expression` field
    * on a command would be re-resolved (and failed, as unresolvable)
    * against the command's empty child list.
    */
  final case class ExprBox(e: Expression) {
    override def toString: String = e.sql
  }

  /** Unwraps the DML target down to its [[GraftRelation]]: temp-view
    * resolution stacks SubqueryAlias / View (and a schema-compensation
    * Project of plain attributes) over the relation. Anything else — a
    * derived view with real computation — is left for Spark's own error.
    */
  private[plans] object GraftTarget {
    def unapply(plan: LogicalPlan): Option[GraftRelation] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case v: View => unapply(v.child)
      case p: Project if p.projectList.forall(_.isInstanceOf[Attribute]) =>
        unapply(p.child)
      case lr: LogicalRelation => lr.relation match {
        case rel: GraftRelation => Some(rel)
        case _ => None
      }
      case _ => None
    }
  }

  private def actionResolved(a: MergeAction): Boolean = a match {
    // star actions carry no assignments until expanded; their condition is
    // the only expression that must be resolved before translation
    case UpdateStarAction(c) => c.forall(_.resolved)
    case InsertStarAction(c) => c.forall(_.resolved)
    case other => other.resolved
  }

  private def requireWritable(rel: GraftRelation, what: String): Unit =
    require(rel.snapshot.isEmpty,
      s"$what on a snapshot/tag-pinned relation is not allowed " +
        "(reads are pinned to history; writes go to the current table)")

  private def requireNoSubquery(e: Expression, what: String): Unit =
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"graft SQL $what does not support subqueries in this position " +
        "(conditions are re-resolved against the catalog scan, where the " +
        "subquery's binding would be lost)")

  /** Resolved references → plain names: the catalog re-resolves them
    * against its own scan of the same table, where the names are the
    * stable identity (expression ids are plan-local and would dangle).
    */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  private def targetColName(key: Expression, what: String): String = key match {
    case a: AttributeReference => a.name
    case u: UnresolvedAttribute if u.nameParts.length == 1 => u.name
    case other => throw new IllegalArgumentException(
      s"graft SQL $what supports only top-level columns, got: ${other.sql} " +
        "(nested-field assignment has no catalog counterpart)")
  }

  private def keyPair(t: AttributeReference, s: AttributeReference): String = {
    require(t.name == s.name,
      s"graft SQL MERGE requires key columns to share a name; got " +
        s"target.${t.name} = source.${s.name} (alias the source column to " +
        s"'${t.name}' in the USING clause)")
    t.name
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Iceberg's `write.delete.mode` / `write.update.mode` table property,
    * read at EXECUTION time (the property a table declares drives every
    * engine's row-level writes): absent or `merge-on-read` → the MoR
    * position-delete commit (this engine's default), `copy-on-write` →
    * rewrite only the affected files. Anything else fails loudly — a
    * typo'd mode silently falling back would write the wrong layout for
    * the table's declared read profile.
    */
  private def copyOnWriteMode(
      cat: GraftCatalog, table: String, prop: String): Boolean =
    cat.tableProperties(table).get(prop) match {
      case None | Some("merge-on-read") => false
      case Some("copy-on-write") => true
      case Some(other) => throw new IllegalArgumentException(
        s"$prop must be 'merge-on-read' or 'copy-on-write', got '$other'")
    }

  /** `DELETE FROM <graft view> WHERE <cond>` → row-level delete commit in
    * the table's declared `write.delete.mode` (MoR default).
    */
  final case class GraftDeleteCommand(
      root: String, table: String, cond: ExprBox) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = new GraftCatalog(root)
      cat.deleteWhere(
        spark, table, ColumnBridge.column(cond.e), s"$root/_data/$table",
        copyOnWrite = copyOnWriteMode(cat, table, "write.delete.mode"))
      Seq.empty
    }
  }

  /** `UPDATE <graft view> SET ... WHERE ...` → row-level update commit in
    * the table's declared `write.update.mode` (MoR default).
    */
  final case class GraftUpdateCommand(
      root: String, table: String,
      set: Seq[(String, ExprBox)], cond: ExprBox) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = new GraftCatalog(root)
      cat.updateWhere(
        spark, table, ColumnBridge.column(cond.e),
        set.map { case (c, b) => c -> ColumnBridge.column(b.e) }.toMap,
        s"$root/_data/$table",
        copyOnWrite = copyOnWriteMode(cat, table, "write.update.mode"))
      Seq.empty
    }
  }

  /** `MERGE INTO <graft view> USING ...` → eq-delete upsert commit. */
  final case class GraftMergeCommand(
      root: String, table: String,
      source: LogicalPlan,
      keyCols: Seq[String],
      matchedSet: Seq[(String, ExprBox)],
      matchedDelete: Option[ExprBox],
      insert: Boolean,
      insertAssigns: Seq[(String, ExprBox)],
      passthrough: Seq[String]) extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = new GraftCatalog(root)
      // this catalog's MERGE is the eq-delete upsert — merge-on-read by
      // construction. A table declaring write.merge.mode=copy-on-write
      // must be refused loudly (its readers are tuned for a no-delete-file
      // profile), exactly like a typo'd mode — never silently written MoR
      cat.tableProperties(table).get("write.merge.mode") match {
        case None | Some("merge-on-read") => ()
        case Some(other) => throw new IllegalArgumentException(
          s"write.merge.mode '$other' is not supported: this catalog's " +
            "MERGE INTO commits merge-on-read eq-deletes " +
            "(only 'merge-on-read' is available)")
      }
      val src0 = DatasetBridge.ofRows(spark, source)
      val src =
        if (insertAssigns.isEmpty) src0
        else src0.select(insertAssigns.map { case (c, b) =>
          ColumnBridge.column(b.e).as(c)
        } ++ passthrough.map(col): _*)
      cat.mergeInto(spark, table, src, keyCols,
        matchedSet.map { case (c, b) => c -> ColumnBridge.column(b.e) }.toMap,
        s"$root/_data/$table",
        whenNotMatchedInsert = insert,
        whenMatchedDelete = matchedDelete.map(b => ColumnBridge.column(b.e)))
      Seq.empty
    }
  }
}
