package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

import graft.sources.{GraftCatalog, GraftRelation}

/** SQL time travel over graft tables — `SELECT … FROM t VERSION AS OF 3`,
  * `VERSION AS OF 'tagname'`, and `TIMESTAMP AS OF '2026-01-01 00:00:00'`
  * against a graft temp view or a `CREATE TABLE … USING graft` catalog
  * table.
  *
  * Spark's resolver rejects time travel on every v1 source
  * (`UNSUPPORTED_FEATURE.TIME_TRAVEL`), so this rule runs in the EARLIER
  * hint-resolution batch: it sees the still-unresolved
  * [[RelationTimeTravel]] node, resolves the name itself (through the
  * session's own `spark.table`, so view/catalog/case-sensitivity
  * semantics are Spark's), and — when the target unwraps to an unpinned
  * [[GraftRelation]] — replaces the node with a snapshot-pinned relation
  * before the rejecting resolver ever sees it. Non-graft targets pass
  * through untouched and get Spark's own error.
  *
  * Version addressing: an integer version is a snapshot id; anything else
  * resolves as a tag name (ids win over tags that look like numbers).
  * Timestamps accept any foldable literal castable to TIMESTAMP, in the
  * session time zone, and resolve to the latest snapshot committed at or
  * before that instant ([[GraftCatalog.snapshotIdAsOf]]).
  */
final class GraftSqlTimeTravel(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
        lookupGraft(u) match {
          case Some(rel) if rel.snapshot.isEmpty =>
            val cat = new GraftCatalog(rel.root)
            val snapId: Option[Long] = version match {
              case Some(v) => Some(v.toLongOption.getOrElse(
                cat.snapshotIdOfTag(rel.table, v)))
              case None => ts.flatMap(evalMillis).map(cat.snapshotIdAsOf(rel.table, _))
            }
            snapId.fold(tt: LogicalPlan) { id =>
              spark.baseRelationToDataFrame(
                new GraftRelation(spark.sqlContext, rel.root, rel.table, Some(id)))
                .queryExecution.analyzed
            }
          case _ => tt
        }
    }

  /** Resolve the (still-unresolved) name the way the session would and
    * unwrap to a graft relation; anything else — unknown name, non-graft
    * table, derived view — returns None and keeps Spark's own behavior.
    */
  private def lookupGraft(u: UnresolvedRelation): Option[GraftRelation] =
    try {
      val quoted = u.multipartIdentifier
        .map(p => "`" + p.replace("`", "``") + "`").mkString(".")
      GraftSqlDml.GraftTarget.unapply(spark.table(quoted).queryExecution.analyzed)
    } catch { case _: Exception => None }

  /** Foldable literal → epoch millis via a TIMESTAMP cast in the session
    * zone (exactly the coercion `TIMESTAMP AS OF` documents); a
    * non-foldable expression returns None and falls through to Spark's
    * error.
    */
  private def evalMillis(e: Expression): Option[Long] =
    try {
      if (!e.foldable) None
      else {
        val zone = spark.conf.get("spark.sql.session.timeZone",
          java.util.TimeZone.getDefault.getID)
        Option(Cast(e, TimestampType, Some(zone)).eval(null))
          .map(_.asInstanceOf[Long] / 1000L)
      }
    } catch { case _: Exception => None }
}
