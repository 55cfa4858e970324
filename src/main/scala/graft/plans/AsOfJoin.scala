package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** A native AS-OF join — the whole-operator custom-plan exemplar from the
  * build plan's preference ladder: a [[LogicalPlan]] node, a planner
  * [[SparkStrategy]], and a sorted-merge [[SparkPlan]] registered through
  * `spark.experimental.extraStrategies` (and injectable via
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Semantics: LEFT OUTER as-of — for every left row, append the single
  * latest right row of the same `by` key whose `on` value is `<=` the left
  * row's `on` (nulls when none). The standard shape for "state as of event
  * time": telemetry → latest config push, trade → latest quote, event →
  * latest order.
  *
  * Why a custom operator instead of the window-function rewrite (q17): the
  * rewrite unions both sides, shuffles the union, and carries every left
  * column through the window sort. This operator shuffles each side ONCE on
  * its `by` key (the partitioning a warehouse would already have), sorts
  * within partitions, and streams a per-partition two-pointer merge — no
  * union materialization, no window state, right side touched once. At
  * 100 TB both inputs are typically already bucketed by the key, which
  * under bucketed layout drops even those exchanges (see BucketedJoinSpec).
  *
  * `by` keys are restricted to LONG (ids); `on` keys are LONG (epoch
  * longs) or TIMESTAMP/TIMESTAMP_NTZ — timestamps evaluate to their
  * internal micros-since-epoch long, whose ordering is the timestamp
  * ordering, so the merge runs unchanged in the long domain. Both sides'
  * `on` keys must live in the SAME domain (both long or both
  * timestamp-family); the type check rejects anything else at analysis
  * time — a nanos long compared against a micros timestamp would join in
  * silently different units.
  * Ties on (`by`, `on`) resolve to the LAST right row in sort order; give
  * `on` a strictly unique secondary component (or pre-aggregate the right
  * side) when the right key is not unique — the q87 query does exactly
  * that.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Expression,
    leftOn: Expression,
    rightBy: Expression,
    rightOn: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean = {
    val exprsOk = Seq(leftBy, leftOn, rightBy, rightOn).forall(_.resolved) &&
      leftBy.dataType == LongType && rightBy.dataType == LongType &&
      AsOfJoin.onTypeOk(leftOn.dataType) && AsOfJoin.onTypeOk(rightOn.dataType) &&
      AsOfJoin.sameOnDomain(leftOn.dataType, rightOn.dataType)
    childrenResolved && exprsOk
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical sorted-merge as-of join. Each child is hash-clustered on its
  * `by` key and sorted by (`by`, `on`); the merge is a forward-only
  * two-pointer scan per partition: the right pointer never rewinds, each
  * right row is copied at most once (the current "latest match"), and
  * output rows are produced straight off the streamed left side — O(|L|+|R|)
  * per partition, no buffering beyond one row.
  */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Expression,
    leftOn: Expression,
    rightBy: Expression,
    rightOn: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftBy)) :: ClusteredDistribution(Seq(rightBy)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending)),
      Seq(SortOrder(rightBy, Ascending), SortOrder(rightOn, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending))

  // left-outer shape: every output row is a streamed left row, so the
  // left child's hash clustering survives — without this the node reads
  // as UnknownPartitioning and a downstream groupBy(by-key) re-shuffles
  // data that is already clustered
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val fullOutput = output
    val lBy = BindReferences.bindReference(leftBy, leftOutput)
    val lOn = BindReferences.bindReference(leftOn, leftOutput)
    val rBy = BindReferences.bindReference(rightBy, rightOutput)
    val rOn = BindReferences.bindReference(rightOn, rightOutput)
    val rightArity = rightOutput.size
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val proj = UnsafeProjection.create(fullOutput, fullOutput)
      new Iterator[InternalRow] {
        // next unconsumed right row (fields cached; row NOT copied — it is
        // only copied if it becomes the latest match)
        private var rRow: InternalRow = _
        private var rKey: Long = _
        private var rVal: Long = _
        private var rValid = false
        // latest right row with (by == matchKey, on <= current left on)
        private var matchKey: Long = _
        private var matchRow: InternalRow = null

        advanceRight()

        private def advanceRight(): Unit = {
          rValid = false
          while (!rValid && rIt.hasNext) {
            val r = rIt.next()
            val kv = rBy.eval(r)
            val ov = rOn.eval(r)
            if (kv != null && ov != null) { // null keys never match anything
              rRow = r
              rKey = kv.asInstanceOf[Long]
              rVal = ov.asInstanceOf[Long]
              rValid = true
            }
          }
        }

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val kv = lBy.eval(l)
          val ov = lOn.eval(l)
          if (kv == null || ov == null) return proj(joined(l, nullRight))
          val lKey = kv.asInstanceOf[Long]
          val lVal = ov.asInstanceOf[Long]
          if (matchRow != null && matchKey != lKey) matchRow = null
          // consume right rows up to and including (lKey, lVal); the last
          // one with the same key is the as-of match
          while (rValid &&
              (rKey < lKey || (rKey == lKey && rVal <= lVal))) {
            if (rKey == lKey) { matchRow = rRow.copy(); matchKey = lKey }
            advanceRight()
          }
          if (matchRow != null) proj(joined(l, matchRow))
          else proj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lb, lo, rb, ro) =>
      AsOfJoinExec(planLater(l), planLater(r), lb, lo, rb, ro) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions`-style injection point (config-based sessions):
  * the native as-of join strategy plus SQL names for every graft kernel
  * ([[graft.functions.GraftFunctions]]).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => MaintenanceStrategy)
    // Iceberg's ALTER TABLE ... ADD/DROP/REPLACE PARTITION FIELD spelling
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectResolutionRule(spark => new GraftSqlDml(spark))
    // hint batch = BEFORE the resolver that rejects v1 time travel
    ext.injectHintResolutionRule(spark => new GraftSqlTimeTravel(spark))
    graft.functions.GraftFunctions.injectInto(ext)
    graft.functions.GraftTableFunctions.injectInto(ext)
  }
}

object AsOfJoin {

  /** `on` keys join in the long domain: epoch longs directly, timestamp
    * types via their internal micros-since-epoch representation (identical
    * ordering, so the merge is unchanged).
    */
  private[plans] def onTypeOk(dt: DataType): Boolean = dt match {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Both `on` keys must agree on their long interpretation, which means
    * the SAME type: a raw epoch long carries caller-chosen units (e.g.
    * nanos) while timestamps eval to micros, and TIMESTAMP vs
    * TIMESTAMP_NTZ mix instant-micros with wall-clock-micros — under any
    * non-UTC session zone those longs are offset by the zone, silently
    * shifting every match.
    */
  private[plans] def sameOnDomain(l: DataType, r: DataType): Boolean = l == r

  /** Public API: `asof(left, right, $"uid", $"ts", $"uid2", $"ts2")`.
    * Registers the planner strategy on the session idempotently, so it
    * works on any already-running session (no config-time opt-in needed).
    */
  private val registerLock = new Object

  def asof(left: DataFrame, right: DataFrame,
      leftBy: Column, leftOn: Column,
      rightBy: Column, rightOn: Column): DataFrame = {
    val spark = left.sparkSession
    // read-modify-write of a session field: serialize it, or a concurrent
    // registration of another extra strategy can be lost
    registerLock.synchronized {
      val strategies = spark.experimental.extraStrategies
      if (!strategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    // fail HERE with a named reason: a wrong-side column would otherwise
    // pass analysis (missingInput is empty) and die in executor-side
    // binding; a non-LONG key would surface as a bare unresolved-operator
    def check(c: Column, side: String, out: Seq[Attribute], isOn: Boolean): Expression = {
      val e = ColumnBridge.expression(c)
      require(e.references.forall(r => out.exists(_.exprId == r.exprId)),
        s"asof: $side key $e does not resolve against the $side side's columns " +
          s"(${out.map(_.name).mkString(", ")})")
      if (isOn) require(onTypeOk(e.dataType),
        s"asof: $side on-key $e must be LONG or TIMESTAMP[_NTZ], got " +
          s"${e.dataType.catalogString} (cast the key; ordering semantics are " +
          "defined in the long domain)")
      else require(e.dataType == LongType,
        s"asof: $side by-key $e must be LONG, got ${e.dataType.catalogString}")
      e
    }
    val lOn = check(leftOn, "left", lPlan.output, isOn = true)
    val rOn = check(rightOn, "right", rPlan.output, isOn = true)
    require(sameOnDomain(lOn.dataType, rOn.dataType),
      s"asof: on-keys must share a domain — the same type on both sides; got " +
        s"${lOn.dataType.catalogString} vs ${rOn.dataType.catalogString} " +
        "(a raw long's units are caller-defined, and TIMESTAMP vs TIMESTAMP_NTZ " +
        "would compare instant micros against wall-clock micros)")
    val plan = AsOfJoinPlan(lPlan, rPlan,
      check(leftBy, "left", lPlan.output, isOn = false), lOn,
      check(rightBy, "right", rPlan.output, isOn = false), rOn)
    DatasetBridge.ofRows(spark, plan)
  }
}
