package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q-grp: the LPT task grouper as a declared, oracle-checked query.
  *
  * Derives a deterministic task list (40 file groups with their row counts
  * from lineitem), runs [[TaskGrouper.group]], and emits (tid, grp). The
  * collect() is planner-scale by construction — one row per file group,
  * exactly the cardinality the reference holds on its driver when packing
  * FileScanTasks (`iceberg_file_task_scan.rs:114-170`). The DuckDB oracle
  * replays the same greedy assignment with a recursive CTE (first-min index
  * = lowest-group-index tie-break, matching the grouper).
  */
object PlanQueries {

  private def qgrp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tasks = Tables.lineitem(spark, sfDir)
      .groupBy((col("l_orderkey") % 40).as("tid"))
      .agg(count(lit(1)).as("bytes"))
      .orderBy("tid")
      .collect() // 40 rows: planner metadata, not data
      .map(r => (r.getAs[Long]("tid"), TaskGrouper.ScanTask(
        r.getAs[Long]("tid").toString, r.getAs[Long]("bytes"))))
    val groups = TaskGrouper.group(tasks.map(_._2).toSeq, 4)
    val byPath = (for ((g, gi) <- groups.zipWithIndex; t <- g)
      yield t.path -> gi.toLong).toMap
    tasks.map { case (tid, t) => (tid, byPath(t.path)) }
      .toSeq.toDF("tid", "grp")
  }

  /** Q87: the custom AS-OF JOIN operator ([[AsOfJoinPlan]] →
    * [[AsOfJoinExec]] via [[AsOfJoinStrategy]]) in the declared gate —
    * every event picks up the customer's latest order strictly at-or-before
    * the event time. The right side is pre-aggregated to a unique
    * (custkey, date) grain so the as-of tie rule is immaterial; the oracle
    * is DuckDB's native ASOF LEFT JOIN.
    */
  private def q87(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsNanos(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts").as("tsn"))
    val ord = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("byk"),
        (col("o_orderdate").cast("timestamp").cast("long") * lit(1000000000L)).as("on_ns"))
      .agg(max(col("o_orderkey")).as("last_orderkey"),
        count(lit(1)).as("n_orders"))
    AsOfJoin.asof(ev, ord,
        ev("user_id"), ev("tsn"), ord("byk"), ord("on_ns"))
      .select(col("user_id"), col("event_id"), col("last_orderkey"),
        col("n_orders"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_grp_lpt" -> (qgrp _),
    "q87_asof_custom" -> (q87 _))

  val oracleSql: Map[String, String] = Map(
    "q_grp_lpt" ->
      """WITH RECURSIVE tasks AS (
        |  SELECT CAST(l_orderkey % 40 AS BIGINT) AS tid, count(*) AS bytes
        |  FROM lineitem GROUP BY 1),
        |assign AS (
        |  SELECT CAST(-1 AS BIGINT) AS tid,
        |         [CAST(0 AS BIGINT), 0, 0, 0] AS loads,
        |         CAST(NULL AS BIGINT) AS grp
        |  UNION ALL
        |  SELECT t.tid,
        |         list_transform(a.loads, (x, i) ->
        |           CASE WHEN i = list_position(a.loads, list_min(a.loads))
        |                THEN x + t.bytes ELSE x END),
        |         CAST(list_position(a.loads, list_min(a.loads)) - 1 AS BIGINT)
        |  FROM assign a JOIN tasks t ON t.tid = a.tid + 1)
        |SELECT tid, grp FROM assign WHERE tid >= 0""".stripMargin,
    "q87_asof_custom" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn
        |            FROM events),
        |o AS (SELECT o_custkey AS byk, epoch_ns(o_orderdate) AS on_ns,
        |             max(o_orderkey) AS last_orderkey, count(*) AS n_orders
        |      FROM orders GROUP BY 1, 2)
        |SELECT e.user_id, e.event_id, o.last_orderkey, o.n_orders
        |FROM ev e ASOF LEFT JOIN o
        |  ON e.user_id = o.byk AND e.tsn >= o.on_ns""".stripMargin)
}
