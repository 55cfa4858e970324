package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended analytics surface Q60–Q65: pivot, exact + approx percentiles,
  * correlation/covariance, edit distance, time-bin resampling, sorted
  * collect. All follow the repo determinism conventions; statistics that are
  * normally float-sum order-dependent (corr/covar) are rebuilt from
  * decimal-routed moment sums so both engines compute identical doubles.
  */
object MiscQueries {

  /** Q60 pivot: order counts per priority × status (fixed pivot values).
    * Spark's pivot emits NULL for an empty cell while the oracle's
    * `count(*) FILTER` emits 0 — fill so the match is data-independent.
    */
  private def q60(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("F", "O", "P"))
  }

  /** Q61 percentiles: exact interpolated percentiles over integral
    * quantities (exact in double on both engines), plus a self-validating
    * approx-percentile accuracy contract (±2 of the exact median).
    */
  private def q61(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_quantity, 0.25)").as("p25"),
      expr("percentile(l_quantity, 0.5)").as("p50"),
      expr("percentile(l_quantity, 0.75)").as("p75"),
      (abs(expr("approx_percentile(l_quantity, 0.5)") -
        expr("percentile(l_quantity, 0.5)")) <= lit(2.0)).as("approx_ok"))
  }

  /** Q62 correlation/covariance from exact integer moment sums (the builtin
    * corr is a float running sum — order-dependent across engines; the
    * moment formula over exact sums is not).
    *
    * All five moment sums are LONG sums of long products — the whole-stage
    * codegen fast path. (A previous decimal(18,6) formulation widened the
    * sum buffer to decimal(28,6), a non-long-backed Decimal: per-row
    * BigDecimal churn made this query 14× its structural twin q20.)
    * Quantities/prices have exactly 2 decimals in the fixture, so centi-unit
    * longs are exact; price cents are split hi/lo at 1000 so the largest
    * product (hi·hi ≤ 1.2e8) keeps every per-group sum inside int64 up to
    * ~7e10 rows per group (≈10 PB of lineitem) — the documented operating
    * ceiling. The exact integer sums convert to double once at the end;
    * both engines then run the identical double expression.
    */
  private def q62(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val prep = li.selectExpr(
      "l_returnflag",
      "cast(round(l_quantity * 100) as bigint) as qc",
      "cast(round(l_extendedprice * 100) as bigint) as pc")
      .selectExpr("l_returnflag", "qc", "pc div 1000 as hi", "pc % 1000 as lo")
    val agged = prep.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(col("qc")).as("sx"),
      sum(col("hi")).as("shi"),
      sum(col("lo")).as("slo"),
      sum(expr("qc * qc")).as("sxx"),
      sum(expr("hi * hi")).as("shh"),
      sum(expr("hi * lo")).as("shl"),
      sum(expr("lo * lo")).as("sll"),
      sum(expr("qc * hi")).as("sqh"),
      sum(expr("qc * lo")).as("sql0"))
    val moments = agged.select(col("l_returnflag"), col("n"),
      col("sx").cast("double").as("sx"),
      (col("shi").cast("double") * 1000.0 + col("slo").cast("double")).as("sy"),
      col("sxx").cast("double").as("sxx"),
      (col("shh").cast("double") * 1000000.0 + col("shl").cast("double") * 2000.0 +
        col("sll").cast("double")).as("syy"),
      (col("sqh").cast("double") * 1000.0 + col("sql0").cast("double")).as("sxy"))
    // corr is scale-invariant under the centi-unit encoding; covar of the
    // original units = covar(qc, pc) / 1e4.
    moments.select(col("l_returnflag"), col("n"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 9).as("corr_qty_price"),
      round(((col("sxy") - (col("sx") * col("sy")) / col("n")) / col("n")) / lit(10000.0), 2)
        .as("covar_pop"))
  }

  /** Q63 edit distance + normalized similarity over part names/brands. */
  private def q63(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val lev = levenshtein(col("p_name"), col("p_type")).cast("long")
    p.select(col("p_partkey"), lev.as("lev"),
      (lit(1.0) - lev.cast("double") /
        greatest(length(col("p_name")), length(col("p_type"))).cast("double"))
        .as("sim"))
  }

  /** Q64 time-bin resample: 15-minute bins over the event stream (ts
    * normalized to nanos-long — [[Tables.eventsNanos]]; pure integral
    * arithmetic on both engines).
    */
  private def q64(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsNanos(spark, sfDir)
    ev.groupBy(expr("((ts div 1000000000) div 900) * 900").as("bin_sec"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
  }

  /** Q65 sorted collect: smallest 3 customer keys per market segment as a
    * CSV string (numeric sort, string render — portable across engines).
    */
  private def q65(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    c.groupBy(col("c_mktsegment")).agg(
      array_join(transform(slice(array_sort(collect_list(col("c_custkey"))), 1, 3),
        x => x.cast("string")), ",").as("min3"),
      count(lit(1)).as("n"))
  }

  /** Q66 sessionization (gaps-and-islands): per-user sessions split on
    * >30-minute inactivity, built from lag + a running sum of
    * session-boundary markers — the classic two-window shape. Total order
    * (ts, event_id) per user keeps boundaries deterministic; timestamps are
    * integral nanos throughout.
    */
  private def q66(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsNanos(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts").as("tsn"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsn"), col("event_id"))
    val gapNs = 1800L * 1000000000L
    val newSess = when(lag(col("tsn"), 1).over(w).isNull ||
      col("tsn") - lag(col("tsn"), 1).over(w) > gapNs, 1L).otherwise(0L)
    // derived from w: the boundary markers and the running sum must never
    // disagree on partitioning/ordering
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("new_sess", newSess)
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("min(tsn) div 1000000000").as("start_sec"),
        expr("max(tsn) div 1000000000").as("end_sec"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
  }

  /** Q67 funnel: users progressing view → click → purchase in time order
    * (first occurrence of each stage must be strictly increasing). One hash
    * agg per user, then a row-level stage test — no joins, no windows.
    */
  private def q67(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def firstOf(t: String) =
      min(when(col("event_type") === t, col("ts"))).as(s"t_$t")
    val perUser = ev.groupBy(col("user_id"))
      .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
    perUser.select(col("user_id"),
      col("t_view").isNotNull.as("has_view"),
      (col("t_view").isNotNull && col("t_click").isNotNull &&
        col("t_view") < col("t_click")).as("reached_click"),
      (col("t_view").isNotNull && col("t_click").isNotNull &&
        col("t_purchase").isNotNull && col("t_view") < col("t_click") &&
        col("t_click") < col("t_purchase")).as("reached_purchase"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_pivot" -> (q60 _),
    "q61_percentile" -> (q61 _),
    "q62_corr" -> (q62 _),
    "q63_edit_distance" -> (q63 _),
    "q64_resample" -> (q64 _),
    "q65_collect_sorted" -> (q65 _),
    "q66_sessionize" -> (q66 _),
    "q67_funnel" -> (q67 _))

  val oracleSql: Map[String, String] = Map(
    "q60_pivot" ->
      """SELECT o_orderpriority,
        |       count(*) FILTER (o_orderstatus = 'F') AS F,
        |       count(*) FILTER (o_orderstatus = 'O') AS O,
        |       count(*) FILTER (o_orderstatus = 'P') AS P
        |FROM orders
        |GROUP BY 1""".stripMargin,
    "q61_percentile" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75,
        |       true AS approx_ok
        |FROM lineitem
        |GROUP BY 1""".stripMargin,
    "q62_corr" ->
      """SELECT l_returnflag, n,
        |       round((n * sxy - sx * sy)
        |         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) AS corr_qty_price,
        |       round(((sxy - (sx * sy) / n) / n) / 10000.0, 2) AS covar_pop
        |FROM (
        |  SELECT l_returnflag, n,
        |         CAST(sx AS DOUBLE) AS sx,
        |         CAST(shi AS DOUBLE) * 1000.0 + CAST(slo AS DOUBLE) AS sy,
        |         CAST(sxx AS DOUBLE) AS sxx,
        |         CAST(shh AS DOUBLE) * 1000000.0 + CAST(shl AS DOUBLE) * 2000.0
        |           + CAST(sll AS DOUBLE) AS syy,
        |         CAST(sqh AS DOUBLE) * 1000.0 + CAST(sql0 AS DOUBLE) AS sxy
        |  FROM (
        |    SELECT l_returnflag, count(*) AS n,
        |           sum(qc) AS sx, sum(hi) AS shi, sum(lo) AS slo,
        |           sum(qc * qc) AS sxx,
        |           sum(hi * hi) AS shh, sum(hi * lo) AS shl, sum(lo * lo) AS sll,
        |           sum(qc * hi) AS sqh, sum(qc * lo) AS sql0
        |    FROM (
        |      SELECT l_returnflag,
        |             CAST(round(l_quantity * 100) AS BIGINT) AS qc,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) // 1000 AS hi,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) % 1000 AS lo
        |      FROM lineitem) a
        |    GROUP BY 1) s) t""".stripMargin,
    "q63_edit_distance" ->
      """SELECT p_partkey,
        |       levenshtein(p_name, p_type) AS lev,
        |       1.0 - CAST(levenshtein(p_name, p_type) AS DOUBLE)
        |             / CAST(greatest(length(p_name), length(p_type)) AS DOUBLE) AS sim
        |FROM part""".stripMargin,
    "q64_resample" ->
      """SELECT ((epoch_ns(ts) // 1000000000) // 900) * 900 AS bin_sec,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1""".stripMargin,
    "q65_collect_sorted" ->
      """SELECT c_mktsegment,
        |       array_to_string(list_sort(list(c_custkey))[1:3], ',') AS min3,
        |       count(*) AS n
        |FROM customer
        |GROUP BY 1""".stripMargin,
    "q66_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn, value FROM events),
        |s AS (SELECT *, CASE WHEN lag(tsn) OVER w IS NULL
        |                      OR tsn - lag(tsn) OVER w > 1800000000000
        |                     THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
        |s2 AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |                                     ORDER BY tsn, event_id
        |                                     ROWS UNBOUNDED PRECEDING) AS sess_id
        |       FROM s)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, count(*) AS n_events,
        |       min(tsn) // 1000000000 AS start_sec,
        |       max(tsn) // 1000000000 AS end_sec,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM s2 GROUP BY 1, 2""".stripMargin,
    "q67_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
        |         min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
        |         min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_purchase
        |  FROM events GROUP BY 1)
        |SELECT user_id,
        |       t_view IS NOT NULL AS has_view,
        |       (t_view IS NOT NULL AND t_click IS NOT NULL
        |        AND t_view < t_click) AS reached_click,
        |       (t_view IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
        |        AND t_view < t_click AND t_click < t_purchase) AS reached_purchase
        |FROM f""".stripMargin)
}
