package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-surface aggregation / window / sort / set-op queries Q20–Q28
  * (SURVEY §2.5). All map-side-combinable hash aggregates or single-shuffle
  * windows; no driver-side collection anywhere.
  *
  * Determinism conventions:
  *   - sums go through DECIMAL (exact, summation-order-independent) and are
  *     cast to double on BOTH the Spark and DuckDB side;
  *   - averages are written explicitly as decimal-sum / count;
  *   - window frames are pinned by total orders (event_id is unique);
  *   - rank/dense_rank may see ties (they are tie-stable); row_number never.
  */
object AggQueries {

  /** Order-independent exact sum: DECIMAL-routed, emitted as double on both
    * engines (the repo-wide aggregate convention — shared with JoinQueries).
    */
  private[operators] def sumDec(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Q20 hash aggregate, TPC-H Q1 shape. */
  private def q20(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice.cast("decimal(18,6)")).cast("double").as("sum_disc_price"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_qty"),
        min(col("l_discount")).as("min_disc"),
        max(col("l_discount")).as("max_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Q21 distinct + multi-column count distinct. */
  private def q21(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.agg(
      countDistinct(col("o_custkey")).as("n_cust"),
      countDistinct(col("o_orderpriority")).as("n_prio"),
      countDistinct(col("o_custkey"), col("o_orderpriority")).as("n_pairs"),
      count(lit(1)).as("n_rows"))
  }

  /** Q22 approximate distinct (HLL++): declared as a self-validating query —
    * outputs the exact count plus whether the default-rsd (0.05) estimate
    * lands within 3σ (15%). The oracle expects `true`, so the hash check
    * verifies the sketch's accuracy contract, which a DuckDB oracle cannot
    * mirror value-for-value. rsd stays at the default on purpose: Spark's
    * HLL buffer is copied per input row in the agg path, so sketch size is
    * a per-row multiplier (rsd=0.01 measured ~90× slower than 0.05).
    */
  private def q22(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.agg(
        countDistinct(col("l_orderkey")).as("n_exact"),
        approx_count_distinct(col("l_orderkey")).as("ap"))
      .select(col("n_exact"),
        (abs(col("ap") - col("n_exact")) <= col("n_exact") * 0.15).as("approx_ok"))
  }

  /** Q23 rollup over two grouping columns. */
  private def q23(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumDec(col("l_quantity")).as("sum_qty"))
  }

  /** Q23b cube over two grouping columns. */
  private def q23b(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumDec(col("o_totalprice")).as("sum_price"))
  }

  /** Q24 global sort + limit (top-k): Spark plans TakeOrderedAndProject —
    * per-partition top-k then a k-row merge on the driver, no full sort at
    * scale. Tie-broken by key for determinism.
    */
  private def q24(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  /** Q25 window ranking: top-3 orders per customer by a total order
    * (row_number), plus rank/dense_rank over a tie-ful ordering (orderdate)
    * — tie-stable, so deterministic.
    */
  private def q25(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val wTotal = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wDate = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        row_number().over(wTotal).as("rn"),
        rank().over(wDate).cast("long").as("rk"),
        dense_rank().over(wDate).cast("long").as("drk"))
      .filter(col("rn") <= 3)
      .withColumn("rn", col("rn").cast("long"))
  }

  /** Q26 window analytics: lag/lead + rolling 3-row sum per event type. The
    * rolling sum goes through decimal so the frame aggregation is exact and
    * independent of the engine's internal frame-evaluation order.
    */
  private def q26(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
    ev.select(col("event_id"), col("event_type"), col("value"),
      lag(col("value"), 1).over(w).as("prev_value"),
      lead(col("value"), 1).over(w).as("next_value"),
      sum(col("value").cast("decimal(18,6)"))
        .over(w.rowsBetween(-2, 0)).cast("double").as("roll_sum"))
  }

  /** Q27 set ops: INTERSECT / EXCEPT (set semantics) + UNION ALL of the
    * tagged results.
    */
  private def q27(spark: SparkSession, sfDir: String): DataFrame = {
    val cn = Tables.customer(spark, sfDir).select(col("c_nationkey").as("nk"))
    val sn = Tables.supplier(spark, sfDir).select(col("s_nationkey").as("nk"))
    cn.intersect(sn).withColumn("tag", lit("both"))
      .union(cn.except(sn).withColumn("tag", lit("cust_only")))
      .union(sn.except(cn).withColumn("tag", lit("supp_only")))
  }

  /** Q28 per-file write-stats audit (mirrors the reference's DataFile column
    * stats, `core/src/parser/proto.rs:410-427`): record counts, null counts,
    * and min/max bounds per synthetic file. The real write path emits the
    * same shape from parquet footers — see [[graft.sources.CompactionRunner]].
    */
  private def q28(spark: SparkSession, sfDir: String): DataFrame =
    MorFixtures.dataTable(spark, sfDir)
      .groupBy(col(MorPlanner.FilePathCol).as("file"))
      .agg(
        count(lit(1)).as("record_count"),
        sum(col("l_quantity").isNull.cast("long")).as("null_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        // ISO strings, not DATE: date-typed dumps compare as python dates vs
        // datetime64 across engines
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_shipdate"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_shipdate"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_agg_hash" -> (q20 _),
    "q21_distinct" -> (q21 _),
    "q22_approx_distinct" -> (q22 _),
    "q23_rollup" -> (q23 _),
    "q23_cube" -> (q23b _),
    "q24_topk" -> (q24 _),
    "q25_window_rank" -> (q25 _),
    "q26_window_analytic" -> (q26 _),
    "q27_setops" -> (q27 _),
    "q28_write_stats" -> (q28 _))

  val oracleSql: Map[String, String] = Map(
    "q20_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       min(l_discount) AS min_disc,
        |       max(l_discount) AS max_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |GROUP BY 1, 2""".stripMargin,
    "q21_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        |       count(DISTINCT o_orderpriority) AS n_prio,
        |       count(DISTINCT (o_custkey, o_orderpriority)) AS n_pairs,
        |       count(*) AS n_rows
        |FROM orders""".stripMargin,
    "q22_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS n_exact, true AS approx_ok
        |FROM lineitem""".stripMargin,
    "q23_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q23_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q24_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q25_window_rank" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, rn, rk, drk FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |         rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rk,
        |         dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS drk
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,
    "q26_window_analytic" ->
      """SELECT event_id, event_type, value,
        |       lag(value, 1) OVER w AS prev_value,
        |       lead(value, 1) OVER w AS next_value,
        |       CAST(sum(CAST(value AS DECIMAL(18,6)))
        |            OVER (PARTITION BY event_type ORDER BY event_id
        |                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id)""".stripMargin,
    "q27_setops" ->
      """SELECT nk, 'both' AS tag FROM
        |  (SELECT c_nationkey AS nk FROM customer
        |   INTERSECT SELECT s_nationkey FROM supplier) t1
        |UNION ALL
        |SELECT nk, 'cust_only' AS tag FROM
        |  (SELECT c_nationkey AS nk FROM customer
        |   EXCEPT SELECT s_nationkey FROM supplier) t2
        |UNION ALL
        |SELECT nk, 'supp_only' AS tag FROM
        |  (SELECT s_nationkey AS nk FROM supplier
        |   EXCEPT SELECT c_nationkey FROM customer) t3""".stripMargin,
    "q28_write_stats" ->
      """SELECT 'f' || CAST(l_orderkey % 29 AS VARCHAR) AS file,
        |       count(*) AS record_count,
        |       CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
        |       min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       strftime(min(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS min_shipdate,
        |       strftime(max(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS max_shipdate
        |FROM lineitem
        |GROUP BY 1""".stripMargin)
}
