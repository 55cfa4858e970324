package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine-surface join queries Q10–Q16 (SURVEY §2.2/§2.7).
  *
  * The reference delegates all general joins to its embedded SQL engine
  * (`core/src/executor/datafusion/datafusion_processor.rs:119`); here they are
  * declared Spark plans with DuckDB oracles.
  *
  * Scale notes (100 TB):
  *   - customer/orders/lineitem are all FACT-sized at scale — no forced
  *     broadcasts there; equi keys keep Catalyst on shuffled hash / sort-merge
  *     joins and AQE converts to broadcast at runtime when a side is small.
  *   - nation (25 rows) is a true dimension — the pure-theta banded join
  *     (q16) broadcasts it explicitly, which is the only scalable shape for a
  *     non-equi join (the big side never shuffles).
  *   - q15's range predicate rides on an equi key, so it stays a residual on
  *     a hash-based join, never a nested loop.
  *
  * Output conventions (driver hash-compares values after sorting columns by
  * name): every sum is `CAST(sum(CAST(x AS DECIMAL)) AS DOUBLE)` on both
  * sides (exact, order-independent summation); int-typed Spark outputs are
  * cast to long where DuckDB returns BIGINT.
  */
object JoinQueries {

  private def sumDec(c: String): org.apache.spark.sql.Column =
    AggQueries.sumDec(col(c))

  /** Q10 inner equi join: orders ⋈ customer, grouped rollup. */
  private def q10(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumDec("o_totalprice").as("sum_price"))
  }

  /** Q11 left outer join: per-customer rollup over finished orders only, so
    * the null-extended side is non-empty.
    */
  private def q11(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val of = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
    c.join(of, c("c_custkey") === of("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast("decimal(18,2)")), lit(0))
          .cast("double").as("total_f"))
  }

  /** Q12 full outer join of two aggregates with asymmetric key ranges. */
  private def q12(spark: SparkSession, sfDir: String): DataFrame = {
    val cn = Tables.customer(spark, sfDir).filter(col("c_nationkey") < 20)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val sn = Tables.supplier(spark, sfDir).filter(col("s_nationkey") > 5)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    cn.join(sn, cn("c_nationkey") === sn("s_nationkey"), "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        col("n_cust"), col("n_supp"))
  }

  /** Q13 left semi join: orders with at least one high-quantity line. */
  private def q13(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val bigLi = Tables.lineitem(spark, sfDir).filter(col("l_quantity") > 45)
    o.join(bigLi, o("o_orderkey") === bigLi("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
  }

  /** Q14 left anti join (general, not MoR): customers with no urgent order. */
  private def q14(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Q15 range join riding an equi key: ship-after-order lines per priority.
    * The `>` is a join residual on the hash join, not a nested loop.
    */
  private def q15(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") > o("o_orderdate"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumDec("l_quantity").as("sum_qty"))
  }

  /** Q16 pure theta (banded) join: parts bucketed into overlapping size bands
    * keyed by nation rows. Non-equi ⇒ broadcast nested loop is the RIGHT plan
    * here — but only because the nation side is dimension-sized and
    * broadcast; the fact side never shuffles.
    */
  private def q16(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    p.join(broadcast(n), p("p_size") >= n("n_nationkey") &&
        p("p_size") < n("n_nationkey") + lit(5))
      .groupBy(col("n_nationkey"))
      .agg(count(lit(1)).as("n_parts"), sumDec("p_retailprice").as("sum_price"))
  }

  /** Q17 as-of join: each click event picks up the user's most recent prior
    * view value. Spark has no native as-of join; the scalable composition is
    * ONE window pass over the unioned stream (partition by user, order by
    * event id, `last(..., ignoreNulls)` over the preceding frame) — a single
    * shuffle on the join key, no range self-join, no point lookups.
    */
  private def q17(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "view"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    ev.select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        last(when(col("event_type") === "view", col("value")), ignoreNulls = true)
          .over(w).as("prev_view_value"))
      .filter(col("event_type") === "click")
      .drop("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_join_inner" -> (q10 _),
    "q11_join_left" -> (q11 _),
    "q12_join_full" -> (q12 _),
    "q13_join_semi" -> (q13 _),
    "q14_join_anti" -> (q14 _),
    "q15_join_range" -> (q15 _),
    "q16_join_theta" -> (q16 _),
    "q17_join_asof" -> (q17 _))

  val oracleSql: Map[String, String] = Map(
    "q10_join_inner" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q11_join_left" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_f
        |FROM customer c
        |LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
        |  ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q12_join_full" ->
      """SELECT coalesce(cn.c_nationkey, sn.s_nationkey) AS nationkey,
        |       cn.n_cust, sn.n_supp
        |FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer
        |      WHERE c_nationkey < 20 GROUP BY 1) cn
        |FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier
        |      WHERE s_nationkey > 5 GROUP BY 1) sn
        |  ON cn.c_nationkey = sn.s_nationkey""".stripMargin,
    "q13_join_semi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""".stripMargin,
    "q14_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')""".stripMargin,
    "q15_join_range" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o
        |  ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        |GROUP BY 1""".stripMargin,
    "q16_join_theta" ->
      """SELECT n_nationkey, count(*) AS n_parts,
        |       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part p JOIN nation n
        |  ON p.p_size >= n.n_nationkey AND p.p_size < n.n_nationkey + 5
        |GROUP BY 1""".stripMargin,
    "q17_join_asof" ->
      """SELECT event_id, user_id, value, prev_view_value FROM (
        |  SELECT event_id, user_id, event_type, value,
        |         last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_value
        |  FROM events WHERE event_type IN ('click', 'view')) t
        |WHERE event_type = 'click'""".stripMargin)
}
