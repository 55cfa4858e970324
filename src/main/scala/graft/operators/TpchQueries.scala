package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H query shapes Q70–Q72 (Q3, Q5, Q10 analogues on the
  * fixture schema) — the canonical multi-join benchmark shapes: selective
  * dimension filters, star joins, decimal-exact revenue aggregation, and
  * deterministic top-k. Per-group revenue sums stay within double-exact
  * decimal range, so no rounding is needed.
  *
  * Scale: region/nation broadcast naturally (25 rows); customer/orders/
  * lineitem stay shuffled equi-joins under AQE, with the date/segment
  * filters pushed into the scans.
  */
object TpchQueries {

  import AggQueries.sumDec

  private def revenue: Column =
    sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)

  /** Q70 (TPC-H Q3 shape): top-10 high-revenue urgent-ish orders. */
  private def q70(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1996-06-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1996-06-15").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q71 (TPC-H Q5 shape): local-supplier volume per nation in one region. */
  private def q71(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(li, o("o_orderkey") === li("l_orderkey"))
      .join(s, li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_lines"))
  }

  /** Q72 (TPC-H Q10 shape): top-20 customers by returned-item revenue. */
  private def q72(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
    val n = Tables.nation(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(li, o("o_orderkey") === li("l_orderkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q76 (TPC-H Q6 shape): forecasting revenue change — a pure filtered
    * scan + single aggregate, the canonical pushdown/codegen smoke: no
    * join, no shuffle beyond the final partial-agg exchange.
    */
  private def q76(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sumDec(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q77 (TPC-H Q18 shape): large-volume customers — the group-by-HAVING
    * over a fact table feeding a star join. The qualifying-orderkey set is
    * aggregated FIRST (map-side combinable, tiny result), then joined back;
    * at 100 TB the qualifier output is small enough that AQE broadcasts it
    * into the second join.
    */
  private def q77(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
      .select(col("l_orderkey").as("qual_orderkey"),
        col("sum_qty").cast("double").as("total_qty"))
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(big, o("o_orderkey") === col("qual_orderkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q80 (TPC-H Q1, the pricing-summary report): the canonical wide
    * scan-and-aggregate — one pass over lineitem, six-key grouping cube of
    * decimal-exact sums plus derived averages. Averages are each exact
    * decimal-routed sum divided by the group count as ONE double division,
    * so both engines compute identical doubles (no running float mean).
    * Scale: pure map-side-combinable hash agg on a 4-group key — the
    * textbook 100 TB-friendly shape; filter pushed into the scan.
    */
  private def q80(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1997-06-30").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_base_price"),
        sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("sum_disc_price"),
        sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        sumDec(col("l_discount")).as("sum_disc"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_price"), col("sum_disc_price"), col("sum_charge"),
        (col("sum_qty") / col("count_order")).as("avg_qty"),
        (col("sum_base_price") / col("count_order")).as("avg_price"),
        (col("sum_disc") / col("count_order")).as("avg_disc"),
        col("count_order"))
  }

  /** Q83 (TPC-H Q12 shape): priority-class line counts per return flag (the
    * fixture has no l_shipmode/commitdate; returnflag stands in for the
    * mode dimension, shipdate-in-1996 for the receipt window). Conditional
    * aggregation over one equi-join — both flag counts come from the same
    * shuffle; at scale the date filter pushes into the lineitem scan.
    */
  private def q83(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** Q84 (TPC-H Q4 shape): order-priority checking — orders with at least
    * one late line (shipdate after orderdate stands in for the fixture's
    * missing commit/receipt dates), counted per priority. The EXISTS
    * becomes a left-semi hash join with the date comparison as a residual
    * condition: the probe keeps at most one match per order, so no
    * pre-aggregation or distinct is needed on the fact side.
    */
  private def q84(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
    o.join(li, o("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q95 (TPC-H Q13 shape): customer order-count distribution — the
    * canonical LEFT OUTER + double aggregation: per-customer counts
    * (customers with no qualifying orders count as 0, which an inner join
    * would silently drop), then a histogram over the counts. The second
    * aggregate's input is one row per customer — tiny at any scale.
    */
  private def q95(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q96 (TPC-H Q14 shape): promo revenue share in one ship month —
    * conditional aggregation over a fact-dim join; both sums ride in ONE
    * partial+final aggregate pass (no second scan for the denominator).
    */
  private def q96(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val p = Tables.part(spark, sfDir)
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(p, li("l_partkey") === p("p_partkey"))
      .agg(
        sumDec(when(col("p_type") === "PROMO", disc).otherwise(lit(0.0)), 6)
          .as("promo_rev"),
        sumDec(disc, 6).as("total_rev"))
      .select(col("promo_rev"), col("total_rev"),
        ((lit(100.0) * col("promo_rev")) / col("total_rev")).as("promo_pct"))
  }

  /** Q97 (TPC-H Q19 shape): disjunctive-predicate join — an equi join on
    * partkey whose OR-of-ANDs rides as a residual filter on the hash join
    * (the optimizer must NOT fall back to a nested loop because of the
    * disjunction; the plan guard in TpchPlanSpec asserts it).
    */
  private def q97(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    li.join(p, li("l_partkey") === p("p_partkey") &&
        ((col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
         (col("p_brand") === "Brand#15" && col("p_size").between(1, 24) &&
          col("l_quantity").between(10, 20)) ||
         (col("p_brand") === "Brand#19" && col("p_size").between(1, 50) &&
          col("l_quantity").between(20, 30))))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_lines"))
  }

  /** Q98 (TPC-H Q22 shape): global-customer-relationship — a scalar
    * aggregate (the positive-balance average, decimal-exact then one
    * double division) broadcast as a threshold, an ANTI join dropping
    * customers with any URGENT order, and a per-nation rollup of who
    * remains.
    * The scalar side is one row; Spark plans the threshold comparison as a
    * broadcast nested loop over 1 row (constant-folding equivalent), and
    * the anti join stays hash-based on custkey.
    */
  private def q98(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg((sumDec(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sumDec(col("c_acctbal")).as("totacctbal"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_tpch_q1" -> (q80 _),
    "q83_tpch_q12" -> (q83 _),
    "q84_tpch_q4" -> (q84 _),
    "q70_tpch_q3" -> (q70 _),
    "q71_tpch_q5" -> (q71 _),
    "q72_tpch_q10" -> (q72 _),
    "q76_tpch_q6" -> (q76 _),
    "q77_tpch_q18" -> (q77 _),
    "q95_tpch_q13" -> (q95 _),
    "q96_tpch_q14" -> (q96 _),
    "q97_tpch_q19" -> (q97 _),
    "q98_tpch_q22" -> (q98 _))

  private val Rev =
    "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)"

  val oracleSql: Map[String, String] = Map(
    "q80_tpch_q1" ->
      """WITH g AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS sum_base_price,
        |         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |           AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
        |           AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
        |         count(*) AS count_order
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '1997-06-30 00:00:00'
        |  GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
        |       sum_disc_price, sum_charge,
        |       sum_qty / count_order AS avg_qty,
        |       sum_base_price / count_order AS avg_price,
        |       sum_disc / count_order AS avg_disc,
        |       count_order
        |FROM g""".stripMargin,
    "q83_tpch_q12" ->
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,
    "q84_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY 1""".stripMargin,
    "q70_tpch_q3" ->
      s"""SELECT l_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
         |       o_orderpriority, $Rev AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND o_orderkey = l_orderkey
         |  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1996-06-15 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "q71_tpch_q5" ->
      s"""SELECT n_name, $Rev AS revenue, count(*) AS n_lines
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY 1""".stripMargin,
    "q72_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, $Rev AS revenue
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    "q76_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
        |         AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q77_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
        |       o_totalprice, CAST(b.sum_qty AS DOUBLE) AS total_qty
        |FROM customer, orders, big b
        |WHERE c_custkey = o_custkey AND o_orderkey = b.l_orderkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q95_tpch_q13" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT CAST(c_count AS BIGINT) AS c_count,
        |       CAST(count(*) AS BIGINT) AS custdist
        |FROM c_orders GROUP BY 1""".stripMargin,
    "q96_tpch_q14" ->
      """WITH j AS (
        |  SELECT CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |                  THEN l_extendedprice * (1.0 - l_discount)
        |                  ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS promo_rev,
        |         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |                  AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
        |  FROM lineitem, part
        |  WHERE l_partkey = p_partkey
        |    AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')
        |SELECT promo_rev, total_rev,
        |       (100.0 * promo_rev) / total_rev AS promo_pct
        |FROM j""".stripMargin,
    "q97_tpch_q19" ->
      s"""SELECT $Rev AS revenue, CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND ((p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 1 AND 11)
         |    OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 24
         |        AND l_quantity BETWEEN 10 AND 20)
         |    OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 50
         |        AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "q98_tpch_q22" ->
      """WITH t AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |           AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, t
        |WHERE c_acctbal > t.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin)
}
