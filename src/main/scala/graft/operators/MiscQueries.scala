package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extended analytics surface Q60–Q65: pivot, exact + approx percentiles,
  * correlation/covariance, edit distance, time-bin resampling, sorted
  * collect. All follow the repo determinism conventions; statistics that are
  * normally float-sum order-dependent (corr/covar) are rebuilt from
  * decimal-routed moment sums so both engines compute identical doubles.
  */
object MiscQueries {

  /** Q60 pivot: order counts per priority × status (fixed pivot values). */
  private def q60(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
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

  /** Q62 correlation/covariance from decimal moment sums (the builtin corr
    * is a float running sum — order-dependent across engines; the moment
    * formula over exact sums is not).
    */
  private def q62(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    // Price rescaled by 1000 so every moment sum fits DECIMAL(18,6) — the
    // long-backed fast path (precision > 18 decimals fall back to per-row
    // BigDecimal and were ~10× slower). corr is scale-invariant; covar is
    // scaled back on output.
    val pk = col("l_extendedprice") / lit(1000.0)
    val agged = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sx"),
      sum(pk.cast("decimal(18,6)")).cast("double").as("sy"),
      sum((col("l_quantity") * col("l_quantity")).cast("decimal(18,6)"))
        .cast("double").as("sxx"),
      sum((pk * pk).cast("decimal(18,6)")).cast("double").as("syy"),
      sum((col("l_quantity") * pk).cast("decimal(18,6)")).cast("double").as("sxy"))
    // The moment sums exceed double precision (second moments of prices over
    // 1e5+ rows), and decimal→double conversion may double-round in one
    // engine and single-round in the other — last-ulp divergence observed.
    // Outputs are therefore rounded with a ~1e6 margin over that error.
    agged.select(col("l_returnflag"), col("n"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 9).as("corr_qty_price"),
      round(((col("sxy") - (col("sx") * col("sy")) / col("n")) / col("n")) * lit(1000.0), 2)
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

  /** Q64 time-bin resample: 15-minute bins over the event stream (ts is
    * read as nanos-long; pure integral arithmetic on both engines).
    */
  private def q64(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_pivot" -> (q60 _),
    "q61_percentile" -> (q61 _),
    "q62_corr" -> (q62 _),
    "q63_edit_distance" -> (q63 _),
    "q64_resample" -> (q64 _),
    "q65_collect_sorted" -> (q65 _))

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
        |       round(((sxy - (sx * sy) / n) / n) * 1000.0, 2) AS covar_pop
        |FROM (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(l_extendedprice / 1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST((l_extendedprice / 1000.0) * (l_extendedprice / 1000.0) AS DECIMAL(18,6))) AS DOUBLE) AS syy,
        |         CAST(sum(CAST(l_quantity * (l_extendedprice / 1000.0) AS DECIMAL(18,6))) AS DOUBLE) AS sxy
        |  FROM lineitem
        |  GROUP BY 1) t""".stripMargin,
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
        |GROUP BY 1""".stripMargin)
}
