package graft.operators

import graft.Tables
import graft.functions.IcebergTransforms._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q5 family — Iceberg partition transforms as queries (SURVEY §2.6).
  * `q5_transforms` is DuckDB-oracle-checked; `q5_bucket` has no SQL oracle
  * (DuckDB lacks Iceberg's murmur3) and is instead locked to the spec's
  * published hash vectors in `Murmur3Spec` + rows-only checked by the driver.
  */
object TransformQueries {

  private def q5(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.select(
        yearsT(col("l_shipdate")).cast("long").as("t_year"),
        monthsT(col("l_shipdate")).cast("long").as("t_month"),
        daysT(col("l_shipdate")).cast("long").as("t_day"),
        hoursT(col("l_shipdate")).cast("long").as("t_hour"),
        truncateT(7, col("l_partkey"), isString = false).as("t_trunc_int"),
        truncateT(1, col("l_returnflag"), isString = true).as("t_trunc_str"))
      .groupBy("t_year", "t_month", "t_day", "t_hour", "t_trunc_int", "t_trunc_str")
      .agg(count(lit(1)).as("n"))
  }

  private def q5b(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.select(
        bucketT(16, col("l_orderkey")).as("b_orderkey"),
        bucketT(8, col("l_returnflag")).as("b_flag"),
        bucketT(4, col("l_shipdate")).as("b_shipdate"))
      .groupBy("b_orderkey", "b_flag", "b_shipdate")
      .agg(count(lit(1)).as("n"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q5_transforms" -> (q5 _),
    "q5_bucket" -> (q5b _))

  val oracleSql: Map[String, String] = Map(
    "q5_transforms" ->
      """SELECT year(l_shipdate) - 1970 AS t_year,
        |       (year(l_shipdate) - 1970) * 12 + month(l_shipdate) - 1 AS t_month,
        |       datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS t_day,
        |       CAST(floor(epoch(l_shipdate) / 3600) AS BIGINT) AS t_hour,
        |       l_partkey - ((l_partkey % 7 + 7) % 7) AS t_trunc_int,
        |       substr(l_returnflag, 1, 1) AS t_trunc_str,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin)
}
