package graft.operators

import graft.Tables
import graft.functions.IcebergTransforms._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q5 family — Iceberg partition transforms as queries (SURVEY §2.6).
  * Both are DuckDB-oracle-checked: `q5_bucket`'s oracle re-implements
  * murmur3_x86_32 for 8-byte little-endian inputs as a CTE chain of 32-bit
  * arithmetic steps (masked BIGINT/HUGEINT ops), and handles the 3-value
  * string column with bucket constants derived from an independent
  * implementation validated against the Iceberg spec's published vectors.
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

  /** Q113: the z-order (Morton) layout transform as a gate query — the
    * clustering key of [[graft.sources.CompactionRunner]]'s zOrderBy
    * rewrite, pinned value-exact against an oracle that unrolls the same
    * 16-bit interleave as plain shift/mask arithmetic. Grouped by z-bucket
    * (bits ≥16) to keep the output small while covering the full curve.
    */
  private def q113(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val z = graft.functions.ZOrder.interleaveC(
      col("l_partkey") % 65536, col("l_suppkey") % 65536)
    li.select(shiftright(z, 16).as("z_bucket"), z.as("zval"))
      .groupBy(col("z_bucket"))
      .agg(count(lit(1)).as("n"), min(col("zval")).as("z_min"),
        max(col("zval")).as("z_max"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q5_transforms" -> (q5 _),
    "q5_bucket" -> (q5b _),
    "q113_zorder" -> (q113 _))

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
        |GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin,
    // murmur3_x86_32 over the two 4-byte little-endian blocks of a long,
    // then Iceberg's (hash & Int.MaxValue) % n. Constants are the public
    // murmur3 constants; 32-bit wraparound emulated with % 2^32 (HUGEINT
    // for the multiplies). String buckets for the 3 flag values are
    // spec-derived constants ('A'→6, 'N'→1, 'R'→1 at n=8).
    "q5_bucket" ->
      """WITH raw AS (
        |  SELECT l_orderkey AS okey, epoch_us(l_shipdate) AS sd_us, l_returnflag AS flag
        |  FROM lineitem),
        |vals AS (SELECT DISTINCT v FROM (SELECT okey AS v FROM raw UNION SELECT sd_us FROM raw) t),
        |b0 AS (SELECT v, v & 4294967295 AS k1, (v >> 32) & 4294967295 AS k2 FROM vals),
        |s1 AS (SELECT v, k2, CAST((CAST(k1 AS HUGEINT) * 3432918353) % 4294967296 AS BIGINT) AS k1 FROM b0),
        |s2 AS (SELECT v, k2, ((k1 << 15) | (k1 >> 17)) & 4294967295 AS k1 FROM s1),
        |s3 AS (SELECT v, k2, CAST((CAST(k1 AS HUGEINT) * 461845907) % 4294967296 AS BIGINT) AS k1 FROM s2),
        |s4 AS (SELECT v, k2, k1 AS h FROM s3),
        |s5 AS (SELECT v, k2, ((h << 13) | (h >> 19)) & 4294967295 AS h FROM s4),
        |s6 AS (SELECT v, k2, CAST((CAST(h AS HUGEINT) * 5 + 3864292196) % 4294967296 AS BIGINT) AS h FROM s5),
        |t1 AS (SELECT v, h, CAST((CAST(k2 AS HUGEINT) * 3432918353) % 4294967296 AS BIGINT) AS k2 FROM s6),
        |t2 AS (SELECT v, h, ((k2 << 15) | (k2 >> 17)) & 4294967295 AS k2 FROM t1),
        |t3 AS (SELECT v, h, CAST((CAST(k2 AS HUGEINT) * 461845907) % 4294967296 AS BIGINT) AS k2 FROM t2),
        |t4 AS (SELECT v, xor(h, k2) AS h FROM t3),
        |t5 AS (SELECT v, ((h << 13) | (h >> 19)) & 4294967295 AS h FROM t4),
        |t6 AS (SELECT v, CAST((CAST(h AS HUGEINT) * 5 + 3864292196) % 4294967296 AS BIGINT) AS h FROM t5),
        |f0 AS (SELECT v, xor(h, 8) AS h FROM t6),
        |f1 AS (SELECT v, xor(h, h >> 16) AS h FROM f0),
        |f2 AS (SELECT v, CAST((CAST(h AS HUGEINT) * 2246822507) % 4294967296 AS BIGINT) AS h FROM f1),
        |f3 AS (SELECT v, xor(h, h >> 13) AS h FROM f2),
        |f4 AS (SELECT v, CAST((CAST(h AS HUGEINT) * 3266489909) % 4294967296 AS BIGINT) AS h FROM f3),
        |hv AS (SELECT v, xor(h, h >> 16) AS h FROM f4)
        |SELECT CAST((h1.h & 2147483647) % 16 AS INTEGER) AS b_orderkey,
        |       CAST(CASE r.flag WHEN 'A' THEN 6 WHEN 'N' THEN 1 WHEN 'R' THEN 1 END AS INTEGER) AS b_flag,
        |       CAST((h2.h & 2147483647) % 4 AS INTEGER) AS b_shipdate,
        |       count(*) AS n
        |FROM raw r JOIN hv h1 ON h1.v = r.okey JOIN hv h2 ON h2.v = r.sd_us
        |GROUP BY 1, 2, 3""".stripMargin,
    "q113_zorder" -> {
      // the kernel's 16-bit Morton interleave, unrolled to shift/mask terms
      val interleave = (0 until 16).map(i =>
        s"(((a >> $i) & 1) << ${2 * i}) + (((b >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH t AS (
         |  SELECT l_partkey % 65536 AS a, l_suppkey % 65536 AS b
         |  FROM lineitem),
         |z AS (SELECT CAST($interleave AS BIGINT) AS zval FROM t)
         |SELECT zval >> 16 AS z_bucket, CAST(count(*) AS BIGINT) AS n,
         |       min(zval) AS z_min, max(zval) AS z_max
         |FROM z GROUP BY 1""".stripMargin
    })
}
