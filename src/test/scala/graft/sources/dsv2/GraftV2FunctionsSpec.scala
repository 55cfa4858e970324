package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.IcebergTransforms
import org.apache.spark.sql.functions._

/** The V2 catalog functions (`graft.system.bucket/truncate/years/...`)
  * MUST be bit-equal to the write-side fanout transforms
  * ([[IcebergTransforms]]): a reported `KeyGroupedPartitioning` claims
  * "rows here satisfy transform(src) = key" and the storage-partitioned
  * join planner trusts it — one divergent value (e.g. a pre-epoch hour
  * truncated instead of floored) silently mis-joins.
  */
class GraftV2FunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("catalog functions ≡ write-side transforms on edge values") {
    val root = Files.createTempDirectory("graft-v2fn").toString
    val g = s"gfn_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)

    // pre-epoch fractional times are the trap: floor vs truncate differ
    val stamps = Seq(
      "1969-12-31 23:30:00", "1969-07-04 01:02:03", "1900-02-28 23:59:59",
      "1970-01-01 00:00:00", "1970-01-01 00:59:59", "1970-01-01 01:00:00",
      "2023-03-15 17:45:10", "2100-12-31 00:00:01")
    val keys = Seq(Long.MinValue + 1, -1234567L, -7L, 0L, 7L, 41L,
      987654321L, Long.MaxValue)
    require(stamps.length == keys.length)
    stamps.zip(keys).toDF("s", "k")
      .select(to_timestamp(col("s")).as("t"), to_date(col("s")).as("d"),
        col("k"))
      .createOrReplaceTempView("v2fn_vals")

    val viaFns = spark.sql(
      s"""SELECT $g.system.years(t), $g.system.months(t), $g.system.days(t),
         |       $g.system.hours(t),
         |       $g.system.years(d), $g.system.months(d), $g.system.days(d),
         |       $g.system.bucket(16, k), $g.system.truncate(10, k),
         |       $g.system.truncate(3, CAST(k AS STRING))
         |FROM v2fn_vals""".stripMargin).collect().map(_.toSeq)

    val viaTransforms = spark.table("v2fn_vals").select(
      IcebergTransforms.yearsT(col("t")), IcebergTransforms.monthsT(col("t")),
      IcebergTransforms.daysT(col("t")), IcebergTransforms.hoursT(col("t")),
      IcebergTransforms.yearsT(col("d")), IcebergTransforms.monthsT(col("d")),
      IcebergTransforms.daysT(col("d")),
      IcebergTransforms.bucketT(16, col("k")),
      IcebergTransforms.truncateT(10, col("k"), isString = false),
      IcebergTransforms.truncateT(3, col("k").cast("string"), isString = true))
      .collect().map(_.toSeq)

    viaFns.zip(viaTransforms).zipWithIndex.foreach { case ((f, t), i) =>
      assert(f == t, s"row $i: catalog functions $f != transforms $t")
    }
  }
}
