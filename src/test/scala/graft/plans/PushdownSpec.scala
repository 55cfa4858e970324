package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.IcebergTransforms
import org.apache.spark.sql.functions._

/** Verifies that Catalyst actually delivers the scan-side optimizations the
  * engine relies on (SURVEY §2 rows S5/P2/P3): predicate pushdown into the
  * parquet scan, column pruning to the read schema, and partition pruning on
  * fanout-written tables.
  */
class PushdownSpec extends SparkSpec {

  test("filter predicates reach the parquet scan (S5/P3)") {
    val plan = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 45).select(col("l_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(l_quantity"),
      s"filter not pushed to scan:\n$plan")
  }

  test("projection prunes the read schema (P2)") {
    val plan = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"),
      s"scan reads pruned columns:\n$readSchema")
  }

  test("partition pruning on a fanout-written table") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.lineitem(spark, sfDir)
      .withColumn("p_year", IcebergTransforms.yearsT(col("l_shipdate")))
      .write.partitionBy("p_year").mode("overwrite").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("p_year") === 25)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_year"),
      s"no partition filter in scan:\n$plan")
    // pruning is effective: scan reads fewer files than the full table
    val allFiles = pruned.select(col("_metadata.file_path")).distinct().count()
    val totalFiles = spark.read.parquet(out)
      .select(col("_metadata.file_path")).distinct().count()
    assert(allFiles < totalFiles)
  }
}
