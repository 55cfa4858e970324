package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both fact tables on the join key
  * removes the per-query shuffle entirely — the pattern that amortizes one
  * write-time shuffle across every subsequent join at 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of tables bucketed on the join key plans without a shuffle") {
    // default warehouse dir (spark-warehouse under cwd); tables dropped after
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and it is still correct
    val expected = Tables.lineitem(spark, sfDir).select(col("l_orderkey"))
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }
}
