package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to Spark 4's `private[sql]` Dataset.ofRows — the one doorway a
  * library needs to surface a custom [[LogicalPlan]] (e.g. graft's as-of
  * join) as a public DataFrame. Same narrow-access rationale as
  * [[ColumnBridge]].
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
