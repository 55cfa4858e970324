package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator module contributes a `queries` map (name → (spark, sfDir) →
  * DataFrame) and an `oracleSql` map (name → equivalent DuckDB SQL over the
  * same parquet tables). Names and output column aliases MUST match between
  * the two — the driver sorts columns by name and hash-compares values.
  */
object SparkEntry {

  /** Flagship: the full merge-on-read compaction query on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    MorQueries.queries("q3_mor_full")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MorQueries.queries ++ TransformQueries.queries ++
      JoinQueries.queries ++ AggQueries.queries ++ MiscQueries.queries ++
      TpchQueries.queries ++ TpchDeepQueries.queries ++
      graft.functions.ScalarQueries.queries ++
      graft.pipeline.PipelineQueries.queries ++
      graft.plans.PlanQueries.queries ++
      graft.streaming.StreamQueries.queries ++
      graft.wire.WireQueries.queries

  def oracleSql: Map[String, String] =
    MorQueries.oracleSql ++ TransformQueries.oracleSql ++
      JoinQueries.oracleSql ++ AggQueries.oracleSql ++ MiscQueries.oracleSql ++
      TpchQueries.oracleSql ++ TpchDeepQueries.oracleSql ++
      graft.functions.ScalarQueries.oracleSql ++
      graft.pipeline.PipelineQueries.oracleSql ++
      graft.plans.PlanQueries.oracleSql ++
      graft.streaming.StreamQueries.oracleSql ++
      graft.wire.WireQueries.oracleSql
}
