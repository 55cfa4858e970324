package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Bridge into Spark's `private[sql]` parquet WRITE plumbing — the same
  * `OutputWriterFactory` the built-in `FileFormatWriter` uses, so files
  * written by graft's DSv2 `DataWriter`s are byte-compatible with
  * `spark.write.parquet` output (footer field-id metadata, statistics,
  * compression all included). Lives in an `org.apache.spark` subpackage
  * solely to satisfy the access modifiers; executors call only
  * [[newWriter]] with the serializable pieces prepared on the driver by
  * [[writerFactory]].
  */
object ParquetWriteBridge {

  /** Driver side: a serializable parquet writer factory for `schema` plus
    * the task-shippable Hadoop conf, capturing the session's SQL conf
    * (compression codec, rebase modes, timestamp type) exactly like the
    * built-in write path. `prepareWrite` mutates the JOB's configuration
    * (write-support class, schema), so THAT conf is the one shipped.
    */
  def prepare(
      spark: org.apache.spark.sql.SparkSession,
      schema: StructType,
      conf: Configuration): (OutputWriterFactory, SerializableConfiguration) = {
    val job = Job.getInstance(conf)
    val factory = new ParquetFileFormat().prepareWrite(
      spark, job, Map.empty[String, String], schema)
    (factory, new SerializableConfiguration(job.getConfiguration))
  }

  def hadoopConfOf(spark: org.apache.spark.sql.SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  /** Executor side: open one parquet output file at `path`. */
  def newWriter(
      factory: OutputWriterFactory,
      conf: SerializableConfiguration,
      schema: StructType,
      path: String,
      partitionId: Int,
      taskId: Long): OutputWriter = {
    val attempt = new TaskAttemptID(
      new TaskID(new org.apache.hadoop.mapreduce.JobID("graft", 0),
        TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val ctx = new TaskAttemptContextImpl(conf.value, attempt)
    factory.newInstance(path, schema, ctx)
  }

  /** The row type the writers consume (re-exported for graft-side code). */
  type Row = InternalRow
}
