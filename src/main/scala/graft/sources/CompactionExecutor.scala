package graft.sources

import graft.sources.CompactionRunner._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Executor seam mirroring the reference's `CompactionExecutor` trait
  * (`core/src/executor/mod.rs`): the compaction driver and the service
  * facades call `rewriteFiles` through this interface, so tests (and any
  * alternative engine) can stand in for the Spark execution path exactly
  * the way the reference swaps its DataFusion executor for
  * `MockExecutor` (`core/src/executor/mock.rs`).
  */
trait CompactionExecutor {
  def rewriteFiles(
      spark: SparkSession,
      dataTasks: Seq[DataFileTask],
      posDeletes: Seq[PosDeleteTask],
      eqDeletes: Seq[EqDeleteTask],
      outDir: String,
      config: CompactionConfig = CompactionConfig(),
      canonicalSchema: Option[StructType] = None): CommitManifest
}

/** The real engine: delegates to [[CompactionRunner.compact]]. */
object SparkCompactionExecutor extends CompactionExecutor {
  override def rewriteFiles(
      spark: SparkSession,
      dataTasks: Seq[DataFileTask],
      posDeletes: Seq[PosDeleteTask],
      eqDeletes: Seq[EqDeleteTask],
      outDir: String,
      config: CompactionConfig,
      canonicalSchema: Option[StructType]): CommitManifest =
    CompactionRunner.compact(
      spark, dataTasks, posDeletes, eqDeletes, outDir, config, canonicalSchema)
}

/** No-op executor for tests — the reference's `MockExecutor` returns an
  * empty `RewriteFilesResponse` without touching any file; this returns an
  * empty manifest the same way (nothing read, nothing written, zero
  * stats), while recording the request so callers can assert routing.
  */
final class MockCompactionExecutor extends CompactionExecutor {
  @volatile var lastRequest
      : Option[(Seq[DataFileTask], Seq[PosDeleteTask], Seq[EqDeleteTask], String)] =
    None

  override def rewriteFiles(
      spark: SparkSession,
      dataTasks: Seq[DataFileTask],
      posDeletes: Seq[PosDeleteTask],
      eqDeletes: Seq[EqDeleteTask],
      outDir: String,
      config: CompactionConfig,
      canonicalSchema: Option[StructType]): CommitManifest = {
    lastRequest = Some((dataTasks, posDeletes, eqDeletes, outDir))
    CommitManifest(
      addedFiles = Seq.empty,
      removedDataFiles = Seq.empty,
      removedDeleteFiles = Seq.empty,
      outputRecordCount = 0L)
  }
}
