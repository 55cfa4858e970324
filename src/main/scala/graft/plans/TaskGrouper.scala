package graft.plans

import scala.collection.mutable

/** Balanced file-scan-task grouping — greedy longest-processing-time (LPT)
  * style bin packing into a fixed number of groups, as the reference does
  * when splitting FileScanTasks across `batch_parallelism` scan streams
  * (`core/src/executor/datafusion/iceberg_file_task_scan.rs:114-170`).
  *
  * Spark normally does its own split packing
  * (`spark.sql.files.maxPartitionBytes` / `openCostInBytes`); this planner
  * utility exists for file-group parity when orchestrating compaction jobs
  * (grouping whole files into N rewrite jobs of similar byte size).
  *
  * Deterministic: tasks are assigned in input order, each to the currently
  * smallest group (ties broken by lowest group index). Pure function —
  * property-tested in `TaskGrouperSpec` (balance bound + permutation
  * determinism, mirroring the reference's 10k-iteration determinism test).
  */
object TaskGrouper {

  final case class ScanTask(path: String, lengthBytes: Long)

  def group(tasks: Seq[ScanTask], numGroups: Int): Vector[Vector[ScanTask]] = {
    require(numGroups > 0, s"numGroups must be positive, got $numGroups")
    if (tasks.isEmpty) return Vector.fill(numGroups)(Vector.empty)
    // min-heap of (currentBytes, groupIndex); stable tie-break on index
    implicit val ord: Ordering[(Long, Int)] =
      Ordering.Tuple2(Ordering.Long.reverse, Ordering.Int.reverse)
    val heap = mutable.PriorityQueue.empty[(Long, Int)]
    (0 until numGroups).foreach(i => heap.enqueue((0L, i)))
    val groups = Array.fill(numGroups)(Vector.newBuilder[ScanTask])
    tasks.foreach { t =>
      val (bytes, idx) = heap.dequeue()
      groups(idx) += t
      heap.enqueue((bytes + t.lengthBytes, idx))
    }
    groups.map(_.result()).toVector
  }

  /** Max group byte size; useful for asserting the balance bound. */
  def groupBytes(groups: Vector[Vector[ScanTask]]): Vector[Long] =
    groups.map(_.map(_.lengthBytes).sum)
}
