package graft.sources

import graft.sources.CompactionRunner.CompactionConfig
import org.apache.spark.sql.SparkSession

/** Standalone compaction scheduler — the reference's roadmap component
  * (`README.md:32` "Standalone scheduler component"): the cadence loop a
  * deployment runs against a whole catalog instead of hand-invoking
  * per-table compactions.
  *
  * One [[sweep]]:
  *
  *  1. enumerate the catalog's tables (forks skipped — `name@branch`
  *     staging areas are published, not compacted in place);
  *  2. score each by small-file DEBT from snapshot metadata alone
  *     ([[GraftCatalog.compactionDebt]] — no Spark job for healthy
  *     tables, so a sweep over a mostly-idle catalog costs metadata);
  *  3. compact worst-first through [[GraftCatalog.maybeCompactTable]]
  *     (threshold-gated, incremental — each run costs the delta);
  *  4. run up to `maxConcurrent` table compactions at once (Spark
  *     schedules concurrent jobs from separate threads fairly);
  *  5. treat a typed commit conflict as SKIPPED, not failed — another
  *     driver compacting the same table first IS the work getting done.
  *
  * Per-table outcomes come back as [[CompactionScheduler.Outcome]]s;
  * callers loop sweeps on their own timer.
  */
final class CompactionScheduler(
    catalog: GraftCatalog,
    outRoot: String,
    minAppendedFiles: Int = 8,
    maxConcurrent: Int = 2,
    minDeleteFiles: Int = 8) {

  require(minAppendedFiles > 0, "minAppendedFiles must be positive")
  require(maxConcurrent > 0, "maxConcurrent must be positive")
  require(minDeleteFiles > 1, "minDeleteFiles must exceed the 1-file floor")

  private val sweepCounter = new java.util.concurrent.atomic.AtomicLong()

  /** One full sweep. With `refreshStats` the sweep also scores
    * re-ANALYZE debt alongside the compaction debts and appends
    * [[statsSweep]]'s outcomes — one call runs the whole maintenance
    * loop (compaction retires deletes, which STALES any recorded
    * sketches; sweeping statistics after compaction repairs them in the
    * same pass).
    */
  def sweep(
      spark: SparkSession,
      config: CompactionConfig = CompactionConfig(),
      refreshStats: Boolean = false)
      : Seq[CompactionScheduler.Outcome] = {
    val sweepId = sweepCounter.incrementAndGet()
    val scored = catalog.tables()
      .filterNot(_.contains("@"))
      .map(t => t -> catalog.compactionDebt(t))
      .sortBy { case (t, d) => (-d, t) } // worst debt first, then stable
    val pool = java.util.concurrent.Executors.newFixedThreadPool(maxConcurrent)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futures = scored.map { case (table, debt) =>
        scala.concurrent.Future {
          if (debt < minAppendedFiles) {
            // append side healthy — check the DELETE side: per-commit
            // small delete files cost every MoR scan a file open, and
            // retiring them is far cheaper than a data rewrite
            val dDebt = catalog.deleteFileDebt(table)
            if (dDebt < minDeleteFiles)
              CompactionScheduler.Outcome(table, debt, "healthy", None)
            else try {
              val snap = catalog.compactDeleteFiles(spark, table,
                s"$outRoot/$table/sweep-$sweepId-deletes")
              CompactionScheduler.Outcome(
                table, dDebt, "deletes_compacted", Some(snap))
            } catch {
              case _: GraftError.Metadata =>
                CompactionScheduler.Outcome(table, dDebt, "conflict", None)
            }
          } else try {
            catalog.maybeCompactTable(spark, table,
              s"$outRoot/$table/sweep-$sweepId", minAppendedFiles, config) match {
              case Some((snap, _)) =>
                CompactionScheduler.Outcome(table, debt, "compacted", Some(snap))
              case None => // another driver drained the debt since scoring
                CompactionScheduler.Outcome(table, debt, "healthy", None)
            }
          } catch {
            case _: GraftError.Metadata =>
              CompactionScheduler.Outcome(table, debt, "conflict", None)
          }
        }
      }
      val compacted = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf)
      if (refreshStats) compacted ++ statsSweep(spark, minAppendedFiles)
      else compacted
    } finally pool.shutdown()
  }

  /** Statistics-maintenance twin of [[sweep]] — the 100 TB answer to
    * sketches going silently stale: theta NDVs cannot subtract, so a
    * planner consuming month-old estimates on a churned table gets
    * silently-optimistic plans. For every ANALYZED table (statistics are
    * opt-in; never-analyzed tables are skipped), a STALE sketch
    * ([[GraftCatalog.statsChurn]]: rows removed by MoR deletes, COW
    * rewrites, or compactions — or an expired, unprovable base) gets a
    * FULL re-analyze; a fresh-but-behind sketch with at least
    * `minAddedFiles` new data files gets the cheap INCREMENTAL union
    * (delta files only). Outcomes: `re_analyzed` (full pass ran),
    * `stats_refreshed` (incremental ran), `stats_fresh` (no debt),
    * `analyze_failed` (kept sweeping — one sick table must not stop
    * maintenance of the rest).
    */
  def statsSweep(
      spark: SparkSession,
      minAddedFiles: Int = 8): Seq[CompactionScheduler.Outcome] =
    catalog.tables().filterNot(_.contains("@")).sorted.flatMap { table =>
      catalog.statsChurn(table).map { churn =>
        val fullDebt = churn.removedDataFiles + churn.addedDeleteFiles +
          churn.removedDeleteFiles + (if (churn.baseExpired) 1 else 0)
        try {
          if (churn.stale) {
            catalog.computeTableStats(spark, table, incremental = false)
            CompactionScheduler.Outcome(table, fullDebt, "re_analyzed",
              Some(catalog.currentSnapshotId(table)))
          } else if (churn.addedDataFiles >= minAddedFiles) {
            catalog.computeTableStats(spark, table, incremental = true)
            CompactionScheduler.Outcome(table, churn.addedDataFiles,
              "stats_refreshed", Some(catalog.currentSnapshotId(table)))
          } else CompactionScheduler.Outcome(table, 0, "stats_fresh", None)
        } catch {
          case _: Exception =>
            CompactionScheduler.Outcome(table, fullDebt, "analyze_failed", None)
        }
      }
    }
}

object CompactionScheduler {

  /** What one sweep did to one table: `outcome` ∈ `healthy` (both debts
    * below threshold — metadata checks only), `compacted` (data rewrite
    * committed), `deletes_compacted` (append side healthy but the
    * position-delete file count crossed `minDeleteFiles`, so the cheap
    * [[GraftCatalog.compactDeleteFiles]] ran — `debt` then reports the
    * DELETE-file count), `conflict` (another driver won the commit race;
    * the debt is being drained regardless).
    */
  final case class Outcome(
      table: String,
      debt: Int,
      outcome: String,
      snapshotId: Option[Long])
}
