package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.{CompactionConfig, DataFileTask}
import java.nio.file.Files

import org.apache.spark.sql.functions.col

/** Catalog-persisted file stats + stats-pruned scans (`scanTableWhere`) —
  * Iceberg's manifest-level file skipping: a clustered compaction commit
  * writes per-file bounds into the snapshot, and a narrow predicate then
  * scans only intersecting files while remaining row-for-row equal to the
  * unpruned filter.
  */
class StatsPruningSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(Files.createTempDirectory("graft-prune-cat").toString)

  private def clusteredTable(cat: GraftCatalog): Unit = {
    val base = Files.createTempDirectory("graft-prune-base").toString
    (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/b0")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$base/b0").map(DataFileTask(_, 1L)))
    cat.compactTable(spark, "t",
      s"${Files.createTempDirectory("graft-prune-out")}",
      CompactionConfig(targetPartitions = 8, clusterBy = Seq("k"),
        statsCols = Seq("k")))
  }

  test("clustered compaction persists bounds; narrow scan reads fewer files, same rows") {
    val cat = newCatalog()
    clusteredTable(cat)

    val entries = cat.loadEntries("t")
    assert(entries.forall(e => e.kind != "data" || e.stats.isDefined),
      "compacted data entries must carry stats")
    // bounds survive the TSV snapshot round-trip as parseable numbers
    entries.filter(_.kind == "data").foreach { e =>
      val s = e.stats.get
      assert(s.colMins("k").toDouble <= s.colMaxs("k").toDouble)
    }

    val pruned = cat.scanTableWhere(spark, "t", "k", 90, 110)
    val full = cat.scanTable(spark, "t").filter(col("k") >= 90 && col("k") <= 110)
    assert(pruned.inputFiles.length < cat.loadTable("t").size,
      "narrow range must skip files on 8 near-disjoint clustered outputs")
    assert(pruned.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      == full.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq)

    // a range outside every bound: provably empty without scanning
    val none = cat.scanTableWhere(spark, "t", "k", 5000, 6000)
    assert(none.inputFiles.isEmpty && none.count() == 0)

    // stats-less column: conservatively scans everything, still exact
    val byV = cat.scanTableWhere(spark, "t", "k", 1, 400)
    assert(byV.count() == 400)
  }

  test("pending deletes still apply on the pruned scan") {
    val cat = newCatalog()
    clusteredTable(cat)
    val out = Files.createTempDirectory("graft-prune-del").toString
    cat.deleteWhere(spark, "t", col("k") === 100, out)

    val got = cat.scanTableWhere(spark, "t", "k", 90, 110)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (90L to 110L).filterNot(_ == 100L))
  }

  test("pruning is conservative for files without stats (plain commits)") {
    val cat = newCatalog()
    clusteredTable(cat)
    // append a stats-less file overlapping the probe range
    val base = Files.createTempDirectory("graft-prune-extra").toString
    Seq((95L, "EXTRA")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$base/b1")
    cat.commitRewrite("t",
      CompactionRunner.listParquet(s"$base/b1").map(DataFileTask(_, 9L)), Nil)

    val got = cat.scanTableWhere(spark, "t", "k", 90, 110)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.contains((95L, "EXTRA")), "stats-less file must always be scanned")
    assert(got.count(_._1 == 95L) == 2)
  }
}
