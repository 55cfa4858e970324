package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

/** The standalone scheduler: debt-scored, worst-first, threshold-gated
  * sweeps over a whole catalog, with forks excluded and sweeps idempotent
  * once debt is drained.
  */
class CompactionSchedulerSpec extends SparkSpec {

  import spark.implicits._

  private def addTable(cat: GraftCatalog, name: String, nFiles: Int): Unit = {
    val base = Files.createTempDirectory(s"graft-sched-$name").toString
    (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(nFiles).write.mode("overwrite").parquet(s"$base/b0")
    cat.createTable(name,
      CompactionRunner.listParquet(s"$base/b0").map(DataFileTask(_, 1L)))
  }

  test("sweep compacts indebted tables worst-first, skips healthy and forks") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-sched-cat").toString)
    addTable(cat, "big", 12) // above threshold
    addTable(cat, "mid", 9) // above threshold
    addTable(cat, "small", 3) // below threshold
    cat.forkTable("big", "audit") // must be ignored entirely

    val sched = new CompactionScheduler(cat,
      Files.createTempDirectory("graft-sched-out").toString,
      minAppendedFiles = 8, maxConcurrent = 2)
    val report = sched.sweep(spark)

    assert(report.map(_.table) == Seq("big", "mid", "small"),
      s"worst-first order violated: ${report.map(r => r.table -> r.debt)}")
    assert(report.find(_.table == "big").get.outcome == "compacted")
    assert(report.find(_.table == "mid").get.outcome == "compacted")
    assert(report.find(_.table == "small").get.outcome == "healthy")
    assert(!report.exists(_.table.contains("@")))

    // compaction actually drained the debt and preserved rows
    assert(cat.loadTable("big").size < 12)
    assert(cat.scanTable(spark, "big").count() == 100L)

    // a second sweep finds everything healthy (idempotent at cadence)
    val again = sched.sweep(spark)
    assert(again.forall(_.outcome == "healthy"), again.mkString(", "))

    // new appends re-open debt; only the appended table recompacts
    val extra = Files.createTempDirectory("graft-sched-extra").toString
    (1L to 80L).map(k => (k, "w")).toDF("k", "v")
      .repartition(8).write.mode("overwrite").parquet(s"$extra/d")
    cat.commitRewrite("big",
      CompactionRunner.listParquet(s"$extra/d")
        .map(DataFileTask(_, cat.currentSnapshotId("big") + 1)), Nil)
    val third = sched.sweep(spark)
    assert(third.find(_.table == "big").get.outcome == "compacted")
    assert(third.filterNot(_.table == "big").forall(_.outcome == "healthy"))
    assert(cat.scanTable(spark, "big").count() == 180L)
  }

  test("delete-file debt alone triggers the cheap delete compaction, not a rewrite") {
    import org.apache.spark.sql.functions.col
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-sched-cat2").toString)
    addTable(cat, "t", 2) // append side healthy (2 < 8)
    val out = Files.createTempDirectory("graft-sched-out2").toString
    // four row-level DELETE commits accumulate small delete files
    (1 to 4).foreach(i =>
      cat.deleteWhere(spark, "t", col("k") === (i * 10L), s"$out/d$i"))
    val dDebt = cat.deleteFileDebt("t")
    assert(dDebt >= 4)
    val expect = cat.scanTable(spark, "t").count()

    val sched = new CompactionScheduler(cat, out,
      minAppendedFiles = 8, maxConcurrent = 2, minDeleteFiles = 3)
    val report = sched.sweep(spark)
    val o = report.find(_.table == "t").get
    assert(o.outcome == "deletes_compacted" && o.debt == dDebt, o)
    assert(cat.deleteFileDebt("t") == 1, "deletes not collapsed")
    assert(cat.loadTable("t").size == 2, "data files must be untouched")
    assert(cat.scanTable(spark, "t").count() == expect)

    // drained: the next sweep is metadata-only healthy
    assert(sched.sweep(spark).find(_.table == "t").get.outcome == "healthy")
  }
}
