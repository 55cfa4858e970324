package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{CompactionRunner, GraftCatalog}
import graft.sources.CompactionRunner.DataFileTask

/** The SQL maintenance TVFs ([[GraftMaintenancePlan]] via
  * `graft_compact` / `graft_expire` / `graft_rollback`) — the `CALL`
  * procedure surface. Pins the two contracts the gate (q138) can't see:
  * EXPLAIN must NOT execute the operation, and each TVF's result row must
  * agree with the catalog API it wraps.
  */
class SqlMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  /** 3 appended file generations + a MoR delete: compactable debt. */
  private def debtTable(): (GraftCatalog, String) = {
    val root = Files.createTempDirectory("graft-maint").toString
    val cat = new GraftCatalog(root)
    (10L until 20L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$root/stage1")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$root/stage1").map(DataFileTask(_, 1L)))
    (2 to 3).foreach { g =>
      cat.appendFiles(spark, "t",
        ((g * 10L) until (g * 10L + 10L)).map(k => (k, s"v$k")).toDF("k", "v"),
        s"$root/stage$g")
    }
    cat.deleteWhere(spark, "t",
      org.apache.spark.sql.functions.col("k") % 2 === 0, s"$root/d")
    (cat, root)
  }

  private def deleteEntryCount(cat: GraftCatalog, root: String): Long =
    cat.metadataTable(spark, "t", "files")
      .filter("content <> 'data'").count()

  test("EXPLAIN graft_compact plans without committing") {
    val (cat, root) = debtTable()
    val head = cat.currentSnapshotId("t")
    val plan = spark.sql(s"EXPLAIN SELECT * FROM graft_compact('$root','t')")
      .collect().head.getString(0)
    assert(plan.contains("GraftMaintenance"),
      s"maintenance exec node missing from plan:\n$plan")
    assert(cat.currentSnapshotId("t") == head,
      "EXPLAIN must not run the compaction")
    assert(deleteEntryCount(cat, root) >= 1,
      "EXPLAIN must leave the pending delete files in place")
  }

  test("graft_compact('full') retires deletes and matches the API result") {
    val (cat, root) = debtTable()
    val before = cat.scanTable(spark, "t").orderBy("k").collect().toSeq
    val row = spark.sql(
      s"SELECT * FROM graft_compact('$root','t','full')").collect().head
    assert(row.getLong(0) == cat.currentSnapshotId("t"),
      "returned snapshot_id must be the committed head")
    assert(row.getLong(2) >= 1, "the pending pos-delete file must be retired")
    assert(row.getLong(4) == before.size,
      "output_records must equal the surviving row count")
    assert(deleteEntryCount(cat, root) == 0,
      "full compaction leaves no delete entries")
    assert(cat.scanTable(spark, "t").orderBy("k").collect().toSeq == before,
      "compaction must not change table contents")
  }

  test("graft_compact default mode is incremental: second call is a no-op") {
    val (cat, root) = debtTable()
    spark.sql(s"SELECT * FROM graft_compact('$root','t','full')").collect()
    val head = cat.currentSnapshotId("t")
    val again = spark.sql(
      s"SELECT * FROM graft_compact('$root','t')").collect().head
    assert(again.getLong(0) == head,
      "incremental compaction with no appended delta must not commit")
  }

  test("graft_expire returns exactly the expired ids; tagged snapshots survive") {
    val (cat, root) = debtTable()
    cat.tagSnapshot("t", "keep", 2L)
    val allBefore = cat.snapshotIds("t")
    val expired = spark.sql(
      s"SELECT * FROM graft_expire('$root','t', 1)")
      .collect().map(_.getLong(0)).toSet
    val remaining = cat.snapshotIds("t").toSet
    assert(expired == allBefore.toSet -- remaining,
      "returned rows must be exactly the dropped snapshot ids")
    assert(remaining.contains(2L), "tagged snapshot must never expire")
    assert(remaining.contains(cat.currentSnapshotId("t")))
  }

  test("graft_rollback by tag returns the new head serving the old state") {
    val (cat, root) = debtTable()
    cat.tagSnapshot("t", "pre", 1L)
    val wasRows = cat.scanTableAt(spark, "t", 1L).count()
    val newHead = spark.sql(
      s"SELECT * FROM graft_rollback('$root','t','pre')").collect().head.getLong(0)
    assert(newHead == cat.currentSnapshotId("t"))
    assert(cat.scanTable(spark, "t").count() == wasRows,
      "HEAD must serve the rolled-back state")
  }

  test("graft_remove_orphans deletes aged unreferenced managed files only") {
    val root = Files.createTempDirectory("graft-maint-orph").toString
    val cat = new GraftCatalog(root)
    (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$root/stage")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$root/stage").map(DataFileTask(_, 1L)))
    // gen1 into the managed location, then a second rewrite makes gen1
    // orphanable once history is expired
    spark.sql(s"SELECT * FROM graft_compact('$root','t','full')").collect()
    // entry paths are canonical (`file:` scheme); compare in local form
    def local(p: String) = p.stripPrefix("file:")
    val gen1 = cat.loadTable("t").map(e => local(e.path))
    assert(gen1.forall(_.startsWith(s"$root/_data/")), gen1.mkString(","))
    cat.deleteWhere(spark, "t",
      org.apache.spark.sql.functions.col("k") <= 5, s"$root/d")
    spark.sql(s"SELECT * FROM graft_compact('$root','t','full')").collect()
    // fresh generation dirs: the second compaction must NOT clobber gen1
    // while retained snapshots still reference it (time travel intact)
    assert(cat.scanTableAt(spark, "t", 2L).count() == 20)
    spark.sql(s"SELECT * FROM graft_expire('$root','t', 1)").collect()
    // inside the default grace nothing qualifies (in-flight protection)
    assert(spark.sql(
      s"SELECT * FROM graft_remove_orphans('$root','t')").collect().isEmpty)
    // age the orphans out of a 60 s grace, then remove through SQL
    gen1.foreach(p =>
      new java.io.File(p).setLastModified(System.currentTimeMillis() - 120000))
    val removed = spark.sql(
      s"SELECT * FROM graft_remove_orphans('$root','t', 60)")
      .collect().map(r => local(r.getString(0))).toSet
    assert(removed == gen1.toSet,
      s"expected exactly gen1 removed; got $removed vs $gen1")
    gen1.foreach(p => assert(!new java.io.File(p).exists(), s"$p survived"))
    // the live table is untouched and still reads
    assert(cat.scanTable(spark, "t").count() == 15)
    assert(cat.loadTable("t")
      .forall(e => new java.io.File(local(e.path)).exists()))
  }

  test("analysis-time errors are named: bad mode, missing table, wrapped keep") {
    val (_, root) = debtTable()
    val badMode = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_compact('$root','t','both')"))
    assert(badMode.getMessage.contains("mode must be"))
    val noTable = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_expire('$root','missing', 1)"))
    assert(noTable.getMessage.contains("does not exist"))
    // a large NEGATIVE long would .toInt-wrap to a small positive keep
    // (-4294967295L → 1) and silently expire history; it must fail with
    // the same named error the oversized positive gets
    val wrapped = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_expire('$root','t', -4294967295)"))
    assert(wrapped.getMessage.contains("out of int range"), wrapped.getMessage)
    val oversize = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_expire('$root','t', 4294967297)"))
    assert(oversize.getMessage.contains("out of int range"), oversize.getMessage)
  }

  test("repeated actions on one maintenance TVF DataFrame run the operation once") {
    val (cat, root) = debtTable()
    cat.tagSnapshot("t", "pre", 1L)
    val headBefore = cat.currentSnapshotId("t")
    val df = spark.sql(s"SELECT * FROM graft_rollback('$root','t','pre')")
    val first = df.collect().head.getLong(0)
    assert(first == headBefore + 1, "first action commits the rollback")
    // a second action on the SAME DataFrame re-executes the same plan
    // instance; without memoization it would commit a SECOND rollback head
    assert(df.count() == 1L)
    val again = df.collect().head.getLong(0)
    assert(again == first, "replayed action must return the first run's row")
    assert(cat.currentSnapshotId("t") == first,
      s"three actions must leave exactly one rollback commit, head is " +
        s"${cat.currentSnapshotId("t")}")
  }
}
