package graft.sources

import graft.{SparkSpec, Tables}
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

class GraftCatalogSpec extends SparkSpec {

  private def newCatalog() =
    new GraftCatalog(Files.createTempDirectory("graft-cat").toString)

  test("create/load/commit/expire snapshot chain") {
    val cat = newCatalog()
    cat.createTable("t", Seq(DataFileTask("/a.parquet", 1), DataFileTask("/b.parquet", 2)))
    assert(cat.currentSnapshotId("t") == 1)
    assert(cat.loadTable("t").map(_.path) == Seq("/a.parquet", "/b.parquet"))

    val id2 = cat.commitRewrite("t",
      added = Seq(DataFileTask("/c.parquet", 3)),
      removedPaths = Seq("/a.parquet"))
    assert(id2 == 2)
    assert(cat.loadTable("t").map(_.path) == Seq("/b.parquet", "/c.parquet"))
    assert(cat.snapshotIds("t") == Seq(1L, 2L))

    val id3 = cat.commitRewrite("t", Seq(DataFileTask("/d.parquet", 4)), Nil)
    assert(id3 == 3)
    val expired = cat.expireSnapshots("t", keepLast = 1)
    assert(expired == Seq(1L, 2L))
    assert(cat.snapshotIds("t") == Seq(3L))
    // HEAD still loads
    assert(cat.loadTable("t").map(_.path).toSet ==
      Set("/b.parquet", "/c.parquet", "/d.parquet"))
  }

  test("concurrent commits serialize without lost updates (8 threads)") {
    val cat = newCatalog()
    cat.createTable("t", Seq(DataFileTask("/base.parquet", 1)))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { i =>
      new Thread(() =>
        try cat.commitRewrite("t", Seq(DataFileTask(s"/f$i.parquet", i + 1L)), Nil)
        catch { case t: Throwable => failures.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"commit failed: ${failures.peek()}")
    // every commit landed: HEAD advanced 8 times, all files retained
    assert(cat.currentSnapshotId("t") == 9)
    assert(cat.loadTable("t").map(_.path).toSet ==
      (Set("/base.parquet") ++ (1 to 8).map(i => s"/f$i.parquet")))
  }

  test("time travel loads past snapshots until expiry; orphan detection is exact") {
    val cat = newCatalog()
    cat.createTable("t", Seq(DataFileTask("/a.parquet", 1), DataFileTask("/b.parquet", 2)))
    cat.commitRewrite("t", Seq(DataFileTask("/c.parquet", 3)), Seq("/a.parquet"))
    // snapshot 1 is still readable as of its commit point
    assert(cat.loadTableAt("t", 1).map(_.path) == Seq("/a.parquet", "/b.parquet"))
    assert(cat.loadTableAt("t", 2).map(_.path) == Seq("/b.parquet", "/c.parquet"))
    // /a.parquet is NOT an orphan while snapshot 1 retains it
    val listing = Seq("/a.parquet", "/b.parquet", "/c.parquet", "/stale.parquet")
    assert(cat.orphanFiles("t", listing) == Seq("/stale.parquet"))
    // after expiry, snapshot 1 is gone: time travel refuses, /a.parquet orphans
    cat.expireSnapshots("t", keepLast = 1)
    val ex = intercept[IllegalArgumentException](cat.loadTableAt("t", 1))
    assert(ex.getMessage.contains("expired or never committed"))
    assert(cat.orphanFiles("t", listing) == Seq("/a.parquet", "/stale.parquet"))
  }

  test("upsert commits data + eq-deletes; scanTable reads MoR; compaction retires deletes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-ups-base").toString
    val out = Files.createTempDirectory("graft-ups-out").toString
    (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$base/t")
    val files = new java.io.File(s"$base/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq
    cat.createTable("t", files.map(DataFileTask(_, 1L)))

    // upsert: 10 existing keys get new values, 5 new keys appear
    val updates = ((91L to 100L) ++ (201L to 205L)).map(k => (k, s"new$k")).toDF("k", "v")
    assert(cat.upsert(spark, "t", updates, Seq("k"), out) == 2)
    val entries = cat.loadEntries("t")
    assert(entries.count(_.kind == "eqdel") >= 1 && entries.count(_.kind == "data") >= 2)

    // MoR read: 105 rows, updated keys show the NEW value exactly once
    val scanned = cat.scanTable(spark, "t").cache()
    assert(scanned.count() == 105)
    assert(scanned.filter(col("k") === 95L).select("v").collect().map(_.getString(0))
      .toSeq == Seq("new95"))
    assert(scanned.filter(col("k") === 5L).select("v").head.getString(0) == "v5")
    scanned.unpersist()

    // time travel: the pre-upsert snapshot still reads the old value
    val old = CompactionRunner.scanWithHiddenCols(spark, cat.loadTableAt("t", 1))
    assert(old.count() == 100)
    assert(old.filter(col("k") === 95L).select("v").head.getString(0) == "v95")

    // compaction applies the pending deletes and RETIRES them in the commit
    cat.compactTable(spark, "t", s"$out/compact")
    val after = cat.loadEntries("t")
    assert(after.nonEmpty && after.forall(_.kind == "data"),
      s"delete entries survived compaction: $after")
    val compacted = cat.scanTable(spark, "t").cache()
    assert(compacted.count() == 105)
    assert(compacted.filter(col("k") === 95L).select("v").head.getString(0) == "new95")
    compacted.unpersist()
  }

  test("concurrent upserts of the same key leave exactly one live row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-cups").toString
    val out = Files.createTempDirectory("graft-cups-out").toString
    (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$base/t")
    cat.createTable("t", new java.io.File(s"$base/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(p => DataFileTask(p.getPath, 1L)).toSeq)
    // two racing upserts of key 7: lock-ordered sequence numbers mean the
    // later commit's eq-delete suppresses the earlier one's row — never two
    // live rows for one key (the pre-fix behavior when both shared a seq)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("x", "y").map { tag =>
      new Thread(() =>
        try cat.upsert(spark, "t", Seq((7L, tag)).toDF("k", "v"), Seq("k"), out)
        catch { case t: Throwable => failures.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"upsert failed: ${failures.peek()}")
    val live = cat.scanTable(spark, "t").filter(col("k") === 7L)
      .select("v").collect().map(_.getString(0)).toSeq
    assert(live.size == 1, s"expected exactly one live row for key 7, got $live")
    assert(Set("x", "y").contains(live.head))
    assert(cat.scanTable(spark, "t").count() == 20)
  }

  test("incremental read returns exactly the rows appended between snapshots") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-inc").toString
    val out = Files.createTempDirectory("graft-inc-out").toString
    (1L to 50L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$base/t")
    val files = new java.io.File(s"$base/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq
    cat.createTable("t", files.map(DataFileTask(_, 1L)))
    // two upserts → snapshots 2 and 3
    cat.upsert(spark, "t", Seq((101L, "a")).toDF("k", "v"), Seq("k"), out)
    cat.upsert(spark, "t", Seq((102L, "b"), (103L, "c")).toDF("k", "v"), Seq("k"), out)
    // 1→2: only the first upsert's rows; 2→3: only the second's
    val d12 = cat.scanAppendedBetween(spark, "t", 1, 2)
    assert(d12.select("k").collect().map(_.getLong(0)).toSet == Set(101L))
    val d23 = cat.scanAppendedBetween(spark, "t", 2, 3)
    assert(d23.select("k").collect().map(_.getLong(0)).toSet == Set(102L, 103L))
    assert(d23.columns.toSeq == Seq("k", "v")) // hidden cols projected away
    // empty diff fails loudly rather than returning an empty scan
    intercept[IllegalArgumentException](cat.scanAppendedBetween(spark, "t", 3, 3))
  }

  test("catalog-driven compaction commits a new snapshot with the output files") {
    val cat = newCatalog()
    val table = Files.createTempDirectory("graft-cat-data").toString
    val out = Files.createTempDirectory("graft-cat-out").toString
    Tables.lineitem(spark, sfDir).repartition(2).write.mode("overwrite").parquet(table)
    val files = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    cat.createTable("li", files.zipWithIndex.map { case (p, i) => DataFileTask(p, i + 1L) }.toSeq)

    val (snapId, manifest) = cat.compactTable(spark, "li", out)
    assert(snapId == 2)
    assert(manifest.outputRecordCount == 6000)
    // the new table state is exactly the written files, readable
    val newTasks = cat.loadTable("li")
    assert(newTasks.map(_.path).toSet == manifest.addedFiles.map(_.path).toSet)
    assert(CompactionRunner.scanWithHiddenCols(spark, newTasks).count() == 6000)
  }
}
