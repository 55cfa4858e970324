package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

/** `GraftCatalog.dropTable` — unregister a table's metadata without
  * touching data files (Iceberg's drop-without-purge), with the fork
  * guard and head-store deregistration.
  */
class DropTableSpec extends SparkSpec {

  import spark.implicits._

  private def stage(cat: GraftCatalog): Seq[String] = {
    val base = Files.createTempDirectory("graft-drop-base").toString
    (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$base/b0")
    val files = CompactionRunner.listParquet(s"$base/b0")
    cat.createTable("t", files.map(DataFileTask(_, 1L)))
    files
  }

  test("drop removes metadata and listing; data files stay on disk") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-drop-cat").toString)
    val files = stage(cat)
    assert(cat.tables() == Seq("t"))
    cat.dropTable("t")
    assert(cat.tables().isEmpty)
    files.foreach(p => assert(new java.io.File(p).exists(), s"$p purged"))
    // the name is reusable (create-after-drop is a fresh table)
    cat.createTable("t", files.map(DataFileTask(_, 1L)))
    assert(cat.scanTable(spark, "t").count() == 20L)
  }

  test("live forks block the drop; dropping the fork unblocks it") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-drop-cat").toString)
    stage(cat)
    cat.forkTable("t", "audit")
    val e = intercept[IllegalArgumentException](cat.dropTable("t"))
    assert(e.getMessage.contains("t@audit"), e.getMessage)
    cat.dropFork("t@audit")
    cat.dropTable("t")
    assert(cat.tables().isEmpty)
  }

  test("fork names and missing tables are rejected") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-drop-cat").toString)
    stage(cat)
    cat.forkTable("t", "b")
    intercept[IllegalArgumentException](cat.dropTable("t@b"))
    intercept[IllegalArgumentException](cat.dropTable("nope"))
  }

  test("rename carries snapshots, schema, tags, and time travel to the new name") {
    import org.apache.spark.sql.functions.col
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-ren-cat").toString)
    val files = stage(cat)
    val base = Files.createTempDirectory("graft-ren-out").toString
    cat.deleteWhere(spark, "t", col("k") <= 5L, s"$base/d1")
    val taggedAt = cat.currentSnapshotId("t")
    cat.tagSnapshot("t", "v1", taggedAt)
    cat.deleteWhere(spark, "t", col("k") === 20L, s"$base/d2")
    val head = cat.currentSnapshotId("t")

    cat.renameTable("t", "t2")
    assert(cat.tables() == Seq("t2"))
    assert(cat.currentSnapshotId("t2") == head)
    assert(cat.scanTable(spark, "t2").count() == 14L)
    // history + tags survive: time travel at the tag sees the mid state
    assert(cat.scanTableAt(spark, "t2", taggedAt).count() == 15L)
    files.foreach(p => assert(new java.io.File(p).exists(), s"$p purged"))
    // the old name is gone and reusable
    intercept[IllegalArgumentException](cat.renameTable("t", "t3"))
    cat.createTable("t", files.map(DataFileTask(_, 1L)))
    assert(cat.scanTable(spark, "t").count() == 20L)
  }

  test("rename guards: existing destination, forks, bad names") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-ren-cat").toString)
    stage(cat)
    val files2 = {
      val b = Files.createTempDirectory("graft-ren-b").toString
      (1L to 5L).map(k => (k, "x")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$b/p")
      CompactionRunner.listParquet(s"$b/p")
    }
    cat.createTable("u", files2.map(DataFileTask(_, 1L)))
    intercept[IllegalArgumentException](cat.renameTable("t", "u"))
    intercept[IllegalArgumentException](cat.renameTable("t", "bad/name"))
    cat.forkTable("t", "audit")
    intercept[IllegalArgumentException](cat.renameTable("t", "w"))
    intercept[IllegalArgumentException](cat.renameTable("t@audit", "w"))
  }

  test("store-backed rename moves the pointer row") {
    val url = s"jdbc:derby:memory:rendb${System.nanoTime()};create=true"
    val store = new JdbcHeadStore(url, "rencat")
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-ren-cat").toString, Some(store))
    stage(cat)
    val head = cat.currentSnapshotId("t")
    cat.renameTable("t", "t2")
    assert(!store.exists("t") && store.exists("t2"))
    assert(store.read("t2") == head)
    assert(cat.scanTable(spark, "t2").count() == 20L)
  }

  test("store-backed drop deregisters the pointer; commits stop immediately") {
    val url = s"jdbc:derby:memory:dropdb${System.nanoTime()};create=true"
    val store = new JdbcHeadStore(url, "dropcat")
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-drop-cat").toString, Some(store))
    stage(cat)
    assert(store.exists("t"))
    cat.dropTable("t")
    assert(!store.exists("t"))
    assert(cat.tables().isEmpty)
    // replayable: a second remove (crash-recovery path) is a no-op
    store.remove("t")
  }
}
