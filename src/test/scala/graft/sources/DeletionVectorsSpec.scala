package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Deletion vectors: position deletes as per-data-file compressed bitmaps
  * behind the existing posdel surface — readers magic-sniff, both formats
  * coexist, `compactDeleteFiles(asDeletionVectors = true)` migrates.
  */
class DeletionVectorsSpec extends SparkSpec {

  private def conf = spark.sessionState.newHadoopConf()

  test("codec round-trips sorted, dense, sparse, and empty position sets") {
    val dir = Files.createTempDirectory("graft-dv-codec").toString
    val byFile = Map(
      "file:///a.parquet" -> Array(0L, 1L, 2L, 3L), // dense run
      "file:///b.parquet" -> Array(7L, 1000000L, 123456789012L), // sparse
      "file:///c.parquet" -> Array(5L, 5L, 3L)) // unsorted + dup input
    val p = s"$dir/x.gdv"
    val total = DeletionVectors.write(p, byFile, conf)
    assert(total == 4 + 3 + 2) // c dedups to {3, 5}
    assert(DeletionVectors.isDv(p, conf))
    val back = DeletionVectors.read(p, conf)
    assert(back("file:///a.parquet").toSeq == Seq(0L, 1L, 2L, 3L))
    assert(back("file:///b.parquet").toSeq == Seq(7L, 1000000L, 123456789012L))
    assert(back("file:///c.parquet").toSeq == Seq(3L, 5L))
    // a parquet file is not a DV
    spark.range(1).write.parquet(s"$dir/pq")
    val pq = CompactionRunner.listParquet(s"$dir/pq").head
    assert(!DeletionVectors.isDv(pq, conf))
  }

  test("migration: parquet pos-deletes rewrite to ONE DV; reads identical") {
    val root = Files.createTempDirectory("graft-dv-mig").toString
    val g = s"gv_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 2000)")
    // several delete commits -> several parquet posdel files
    spark.sql(s"DELETE FROM $g.t WHERE k >= 1900")
    spark.sql(s"DELETE FROM $g.t WHERE k < 50")
    spark.sql(s"DELETE FROM $g.t WHERE k >= 1000 AND k < 1010")
    val cat = new GraftCatalog(root)
    val pqPos = cat.loadEntries("t").filter(_.kind == "posdel")
    assert(pqPos.size >= 3)
    val expect = (0L until 2000L)
      .filterNot(k => k >= 1900 || k < 50 || (k >= 1000 && k < 1010))
    val beforeSnap = cat.currentSnapshotId("t")

    cat.compactDeleteFiles(spark, "t", s"$root/staged", asDeletionVectors = true)
    val dvPos = cat.loadEntries("t").filter(_.kind == "posdel")
    assert(dvPos.size == 1 && dvPos.head.format == "dv" &&
      dvPos.head.recordCount == 2000 - expect.length,
      s"one counted DV entry expected, got $dvPos")
    assert(DeletionVectors.isDv(dvPos.head.path, conf))

    // library scan, doorway read, and the masked-columnar path all agree
    assert(cat.scanTable(spark, "t").count() == expect.length.toLong)
    val door = spark.sql(s"SELECT k, v FROM $g.t")
    assert(door.collect().map(_.getLong(0)).sorted.toSeq == expect)
    assert(spark.sql(s"SELECT sum(k) FROM $g.t").head().getLong(0) == expect.sum)
    // time travel BEFORE the migration still reads the parquet posdels
    assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF $beforeSnap")
      .head().getLong(0) == expect.length.toLong)
  }

  test("distributed DV write: target_files sidecars, one task each, reads exact") {
    // the driver never materializes positions: each task streams its
    // file_path-partitioned slice into its own Puffin sidecar (one
    // deletion-vector-v1 blob per data file), the driver only commits the
    // returned (path, count) rows — the shape that lifts r13's 16M
    // driver-collect cap
    val root = Files.createTempDirectory("graft-dv-dist").toString
    val g = s"gv_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v STRING)")
    // several files so the file_path repartition actually spreads
    spark.sql(s"INSERT INTO $g.t SELECT /*+ REPARTITION(8) */ id, " +
      "concat('v', id) FROM range(0, 8000)")
    // a translatable range takes the metadata pos-delete path; the
    // REPARTITION spread means every data file holds matching rows
    spark.sql(s"DELETE FROM $g.t WHERE k >= 1000 AND k < 2600")
    val cat = new GraftCatalog(root)
    assert(cat.loadEntries("t").exists(_.kind == "posdel"))
    // doorway spelling with the sidecar-count knob
    spark.sql(s"CALL $g.system.rewrite_position_delete_files('t', " +
      "as_deletion_vectors => true, target_files => 4)").collect()
    val dv = cat.loadEntries("t").filter(_.kind == "posdel")
    assert(dv.size > 1 && dv.size <= 4,
      s"target_files=4 must land multiple DV sidecars, got ${dv.size}")
    assert(dv.forall(e => e.format == "dv" && e.recordCount > 0 &&
      e.sizeBytes > 0 && Puffin.isPuffin(e.path, conf)))
    assert(dv.map(_.recordCount).sum == 1600L)
    val expect = (0L until 8000L).filterNot(k => k >= 1000 && k < 2600)
    assert(spark.sql(s"SELECT k FROM $g.t").collect()
      .map(_.getLong(0)).sorted.toSeq == expect)
    assert(spark.sql(s"SELECT sum(k) FROM $g.t").head().getLong(0) == expect.sum)
  }

  test("full compaction consumes and retires a DV like any delete file") {
    val root = Files.createTempDirectory("graft-dv-compact").toString
    val g = s"gv_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 1000)")
    spark.sql(s"DELETE FROM $g.t WHERE k >= 700 AND k < 800") // pos-delete path
    val cat = new GraftCatalog(root)
    assert(cat.loadEntries("t").exists(_.kind == "posdel"), "fixture needs posdels")
    cat.compactDeleteFiles(spark, "t", s"$root/staged", asDeletionVectors = true)
    assert(cat.loadEntries("t").exists(e => e.kind == "posdel" && e.format == "dv"))
    cat.compactTable(spark, "t", s"$root/staged2")
    val after = cat.loadEntries("t")
    assert(!after.exists(_.kind == "posdel"),
      "compaction must retire the applied DV")
    val expect = (0L until 1000L).filterNot(k => k >= 700 && k < 800)
    assert(cat.scanTable(spark, "t").count() == expect.length.toLong)
    assert(spark.sql(s"SELECT sum(k) FROM $g.t").head().getLong(0) == expect.sum)
  }
}
