package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

import org.apache.spark.sql.functions.col

/** Incremental compaction (the reference's own roadmap item, README.md:30):
  * compact only the files appended since the last compacted snapshot via the
  * catalog's append-diff scan, leaving prior outputs physically untouched.
  */
class IncrementalCompactionSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(Files.createTempDirectory("graft-inc-cat").toString)

  private def writeParquet(rows: Seq[(Long, String)], dir: String): Seq[String] = {
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    CompactionRunner.listParquet(dir)
  }

  test("incremental compaction rewrites only the delta; old outputs untouched") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-inc-base").toString
    val out = Files.createTempDirectory("graft-inc-out").toString
    cat.createTable("t",
      writeParquet((1L to 100L).map(k => (k, s"v$k")), s"$base/b0")
        .map(DataFileTask(_, 1L)))

    // full compaction establishes the watermark
    val (snap2, _) = cat.compactTable(spark, "t", s"$out/full")
    assert(cat.lastCompactedSnapshotId("t").contains(snap2))
    val o1 = cat.loadTable("t").map(_.path)
    val o1Mtimes = o1.map(p =>
      p -> new java.io.File(p.stripPrefix("file://")).lastModified()).toMap

    // append a delta since the watermark
    val delta = writeParquet((101L to 120L).map(k => (k, s"v$k")), s"$base/b1")
    cat.commitRewrite("t", delta.map(DataFileTask(_, 3L)), Nil)
    val expected = cat.scanTable(spark, "t")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).sorted

    val (snap4, manifest) = cat.compactTableIncremental(spark, "t", s"$out/inc")
    assert(snap4 > snap2)
    assert(cat.lastCompactedSnapshotId("t").contains(snap4))
    // ONLY the delta was rewritten
    assert(manifest.removedDataFiles.toSet ==
      delta.map(CompactionRunner.canonPath).toSet)
    // prior outputs are untouched — still in the snapshot, bytes unmodified
    val nowTasks = cat.loadTable("t").map(_.path)
    o1.foreach { p =>
      assert(nowTasks.contains(p), s"old output $p dropped by incremental compact")
      assert(new java.io.File(p.stripPrefix("file://")).lastModified() ==
        o1Mtimes(p), s"old output $p was rewritten")
    }
    // MoR results identical pre/post
    val got = cat.scanTable(spark, "t")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == expected.toSeq)

    // nothing appended since → no-op, no new snapshot
    val (same, empty) = cat.compactTableIncremental(spark, "t", s"$out/inc2")
    assert(same == snap4 && empty.addedFiles.isEmpty && empty.removedDataFiles.isEmpty)
  }

  test("pending eq-deletes apply to the delta but stay pending while older files may match") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-inc-eq").toString
    val out = Files.createTempDirectory("graft-inc-eq-out").toString
    cat.createTable("t",
      writeParquet((1L to 50L).map(k => (k, s"v$k")), s"$base/b0")
        .map(DataFileTask(_, 1L)))
    cat.compactTable(spark, "t", s"$out/full")

    // delta: appended file + an upsert over one of ITS keys
    val delta = writeParquet((51L to 60L).map(k => (k, s"v$k")), s"$base/b1")
    cat.commitRewrite("t", delta.map(DataFileTask(_, 3L)), Nil)
    cat.upsert(spark, "t", Seq((55L, "upd")).toDF("k", "v"), Seq("k"), out)

    val (_, manifest) = cat.compactTableIncremental(spark, "t", s"$out/inc")
    // the eq-delete was APPLIED to the rewritten delta...
    assert(manifest.removedDataFiles.nonEmpty)
    val scanned = cat.scanTable(spark, "t").cache()
    assert(scanned.count() == 60)
    assert(scanned.filter(col("k") === 55L).select("v")
      .collect().map(_.getString(0)).toSeq == Seq("upd"))
    scanned.unpersist()
    // ...but NOT retired: the older full-compact outputs sit below its seq,
    // so the metadata-only deadness check must conservatively keep it
    assert(manifest.removedDeleteFiles.isEmpty)
    assert(cat.loadEntries("t").exists(_.kind == "eqdel"))
  }

  test("eq-deletes no kept data file undercuts are retired in the incremental commit") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-inc-dead").toString
    val out = Files.createTempDirectory("graft-inc-dead-out").toString
    cat.createTable("t",
      writeParquet((1L to 20L).map(k => (k, s"v$k")), s"$base/b0")
        .map(DataFileTask(_, 1L)))
    val (_, fullManifest) = cat.compactTable(spark, "t", s"$out/full")
    // replace the compacted outputs entirely with a newer generation, so
    // the whole data set postdates the watermark
    val gen2 = writeParquet((1L to 20L).map(k => (k, s"w$k")), s"$base/b1")
    cat.commitRewrite("t", gen2.map(DataFileTask(_, 3L)),
      fullManifest.addedFiles.map(_.path))
    cat.upsert(spark, "t", Seq((7L, "upd")).toDF("k", "v"), Seq("k"), out)

    val (_, manifest) = cat.compactTableIncremental(spark, "t", s"$out/inc")
    // every data file below the eq-delete's seq was rewritten → it is dead
    assert(manifest.removedDeleteFiles.nonEmpty)
    val after = cat.loadEntries("t")
    assert(after.forall(_.kind == "data"),
      s"dead delete entries survived the incremental commit: $after")
    val scanned = cat.scanTable(spark, "t")
    assert(scanned.count() == 20)
    assert(scanned.filter(col("k") === 7L).select("v").head.getString(0) == "upd")
  }

  test("no watermark (or expired watermark) falls back to full compaction") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-inc-fb").toString
    val out = Files.createTempDirectory("graft-inc-fb-out").toString
    cat.createTable("t",
      writeParquet((1L to 30L).map(k => (k, s"v$k")), s"$base/b0")
        .map(DataFileTask(_, 1L)))
    assert(cat.lastCompactedSnapshotId("t").isEmpty)
    val (snapId, manifest) = cat.compactTableIncremental(spark, "t", s"$out/inc")
    // full semantics: the original inputs were rewritten
    assert(manifest.removedDataFiles.nonEmpty)
    assert(cat.lastCompactedSnapshotId("t").contains(snapId))
    assert(cat.scanTable(spark, "t").count() == 30)
  }

  test("maybeCompactTable triggers only past the small-file threshold, debt resets") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-auto-base").toString
    val out = Files.createTempDirectory("graft-auto-out").toString
    def appendBatch(i: Int, rows: Range): Unit =
      cat.commitRewrite("t",
        writeParquet(rows.map(k => (k.toLong, s"v$k")), s"$base/b$i")
          .map(DataFileTask(_, i + 1L)), Nil)
    cat.createTable("t",
      writeParquet((1 to 50).map(k => (k.toLong, s"v$k")), s"$base/b0")
        .map(DataFileTask(_, 1L)))

    // 1 file of debt (never compacted) < threshold 3 → pure no-op
    assert(cat.maybeCompactTable(spark, "t", s"$out/a", minAppendedFiles = 3).isEmpty)
    appendBatch(1, 51 to 60)
    assert(cat.maybeCompactTable(spark, "t", s"$out/b", minAppendedFiles = 3).isEmpty)
    // third file crosses the threshold → full compaction (no watermark yet)
    appendBatch(2, 61 to 70)
    val first = cat.maybeCompactTable(spark, "t", s"$out/c", minAppendedFiles = 3)
    assert(first.nonEmpty)
    assert(cat.lastCompactedSnapshotId("t").contains(first.get._1))
    // debt reset by the watermark → no-op again
    assert(cat.maybeCompactTable(spark, "t", s"$out/d", minAppendedFiles = 3).isEmpty)
    // grow debt past the threshold again → INCREMENTAL run over the delta only
    val deltas = (3 to 5).map { i =>
      appendBatch(i, (100 + i * 10) to (109 + i * 10)); s"$base/b$i"
    }
    val second = cat.maybeCompactTable(spark, "t", s"$out/e", minAppendedFiles = 3)
    assert(second.nonEmpty)
    val deltaPaths = deltas.flatMap(d =>
      CompactionRunner.listParquet(d).map(CompactionRunner.canonPath)).toSet
    assert(second.get._2.removedDataFiles.toSet == deltaPaths,
      "second trigger must rewrite exactly the post-watermark delta")
    assert(cat.scanTable(spark, "t").count() == 50 + 10 * 2 + 10 * 3)
  }
}
