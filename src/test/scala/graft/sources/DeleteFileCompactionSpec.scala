package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

import org.apache.spark.sql.functions.col

/** Position-delete file compaction (`GraftCatalog.compactDeleteFiles`) —
  * Iceberg's `rewrite_position_delete_files`: per-commit small delete
  * files merge into few, dangling rows (targets gone from the snapshot)
  * drop, data files and scan results stay byte-identical.
  */
class DeleteFileCompactionSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(Files.createTempDirectory("graft-dfc-cat").toString)

  private def writeParquet(rows: Seq[(Long, String)], dir: String): Seq[String] = {
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    CompactionRunner.listParquet(dir)
  }

  private def keys(cat: GraftCatalog, t: String): Seq[Long] =
    cat.scanTable(spark, t).select("k").as[Long].collect().toSeq.sorted

  test("three delete commits collapse to one file; answers and data entries unchanged") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-dfc-base").toString
    val f0 = writeParquet((1L to 50L).map(k => (k, s"v$k")), s"$base/b0")
    val f1 = writeParquet((51L to 100L).map(k => (k, s"v$k")), s"$base/b1")
    cat.createTable("t", (f0 ++ f1).map(DataFileTask(_, 1L)))

    cat.deleteWhere(spark, "t", col("k") <= 10L, s"$base/d1")
    cat.deleteWhere(spark, "t", col("k") >= 95L, s"$base/d2")
    cat.deleteWhere(spark, "t", col("k") === 60L, s"$base/d3")

    val before = cat.loadEntries("t")
    // ≥ one delete file per commit (a commit touching both data files may
    // write more — exactly the small-file accumulation under test)
    assert(before.count(_.kind == "posdel") >= 3)
    val expect = keys(cat, "t")
    val dataBefore = before.filter(_.kind == "data").map(_.path).toSet
    val oldDeleteFiles = before.filter(_.kind == "posdel").map(_.path)
    val headBefore = cat.currentSnapshotId("t")

    val next = cat.compactDeleteFiles(spark, "t", s"$base/out")
    assert(next == headBefore + 1)

    val after = cat.loadEntries("t")
    assert(after.count(_.kind == "posdel") == 1,
      s"want 1 compacted delete file, got ${after.filter(_.kind == "posdel")}")
    assert(after.filter(_.kind == "data").map(_.path).toSet == dataBefore,
      "data entries must be untouched")
    assert(keys(cat, "t") == expect, "compaction changed scan answers")
    // retired files stay on disk for orphan collection
    oldDeleteFiles.foreach(p =>
      assert(new java.io.File(p.stripPrefix("file:")).exists(), s"$p deleted"))
  }

  test("dangling delete rows (target data file left the snapshot) are dropped") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-dfc-base").toString
    val f0 = writeParquet((1L to 50L).map(k => (k, s"v$k")), s"$base/b0")
    val f1 = writeParquet((51L to 100L).map(k => (k, s"v$k")), s"$base/b1")
    cat.createTable("t", (f0 ++ f1).map(DataFileTask(_, 1L)))

    // one delete commit touching BOTH files, then a second for file count
    cat.deleteWhere(spark, "t", col("k") === 5L || col("k") === 55L, s"$base/d1")
    cat.deleteWhere(spark, "t", col("k") === 6L || col("k") === 56L, s"$base/d2")
    // an "external engine" replaces f1 without rewriting deletes: the four
    // delete rows targeting f1 now dangle (and 55/56 resurrect — the
    // simulated engine's choice, not ours)
    val f1b = writeParquet((51L to 100L).map(k => (k, s"w$k")), s"$base/b1b")
    cat.commitRewrite("t", f1b.map(DataFileTask(_, 2L)), f1)

    val expect = keys(cat, "t")
    cat.compactDeleteFiles(spark, "t", s"$base/out")
    assert(keys(cat, "t") == expect)

    val compacted = cat.loadEntries("t").filter(_.kind == "posdel")
    assert(compacted.size == 1)
    val rows = spark.read.parquet(compacted.head.path)
    assert(rows.count() == 2,
      "only the two f0-targeting rows survive; f1's dangle and drop")
    assert(rows.select("file_path").distinct().count() == 1)
  }

  test("no-op below the target file count") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-dfc-base").toString
    val f0 = writeParquet((1L to 50L).map(k => (k, s"v$k")), s"$base/b0")
    cat.createTable("t", f0.map(DataFileTask(_, 1L)))
    val h0 = cat.currentSnapshotId("t")
    assert(cat.compactDeleteFiles(spark, "t", s"$base/out") == h0,
      "zero delete files: no commit")
    cat.deleteWhere(spark, "t", col("k") === 1L, s"$base/d1")
    val h1 = cat.currentSnapshotId("t")
    assert(cat.compactDeleteFiles(spark, "t", s"$base/out") == h1,
      "one delete file at targetFiles=1: nothing would shrink")
  }

  test("rewriteEqDeletes: eq entries become pos-deletes, scan identical, seq guard exact") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-eqrw-base").toString
    val f0 = writeParquet((1L to 50L).map(k => (k, s"v$k")), s"$base/b0")
    cat.createTable("t", f0.map(DataFileTask(_, 1L)))
    // eq-delete keys 5, 6, 7 at seq 2
    cat.deleteWhereEq(spark, "t", Seq(5L, 6L, 7L).toDF("k"), s"$base/d1")
    // APPEND key 5 back at seq 3 — newer than the delete, must survive
    // the conversion exactly as it survives the MoR read (seq guard)
    cat.appendFiles(spark, "t", Seq((5L, "reborn")).toDF("k", "v"), s"$base/a1")
    // a second eq-delete at seq 4 for keys 40, 41
    cat.deleteWhereEq(spark, "t", Seq(40L, 41L).toDF("k"), s"$base/d2")
    val expect = keys(cat, "t")
    assert(expect.contains(5L) && !expect.contains(6L) && !expect.contains(40L),
      s"fixture sanity: $expect")
    val before = cat.loadEntries("t")
    assert(before.count(_.kind == "eqdel") == 2)
    val dataBefore = before.filter(_.kind == "data").map(_.path).toSet
    val headBefore = cat.currentSnapshotId("t")

    val next = cat.rewriteEqDeletes(spark, "t", s"$base/out")
    assert(next == headBefore + 1)
    val after = cat.loadEntries("t")
    assert(after.count(_.kind == "eqdel") == 0, "eq-delete entries must retire")
    assert(after.count(_.kind == "posdel") >= 1, "converted pos-deletes must land")
    assert(after.filter(_.kind == "data").map(_.path).toSet == dataBefore,
      "data files untouched")
    assert(keys(cat, "t") == expect, "conversion changed scan answers")
    // the re-appended key 5 still reads: its row was NOT pos-deleted
    assert(cat.scanTable(spark, "t").filter(col("k") === 5L).count() == 1)
    // time travel to the pre-conversion snapshot still applies eq semantics
    assert(cat.scanTableAt(spark, "t", headBefore)
      .select("k").as[Long].collect().toSeq.sorted == expect)
    // converted pos-deletes then merge through the ordinary pos-delete
    // compaction path (the two maintenance steps compose)
    cat.deleteWhere(spark, "t", col("k") === 20L, s"$base/d3")
    val expect2 = keys(cat, "t")
    cat.compactDeleteFiles(spark, "t", s"$base/out2")
    assert(cat.loadEntries("t").count(_.kind == "posdel") == 1)
    assert(keys(cat, "t") == expect2)
  }

  test("rewriteEqDeletes(asDeletionVectors): eq debt lands directly as Puffin DVs") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-eqrw-dv").toString
    val f0 = writeParquet((1L to 200L).map(k => (k, s"v$k")), s"$base/b0")
    cat.createTable("t", f0.map(DataFileTask(_, 1L)))
    cat.deleteWhereEq(spark, "t", Seq(5L, 6L, 7L).toDF("k"), s"$base/d1")
    cat.appendFiles(spark, "t", Seq((5L, "reborn")).toDF("k", "v"), s"$base/a1")
    cat.deleteWhereEq(spark, "t", (100L to 140L).toDF("k"), s"$base/d2")
    val expect = keys(cat, "t")
    val dataBefore = cat.loadEntries("t").filter(_.kind == "data").map(_.path).toSet

    // ONE commit: eq entries out, Puffin deletion vectors in — no
    // intermediate parquet pos-delete generation to migrate later
    cat.rewriteEqDeletes(spark, "t", s"$base/out", asDeletionVectors = true)
    val after = cat.loadEntries("t")
    assert(after.count(_.kind == "eqdel") == 0, "eq-delete entries must retire")
    val pos = after.filter(_.kind == "posdel")
    assert(pos.nonEmpty && pos.forall(_.format == "dv"),
      s"eq->DV must leave ONLY dv-format posdel entries: $pos")
    assert(pos.forall(e => e.recordCount > 0 && e.sizeBytes > 0),
      s"DV entries must carry counted manifests: $pos")
    // the sidecars are real Puffin files whose blob totals match the
    // entry-recorded counts
    val conf = new org.apache.hadoop.conf.Configuration()
    pos.foreach { e =>
      assert(Puffin.isPuffin(e.path, conf), s"${e.path} is not Puffin")
      assert(Puffin.readDv(e.path, conf).values.map(_.length.toLong).sum ==
        e.recordCount)
    }
    assert(after.filter(_.kind == "data").map(_.path).toSet == dataBefore,
      "data files untouched")
    assert(keys(cat, "t") == expect, "eq->DV conversion changed scan answers")
    // the seq guard carried: the re-appended key 5 still reads
    assert(cat.scanTable(spark, "t").filter(col("k") === 5L).count() == 1)
  }

  test("rewriteEqDeletes no-ops without eq debt; retires all-miss deletes without pos files") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-eqrw-miss").toString
    val f0 = writeParquet((1L to 10L).map(k => (k, s"v$k")), s"$base/b0")
    cat.createTable("t", f0.map(DataFileTask(_, 1L)))
    val h0 = cat.currentSnapshotId("t")
    assert(cat.rewriteEqDeletes(spark, "t", s"$base/out") == h0,
      "no eq-deletes: head unchanged, no commit")
    // an eq-delete that hits NOTHING retires without writing pos entries
    cat.deleteWhereEq(spark, "t", Seq(999L).toDF("k"), s"$base/d1")
    val expect = keys(cat, "t")
    cat.rewriteEqDeletes(spark, "t", s"$base/out")
    val after = cat.loadEntries("t")
    assert(after.count(_.kind == "eqdel") == 0)
    assert(after.count(_.kind == "posdel") == 0,
      s"all-miss delete must not leave an empty pos file entry: $after")
    assert(keys(cat, "t") == expect)
  }
}
