package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}

/** Row-level DELETE — the write side of MoR (`GraftCatalog.deleteWhere`).
  * The reference consumes position-delete files an embedding engine produced
  * (`compaction/mod.rs:138-148`); these tests pin the producer: MoR mode
  * writes spec-shaped position deletes, CoW mode rewrites only affected
  * files, both agree with a plain filter and with each other.
  */
class DeleteWhereSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(Files.createTempDirectory("graft-del-cat").toString)

  private def writeParquet(rows: Seq[(Long, String)], dir: String): Seq[String] = {
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    CompactionRunner.listParquet(dir)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select("k", "v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSeq.sortBy(t => (t._1, String.valueOf(t._2)))

  private def freshTable(cat: GraftCatalog): (String, Seq[String], Seq[String]) = {
    val base = Files.createTempDirectory("graft-del-base").toString
    val f0 = writeParquet((1L to 50L).map(k => (k, s"v$k")), s"$base/b0")
    val f1 = writeParquet((51L to 100L).map(k => (k, s"v$k")), s"$base/b1")
    cat.createTable("t", (f0 ++ f1).map(DataFileTask(_, 1L)))
    (base, f0, f1)
  }

  test("MoR delete: rows suppressed at read, data files untouched, compaction makes it physical") {
    val cat = newCatalog()
    val (_, f0, f1) = freshTable(cat)
    val out = Files.createTempDirectory("graft-del-out").toString
    val before = (f0 ++ f1).map(p => p -> new java.io.File(p).lastModified()).toMap

    val head0 = cat.currentSnapshotId("t")
    val snap = cat.deleteWhere(spark, "t", col("k") % 3 === 0, out)
    assert(snap > head0)

    // data files physically untouched; the commit added only posdel entries
    (f0 ++ f1).foreach(p =>
      assert(new java.io.File(p).lastModified() == before(p), s"$p rewritten by MoR delete"))
    val entries = cat.loadEntries("t")
    assert(entries.count(_.kind == "posdel") >= 1)
    assert(entries.filter(_.kind == "data").map(_.path).toSet == (f0 ++ f1).toSet)

    // read suppresses exactly the matched rows
    val got = rowsOf(cat.scanTable(spark, "t"))
    val expected = (1L to 100L).filterNot(_ % 3 == 0).map(k => (k, s"v$k"))
    assert(got == expected)

    // full compaction applies + retires the position deletes
    val (_, manifest) = cat.compactTable(spark, "t", s"$out/compact")
    assert(manifest.removedDeleteFiles.nonEmpty)
    assert(cat.loadEntries("t").forall(_.kind == "data"))
    assert(rowsOf(cat.scanTable(spark, "t")) == expected)
  }

  test("CoW delete: rewrites only affected files; unaffected files keep their bytes") {
    val cat = newCatalog()
    val (_, f0, f1) = freshTable(cat)
    val out = Files.createTempDirectory("graft-del-out").toString
    val m0 = f0.map(p => p -> new java.io.File(p).lastModified()).toMap

    // predicate touches only the second file (k 51..100)
    cat.deleteWhere(spark, "t", col("k") > 90, out, copyOnWrite = true)

    val tasks = cat.loadTable("t").map(_.path)
    f0.foreach { p =>
      assert(tasks.contains(p), s"unaffected file $p dropped by CoW delete")
      assert(new java.io.File(p).lastModified() == m0(p), s"unaffected $p rewritten")
    }
    f1.foreach(p => assert(!tasks.contains(p), s"affected file $p not retired"))
    // no delete entries: CoW is physical
    assert(cat.loadEntries("t").forall(_.kind == "data"))
    assert(rowsOf(cat.scanTable(spark, "t")) ==
      (1L to 90L).map(k => (k, s"v$k")))
  }

  test("MoR and CoW agree with each other and with a plain filter; NULL predicate keeps the row") {
    // rows where the predicate evaluates to NULL must survive in BOTH modes
    val rows = Seq((1L, "keep"), (2L, "del"), (3L, null), (4L, "del"), (5L, "keep"))
    def build(): GraftCatalog = {
      val cat = newCatalog()
      val base = Files.createTempDirectory("graft-del-null").toString
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(s"$base/b0")
      cat.createTable("t",
        CompactionRunner.listParquet(s"$base/b0").map(DataFileTask(_, 1L)))
      cat
    }
    val out = Files.createTempDirectory("graft-del-out").toString
    val pred = col("v") === lit("del") // NULL for the null-v row

    val mor = build()
    mor.deleteWhere(spark, "t", pred, s"$out/mor")
    val cow = build()
    cow.deleteWhere(spark, "t", pred, s"$out/cow", copyOnWrite = true)

    val expected = Seq((1L, "keep"), (3L, null: String), (5L, "keep"))
    assert(rowsOf(mor.scanTable(spark, "t")) == expected)
    assert(rowsOf(cow.scanTable(spark, "t")) == expected)
  }

  test("CoW folds pending eq-deletes into the rewrite (fresh seq escapes the guard)") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-del-eq").toString
    val out = Files.createTempDirectory("graft-del-out").toString
    cat.createTable("t",
      writeParquet((1L to 10L).map(k => (k, s"v$k")), s"$base/b0")
        .map(DataFileTask(_, 1L)))

    // upsert k=1 → pending eq-delete suppresses the original (1, v1)
    cat.upsert(spark, "t", Seq((1L, "NEW")).toDF("k", "v"), Seq("k"), s"$out/up")
    // CoW delete k=2 affects the ORIGINAL file (which still holds old k=1);
    // the rewrite's fresh seq escapes the eq-delete guard, so the pending
    // delete must be applied during the rewrite or (1, v1) resurrects
    cat.deleteWhere(spark, "t", col("k") === 2, s"$out/cow", copyOnWrite = true)

    val got = rowsOf(cat.scanTable(spark, "t"))
    val expected = (Seq((1L, "NEW")) ++ (3L to 10L).map(k => (k, s"v$k")))
      .sortBy(t => (t._1, t._2))
    assert(got == expected)
  }

  test("no matching row: no commit in either mode") {
    val cat = newCatalog()
    freshTable(cat)
    val out = Files.createTempDirectory("graft-del-out").toString
    val head = cat.currentSnapshotId("t")
    assert(cat.deleteWhere(spark, "t", col("k") > 1000, out) == head)
    assert(cat.deleteWhere(spark, "t", col("k") > 1000, out, copyOnWrite = true) == head)
    assert(cat.currentSnapshotId("t") == head)
  }

  test("deleteWhereEq equals the position-scan delete for the same key set") {
    val keys = Seq(3L, 17L, 42L, 99L)
    val out = Files.createTempDirectory("graft-del-out").toString

    val byPos = newCatalog()
    freshTable(byPos)
    byPos.deleteWhere(spark, "t", col("k").isInCollection(keys), s"$out/pos")

    val byEq = newCatalog()
    freshTable(byEq)
    byEq.deleteWhereEq(spark, "t", keys.toDF("k"), s"$out/eq")

    // same live rows through the MoR read, different file classes in the
    // snapshot: the pos path scanned for (file, pos), the eq path committed
    // the key tuples themselves
    assert(rowsOf(byPos.scanTable(spark, "t")) == rowsOf(byEq.scanTable(spark, "t")))
    assert(byPos.loadEntries("t").exists(_.kind == "posdel"))
    val eqEntries = byEq.loadEntries("t").filter(_.kind == "eqdel")
    assert(eqEntries.nonEmpty && eqEntries.forall(_.eqCols == Seq("k")))

    // and compaction retires the eq-delete like any other (makes it physical)
    byEq.compactTable(spark, "t", s"$out/compact",
      CompactionRunner.CompactionConfig(targetPartitions = 1))
    assert(byEq.loadEntries("t").forall(_.kind == "data"))
    assert(rowsOf(byEq.scanTable(spark, "t")) ==
      (1L to 100L).filterNot(keys.contains).map(k => (k, s"v$k")))
  }

  test("deleteWhereEq touches zero data files: commits against unreadable paths") {
    // the structural claim — a key-predicate DELETE at 100 TB must be a
    // metadata-sized commit — proven by construction: the table's data
    // paths point NOWHERE, so any attempt to read data would throw.
    // deleteWhereEq still commits; only the later scan needs real files.
    val cat = newCatalog()
    cat.createTable("t", Seq(
      DataFileTask("/nonexistent/shard-0.parquet", 1L),
      DataFileTask("/nonexistent/shard-1.parquet", 1L)))
    val out = Files.createTempDirectory("graft-del-out").toString
    val snap = cat.deleteWhereEq(spark, "t", Seq(7L, 8L).toDF("k"), out)
    assert(snap == 2L)
    val eq = cat.loadEntries("t").filter(_.kind == "eqdel")
    assert(eq.nonEmpty && eq.forall(_.seqNum == 2L))
  }

  test("deleteWhereEq: null keys never match (dropped), empty keys no-op") {
    val cat = newCatalog()
    freshTable(cat)
    val out = Files.createTempDirectory("graft-del-out").toString
    val head = cat.currentSnapshotId("t")
    // all-null key set: nothing can equality-match → no commit at all
    assert(cat.deleteWhereEq(spark, "t",
      Seq(Option.empty[Long]).toDF("k"), out) == head)
    assert(cat.deleteWhereEq(spark, "t",
      Seq.empty[Long].toDF("k"), out) == head)
    // mixed: the null tuple is dropped, the real key still deletes
    cat.deleteWhereEq(spark, "t",
      Seq(Some(5L), Option.empty[Long]).toDF("k"), out)
    assert(rowsOf(cat.scanTable(spark, "t")) ==
      (1L to 100L).filterNot(_ == 5L).map(k => (k, s"v$k")))
  }
}
