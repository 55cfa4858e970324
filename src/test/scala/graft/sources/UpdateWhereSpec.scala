package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

import org.apache.spark.sql.functions.{col, concat, lit}

/** Row-level UPDATE (`GraftCatalog.updateWhere`) and snapshot rollback.
  * UPDATE composes the MoR primitives: position deletes suppress the old
  * row versions while a fresh data file carries the updated versions in the
  * same commit (or a CoW rewrite of just the affected files).
  */
class UpdateWhereSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(Files.createTempDirectory("graft-upd-cat").toString)

  private def writeParquet(rows: Seq[(Long, String)], dir: String): Seq[String] = {
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    CompactionRunner.listParquet(dir)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select("k", "v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSeq.sortBy(t => (t._1, String.valueOf(t._2)))

  private def freshTable(cat: GraftCatalog): (Seq[String], Seq[String]) = {
    val base = Files.createTempDirectory("graft-upd-base").toString
    val f0 = writeParquet((1L to 50L).map(k => (k, s"v$k")), s"$base/b0")
    val f1 = writeParquet((51L to 100L).map(k => (k, s"v$k")), s"$base/b1")
    cat.createTable("t", (f0 ++ f1).map(DataFileTask(_, 1L)))
    (f0, f1)
  }

  private def expectAfter(update: Long => Boolean): Seq[(Long, String)] =
    (1L to 100L).map(k => (k, if (update(k)) s"v$k!" else s"v$k"))

  test("MoR update: old versions suppressed, new versions live, data files untouched") {
    val cat = newCatalog()
    val (f0, f1) = freshTable(cat)
    val out = Files.createTempDirectory("graft-upd-out").toString
    val before = (f0 ++ f1).map(p => p -> new java.io.File(p).lastModified()).toMap

    val snap = cat.updateWhere(spark, "t", col("k") % 5 === 0,
      Map("v" -> concat(col("v"), lit("!"))), out)
    assert(snap == 2L)

    (f0 ++ f1).foreach(p =>
      assert(new java.io.File(p).lastModified() == before(p), s"$p rewritten by MoR update"))
    val entries = cat.loadEntries("t")
    assert(entries.count(_.kind == "posdel") >= 1)
    assert(entries.count(_.kind == "data") > (f0 ++ f1).size) // new version file

    assert(rowsOf(cat.scanTable(spark, "t")) == expectAfter(_ % 5 == 0))

    // compaction makes the update physical and retires the delete files
    cat.compactTable(spark, "t", s"$out/cmp")
    assert(cat.loadEntries("t").forall(_.kind == "data"))
    assert(rowsOf(cat.scanTable(spark, "t")) == expectAfter(_ % 5 == 0))
  }

  test("CoW update: only affected files rewritten, no delete entries") {
    val cat = newCatalog()
    val (f0, f1) = freshTable(cat)
    val out = Files.createTempDirectory("graft-upd-out").toString
    val m0 = f0.map(p => p -> new java.io.File(p).lastModified()).toMap

    // touches only the second file (k 51..100)
    cat.updateWhere(spark, "t", col("k") > 95,
      Map("v" -> concat(col("v"), lit("!"))), out, copyOnWrite = true)

    val tasks = cat.loadTable("t").map(_.path)
    f0.foreach { p =>
      assert(tasks.contains(p) &&
        new java.io.File(p).lastModified() == m0(p), s"unaffected $p touched")
    }
    f1.foreach(p => assert(!tasks.contains(p), s"affected $p not retired"))
    assert(cat.loadEntries("t").forall(_.kind == "data"))
    assert(rowsOf(cat.scanTable(spark, "t")) == expectAfter(_ > 95))
  }

  test("NULL predicate leaves the row unchanged in both modes; modes agree") {
    val rows = Seq((1L, "a"), (2L, "upd"), (3L, null), (4L, "upd"))
    def build(): GraftCatalog = {
      val cat = newCatalog()
      val base = Files.createTempDirectory("graft-upd-null").toString
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(s"$base/b0")
      cat.createTable("t",
        CompactionRunner.listParquet(s"$base/b0").map(DataFileTask(_, 1L)))
      cat
    }
    val out = Files.createTempDirectory("graft-upd-out").toString
    val pred = col("v") === lit("upd") // NULL for the null-v row
    val set = Map("v" -> lit("DONE"))

    val mor = build(); mor.updateWhere(spark, "t", pred, set, s"$out/m")
    val cow = build(); cow.updateWhere(spark, "t", pred, set, s"$out/c", copyOnWrite = true)

    val expected = Seq((1L, "a"), (2L, "DONE"), (3L, null: String), (4L, "DONE"))
      .sortBy(t => (t._1, String.valueOf(t._2)))
    assert(rowsOf(mor.scanTable(spark, "t")) == expected)
    assert(rowsOf(cow.scanTable(spark, "t")) == expected)
  }

  test("update never resurrects deleted rows; unknown SET column rejected") {
    val cat = newCatalog()
    freshTable(cat)
    val out = Files.createTempDirectory("graft-upd-out").toString
    cat.deleteWhere(spark, "t", col("k") === 10, out)
    // predicate covers the deleted row; the update must skip it — a MoR
    // update writing (10, X) as new data would resurrect the deleted row
    cat.updateWhere(spark, "t", col("k") >= 10 && col("k") <= 11,
      Map("v" -> lit("X")), out)
    val got = rowsOf(cat.scanTable(spark, "t"))
    assert(!got.exists(_._1 == 10L), "deleted row resurrected by update")
    assert(got.contains((11L, "X")))

    intercept[IllegalArgumentException] {
      cat.updateWhere(spark, "t", col("k") === 1, Map("nope" -> lit("x")), out)
    }
  }

  test("rollbackTo re-installs an old snapshot as a new commit; history stays readable") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-rb-base").toString
    val f0 = writeParquet((1L to 10L).map(k => (k, s"v$k")), s"$base/b0")
    cat.createTable("t", f0.map(DataFileTask(_, 1L)))

    val f1 = writeParquet(Seq((11L, "v11")), s"$base/b1")
    val snap2 = cat.commitRewrite("t", f1.map(DataFileTask(_, 2L)), Nil)
    assert(cat.loadTable("t").size == f0.size + 1)

    // no-op rollback to the current head
    assert(cat.rollbackTo("t", snap2) == snap2)

    val snap3 = cat.rollbackTo("t", 1L)
    assert(snap3 == snap2 + 1)
    assert(cat.loadTable("t").map(_.path).toSet == f0.toSet)
    // linear history: the rolled-back snapshot is still readable
    assert(cat.loadTableAt("t", snap2).map(_.path).toSet == (f0 ++ f1).toSet)
    assert(cat.snapshotIds("t") == Seq(1L, snap2, snap3))

    // the chain continues normally after a rollback
    val snap4 = cat.commitRewrite("t",
      writeParquet(Seq((12L, "v12")), s"$base/b2").map(DataFileTask(_, 3L)), Nil)
    assert(snap4 == snap3 + 1 && cat.loadTable("t").size == f0.size + 1)

    intercept[IllegalArgumentException](cat.rollbackTo("t", 99L))
  }

  test("updates on a field-id canonical schema keep ids: no NULL-out on id-resolved reads") {
    // regression: SET columns lose their field-id metadata through `.as`,
    // and an id-resolving scan (canonical schema with ids) served NULL for
    // the id-less column in the rewritten file — both writers must
    // re-align before writing
    import org.apache.spark.sql.types._
    def idField(name: String, dt: DataType, id: Long) =
      StructField(name, dt, nullable = true,
        metadata = new MetadataBuilder().putLong(FieldIds.MetaKey, id).build())
    val canonical = StructType(Seq(
      idField("k", LongType, 1L), idField("v", StringType, 2L)))
    for (cow <- Seq(false, true)) {
      val cat = newCatalog()
      val base = Files.createTempDirectory("graft-upd-fid").toString
      cat.createTable("t", Nil, Some(canonical))
      cat.appendFiles(spark, "t",
        (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v"), s"$base/a")
      val out = Files.createTempDirectory("graft-upd-fid-out").toString
      cat.updateWhere(spark, "t", col("k") <= 5,
        Map("v" -> concat(col("v"), lit("!"))), out, copyOnWrite = cow)
      assert(rowsOf(cat.scanTable(spark, "t")) ==
        (1L to 20L).map(k => (k, if (k <= 5) s"v$k!" else s"v$k")),
        s"copyOnWrite=$cow")
    }
  }
}
