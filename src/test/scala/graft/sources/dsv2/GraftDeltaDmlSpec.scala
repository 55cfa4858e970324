package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.GraftCatalog
import org.apache.spark.sql.SparkSession

/** The DELTA (merge-on-read) row-level path: with
  * `write.update.mode / write.merge.mode / write.delete.mode =
  * merge-on-read`, UPDATE/MERGE/DELETE commit position-delete files plus
  * new data files through Spark's native `WriteDelta` planning — the
  * original data files are NEVER rewritten. Plus the `_file`/`_pos`
  * metadata columns the delta path keys on, as a user-visible surface.
  */
class GraftDeltaDmlSpec extends SparkSpec {

  private def withCatalogSession(root: String)(body: SparkSession => Unit): Unit = {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val clean = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.sources.dsv2.GraftSparkCatalog")
      .config("spark.sql.catalog.graft.root", root)
      .getOrCreate()
    try body(clean)
    finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  private def dataPaths(cat: GraftCatalog, t: String): Set[String] =
    cat.loadEntries(t).filter(_.kind == "data").map(_.path).toSet

  test("merge-on-read UPDATE: pos-deletes + new file, originals untouched") {
    val root = Files.createTempDirectory("graft-delta-upd").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k BIGINT, qty BIGINT)")
      s.sql("INSERT INTO graft.t SELECT id, id * 10 FROM range(1, 101)")
      s.sql("ALTER TABLE graft.t SET TBLPROPERTIES " +
        "('write.update.mode' = 'merge-on-read')")
      val cat = new GraftCatalog(root)
      val before = dataPaths(cat, "t")
      val plan = s.sql(
        "EXPLAIN EXTENDED UPDATE graft.t SET qty = qty + 1 WHERE k <= 3")
        .head().getString(0)
      assert(plan.contains("WriteDelta"), plan)
      s.sql("UPDATE graft.t SET qty = qty + 1 WHERE k <= 3")
      // logical result
      assert(s.sql("SELECT sum(qty) FROM graft.t").head().getLong(0) ==
        (1L to 100L).map(_ * 10).sum + 3)
      // physical shape: originals intact, one delta commit added
      val entries = cat.loadEntries("t")
      assert(before.subsetOf(dataPaths(cat, "t")),
        "merge-on-read must not rewrite existing data files")
      assert(entries.exists(_.kind == "posdel"),
        "update must commit position-delete files")
      val newData = dataPaths(cat, "t") -- before
      assert(newData.nonEmpty, "updated versions land in new data files")
      // the new files hold exactly the 3 updated rows
      assert(entries.filter(e => newData(e.path)).map(_.recordCount).sum == 3)
    }
  }

  test("merge-on-read MERGE: matched update + delete + insert in one delta commit") {
    val root = Files.createTempDirectory("graft-delta-merge").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k BIGINT, qty BIGINT)")
      s.sql("INSERT INTO graft.t SELECT id, id * 10 FROM range(1, 11)")
      s.sql("ALTER TABLE graft.t SET TBLPROPERTIES " +
        "('write.merge.mode' = 'merge-on-read')")
      s.sql("CREATE TABLE graft.src (k BIGINT, qty BIGINT)")
      s.sql("INSERT INTO graft.src VALUES (1, 1000), (2, -1), (99, 990)")
      val cat = new GraftCatalog(root)
      val before = dataPaths(cat, "t")
      val head = cat.currentSnapshotId("t")
      s.sql(
        """MERGE INTO graft.t AS t USING graft.src AS s ON t.k = s.k
          |WHEN MATCHED AND s.qty < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET qty = s.qty
          |WHEN NOT MATCHED THEN INSERT (k, qty) VALUES (s.k, s.qty)""".stripMargin)
      val rows = s.sql("SELECT k, qty FROM graft.t ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.contains((1L, 1000L)) && rows.contains((99L, 990L)), rows)
      assert(!rows.exists(_._1 == 2L), s"k=2 must be deleted: $rows")
      assert(rows.size == 10, rows) // 10 - 1 deleted + 1 inserted
      // ONE delta snapshot; originals untouched
      assert(cat.currentSnapshotId("t") == head + 1)
      assert(before.subsetOf(dataPaths(cat, "t")))
      assert(cat.loadEntries("t").exists(_.kind == "posdel"))
      // and a later full compaction retires the delta debt
      cat.compactTable(s, "t", s"$root/_data/t/gen1")
      assert(cat.loadEntries("t").count(_.kind != "data") == 0)
      assert(s.sql("SELECT k, qty FROM graft.t ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq == rows)
    }
  }

  test("merge-on-read DELETE via an untranslatable condition uses WriteDelta too") {
    val root = Files.createTempDirectory("graft-delta-del").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k BIGINT)")
      s.sql("INSERT INTO graft.t SELECT id FROM range(0, 20)")
      s.sql("ALTER TABLE graft.t SET TBLPROPERTIES " +
        "('write.delete.mode' = 'merge-on-read')")
      val cat = new GraftCatalog(root)
      val before = dataPaths(cat, "t")
      // modulo is not a source filter: the metadata SupportsDelete path
      // declines, and the row-level plan must come out as WriteDelta
      val plan = s.sql("EXPLAIN EXTENDED DELETE FROM graft.t WHERE k % 3 = 0")
        .head().getString(0)
      assert(plan.contains("WriteDelta"), plan)
      s.sql("DELETE FROM graft.t WHERE k % 3 = 0")
      assert(s.sql("SELECT count(*) FROM graft.t").head().getLong(0) == 13L)
      assert(before.subsetOf(dataPaths(cat, "t")))
      assert(cat.loadEntries("t").exists(_.kind == "posdel"))
      // a delete-only delta writes NO data files
      assert(dataPaths(cat, "t") == before)
    }
  }

  test("copy-on-write with runtime group filtering replaces ONLY affected files") {
    val root = Files.createTempDirectory("graft-cow-group").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k BIGINT, v STRING)")
      // two single-partition inserts -> two data files with disjoint keys
      s.sql("""INSERT INTO graft.t
               SELECT /*+ REPARTITION(1) */ * FROM VALUES (1, 'a'), (3, 'b'), (5, 'c')""")
      s.sql("""INSERT INTO graft.t
               SELECT /*+ REPARTITION(1) */ * FROM VALUES (101, 'x'), (103, 'y')""")
      val cat = new GraftCatalog(root)
      val before = dataPaths(cat, "t")
      assert(before.size == 2, s"fixture needs two files: $before")
      // untranslatable condition (modulo) -> row-level COW; matching rows
      // live ONLY in the first file, so group filtering must confine the
      // rewrite to it
      s.sql("DELETE FROM graft.t WHERE k % 5 = 0")
      assert(s.sql("SELECT k FROM graft.t ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 3L, 101L, 103L))
      val after = dataPaths(cat, "t")
      val survivors = before.intersect(after)
      assert(survivors.size == 1,
        s"exactly one original file must survive untouched: before=$before after=$after")
      val replaced = before -- after
      assert(replaced.size == 1, s"exactly one file replaced: $replaced")
      // the surviving file is the one with no matching rows (k=100,102)
      val keptRows = s.sql("SELECT k, _file FROM graft.t WHERE k >= 100")
        .collect().map(_.getString(1)).toSet
      assert(keptRows.subsetOf(survivors.map(p =>
        graft.sources.CompactionRunner.canonPath(p))),
        s"rows of the untouched file must still read from it: $keptRows vs $survivors")
      // a DELETE matching NOTHING must leave the table head untouched
      val head = cat.currentSnapshotId("t")
      s.sql("DELETE FROM graft.t WHERE k % 97 = 45")
      assert(cat.currentSnapshotId("t") == head,
        "no-match group-filtered DELETE must not commit")
    }
  }

  test("filter overwrite (REPLACE WHERE) is one atomic pos-delete + append commit") {
    val root = Files.createTempDirectory("graft-repl-where").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k BIGINT, v STRING)")
      s.sql("INSERT INTO graft.t VALUES (1, 'old1'), (2, 'old2'), (9, 'keep')")
      val cat = new GraftCatalog(root)
      val head = cat.currentSnapshotId("t")
      val before = dataPaths(cat, "t")
      // SQL REPLACE WHERE: rows with k < 5 replaced by the new slice
      s.sql("""INSERT INTO graft.t REPLACE WHERE k < 5
               VALUES (1, 'new1'), (3, 'new3')""")
      val rows = s.sql("SELECT k, v FROM graft.t ORDER BY k, v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "new1"), (3L, "new3"), (9L, "keep")), rows)
      // ONE commit: pos-deletes suppress the old matching rows, originals
      // untouched, replacement files added
      assert(cat.currentSnapshotId("t") == head + 1, "atomic: one snapshot")
      assert(before.subsetOf(dataPaths(cat, "t")), "no data-file rewrite")
      assert(cat.loadEntries("t").exists(_.kind == "posdel"))
      // DataFrameWriterV2 spelling of the same operation
      import s.implicits._
      Seq((9L, "replaced9")).toDF("k", "v").writeTo("graft.t")
        .overwrite($"k" > 5)
      assert(s.sql("SELECT v FROM graft.t WHERE k = 9").head().getString(0)
        == "replaced9")
      // stale-base safety: a concurrent commit between plan and commit
      // conflicts instead of overwriting blind
      intercept[graft.sources.GraftError.Metadata](
        cat.commitRowDelta("t", head, Nil,
          Seq(graft.sources.GraftCatalog.AddedFile("nope.parquet", "parquet", 1, 1))))
    }
  }

  test("INSERT into a sort-ordered table lands range-clustered files") {
    val root = Files.createTempDirectory("graft-ordered-w").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k BIGINT, v STRING)")
      val cat = new GraftCatalog(root)
      cat.setSortOrder("t", Seq("k"))
      // rows arrive SHUFFLED; the declared write-order must make the
      // engine range-partition + sort them before the writers (AQE
      // coalescing off so the tiny fixture keeps several partitions —
      // at real scale the range exchange produces many)
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      s.sql("""INSERT INTO graft.t
               SELECT /*+ REPARTITION(4) */ id * 37 % 1000 AS k,
                      CAST(id AS STRING) AS v
               FROM range(0, 1000)""")
      val files = cat.loadEntries("t").filter(_.kind == "data").map(_.path)
      assert(files.size > 1, s"need several files to prove clustering: $files")
      // per-file [min, max] of k must be pairwise DISJOINT (range
      // clustering), which unordered round-robin writes would never give
      val bounds = files.map { p =>
        val r = s.read.parquet(p.stripPrefix("file:"))
          .agg(org.apache.spark.sql.functions.min("k"),
            org.apache.spark.sql.functions.max("k")).head()
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
      bounds.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) =>
          assert(hi <= lo2, s"overlapping file ranges: $bounds")
        case _ => ()
      }
      // and the rows all arrived
      assert(s.sql("SELECT count(*) FROM graft.t").head().getLong(0) == 1000L)
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
  }

  test("_file and _pos metadata columns are selectable and delete-consistent") {
    val root = Files.createTempDirectory("graft-delta-meta").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k BIGINT)")
      s.sql("INSERT INTO graft.t SELECT id FROM range(0, 10)")
      val withMeta = s.sql("SELECT k, _file, _pos FROM graft.t").collect()
      assert(withMeta.length == 10)
      assert(withMeta.forall(_.getString(1).endsWith(".parquet")), "real paths")
      val positions = withMeta.map(r => (r.getString(1), r.getLong(2))).toSet
      assert(positions.size == 10, "identity must be unique per row")
      // rows suppressed by a MoR delete disappear from the identity view too
      s.sql("ALTER TABLE graft.t SET TBLPROPERTIES " +
        "('write.delete.mode' = 'merge-on-read')")
      s.sql("DELETE FROM graft.t WHERE k % 2 = 0")
      assert(s.sql("SELECT _pos FROM graft.t").collect().length == 5)
    }
  }

  test("partially-translatable OR conditions never weaken DELETE or REPLACE WHERE") {
    // regression: Spark's default V2->V1 predicate bridging converts an
    // Or whose one side has no V1 form into the OTHER SIDE ALONE (sound
    // for scan pushdown, where residual filters re-check rows) — routed
    // into SupportsDelete.deleteWhere that silently deleted the wrong
    // row set (`k = 0 OR k % 101 = 50` arrived as `k = 0`). The strict
    // conversion refuses, and the row-level rewrite executes exactly.
    val root = Files.createTempDirectory("graft-delta-strictor").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k BIGINT, v STRING)")
      s.sql("INSERT INTO graft.t SELECT id, concat('v', id) FROM range(0, 3000)")
      s.sql("DELETE FROM graft.t WHERE k = 0 OR k = 2999 OR k % 101 = 50")
      val expect = (0L until 3000L)
        .filterNot(k => k == 0 || k == 2999 || k % 101 == 50)
      assert(s.sql("SELECT count(*) FROM graft.t").head().getLong(0)
        == expect.length.toLong,
        "the OR's untranslatable disjunct must not be dropped")
      assert(s.sql("SELECT sum(k) FROM graft.t").head().getLong(0) == expect.sum)
      // REPLACE WHERE with the same shape must fail LOUDLY, not weaken
      val e = intercept[Exception](s.sql(
        """INSERT INTO graft.t REPLACE WHERE k = 1 OR k % 7 = 3
          |SELECT id, concat('r', id) FROM range(0, 5)""".stripMargin))
      assert(e.getMessage.contains("REPLACE WHERE") ||
        e.getMessage.contains("overwrite"), e.getMessage)
    }
  }
}
