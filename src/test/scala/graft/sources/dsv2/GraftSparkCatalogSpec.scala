package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.GraftCatalog
import org.apache.spark.sql.SparkSession

/** The DSv2 doorway (`spark.sql.catalog.graft`) — SELECT, INSERT, and all
  * three row-level DML statements on `graft.ns.t` identifiers through
  * Spark's NATIVE planning, on a session with NO graft extensions
  * installed (the rules the extensions inject are for the V1/TVF surface;
  * this path must not need them).
  */
class GraftSparkCatalogSpec extends SparkSpec {

  /** A separate SparkSession on the shared context with the graft DSv2
    * catalog mounted and extensions EMPTIED — proves the native-planning
    * claim (the shared test session's extensions conf would otherwise be
    * inherited from the SparkContext conf).
    */
  private def withCatalogSession(root: String)(body: SparkSession => Unit): Unit = {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val clean = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "")
      .config("spark.sql.catalog.graft", "graft.sources.dsv2.GraftSparkCatalog")
      .config("spark.sql.catalog.graft.root", root)
      .getOrCreate()
    try {
      assert(clean ne old, "must get a FRESH session, not the shared one")
      body(clean)
    } finally {
      clean.catalog.clearCache()
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("namespace DDL + CREATE + INSERT + SELECT round-trip, library interop") {
    val root = Files.createTempDirectory("graft-dsv2").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE NAMESPACE graft.db")
      val namespaces = s.sql("SHOW NAMESPACES IN graft")
        .collect().map(_.getString(0)).toSet
      assert(namespaces == Set("default", "db"), namespaces)
      s.sql("CREATE TABLE graft.db.t (k BIGINT, v STRING)")
      assert(s.sql("SHOW TABLES IN graft.db").collect()
        .map(_.getString(1)).toSeq == Seq("t"))
      s.sql("INSERT INTO graft.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      assert(s.sql("SELECT * FROM graft.db.t ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // column pruning + filter reach the doorway scan
      assert(s.sql("SELECT v FROM graft.db.t WHERE k = 2").collect()
        .map(_.getString(0)).toSeq == Seq("b"))
      assert(s.sql("SELECT count(*) FROM graft.db.t").head().getLong(0) == 3L)
      // the SAME table reads through the library API (one catalog)
      val cat = new GraftCatalog(root)
      assert(cat.scanTable(s, "db/t").count() == 3)
      // and a library-created FLAT table reads as graft.default
      import s.implicits._
      cat.createTable("flat", Nil)
      cat.appendFiles(s, "flat", Seq((9L, "z")).toDF("k", "v"),
        s"$root/_stage")
      assert(s.sql("SELECT v FROM graft.flat").head().getString(0) == "z")
      assert(s.sql("SELECT v FROM graft.default.flat").head().getString(0) == "z")
    }
  }

  test("DELETE / UPDATE / MERGE via native row-level planning, no extensions") {
    val root = Files.createTempDirectory("graft-dsv2-dml").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.t (k BIGINT, qty BIGINT)")
      s.sql("INSERT INTO graft.db.t SELECT id, id * 10 FROM range(1, 11)")
      val cat0 = new GraftCatalog(root)
      val dataBefore = cat0.loadEntries("db/t").filter(_.kind == "data")
        .map(_.path).toSet
      // a TRANSLATABLE condition takes the metadata path: MoR position-
      // delete commit via SupportsDelete — data files untouched, no rewrite
      s.sql("DELETE FROM graft.db.t WHERE k > 8")
      assert(s.sql("SELECT count(*), sum(qty) FROM graft.db.t").head()
        .toSeq == Seq(8L, 360L))
      assert(cat0.loadEntries("db/t").filter(_.kind == "data")
        .map(_.path).toSet == dataBefore,
        "translatable DELETE must be merge-on-read: data files unchanged")
      assert(cat0.loadEntries("db/t").exists(_.kind == "posdel"),
        "translatable DELETE must commit position-delete files")
      // an UNTRANSLATABLE condition (modulo) falls back to the native
      // copy-on-write ReplaceData rewrite
      val cowPlan = s.sql(
        "EXPLAIN EXTENDED DELETE FROM graft.db.t WHERE k % 7 = 0")
        .head().getString(0)
      assert(cowPlan.contains("ReplaceData"), cowPlan)
      s.sql("DELETE FROM graft.db.t WHERE k % 7 = 0")
      assert(s.sql("SELECT count(*), sum(qty) FROM graft.db.t").head()
        .toSeq == Seq(7L, 290L))
      // UPDATE
      s.sql("UPDATE graft.db.t SET qty = qty + 1 WHERE k <= 2")
      assert(s.sql("SELECT sum(qty) FROM graft.db.t").head().getLong(0) == 292L)
      // MERGE: update one row, insert one row
      s.sql("CREATE TABLE graft.db.src (k BIGINT, qty BIGINT)")
      s.sql("INSERT INTO graft.db.src VALUES (1, 1000), (99, 990)")
      s.sql(
        """MERGE INTO graft.db.t AS t USING graft.db.src AS s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET qty = s.qty
          |WHEN NOT MATCHED THEN INSERT (k, qty) VALUES (s.k, s.qty)""".stripMargin)
      val rows = s.sql("SELECT k, qty FROM graft.db.t ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.contains((1L, 1000L)) && rows.contains((99L, 990L)), rows)
      assert(rows.size == 8, rows) // {1..6, 8} + inserted 99
      // every DML committed a snapshot; history is linear and readable
      val cat = new GraftCatalog(root)
      assert(cat.currentSnapshotId("db/t") >= 5)
      // INSERT OVERWRITE replaces the content in one commit
      s.sql("INSERT OVERWRITE graft.db.t VALUES (100, 1), (200, 2)")
      assert(s.sql("SELECT count(*), sum(qty) FROM graft.db.t").head()
        .toSeq == Seq(2L, 3L))
      // TRUNCATE
      s.sql("TRUNCATE TABLE graft.db.t")
      assert(s.sql("SELECT count(*) FROM graft.db.t").head().getLong(0) == 0L)
    }
  }

  test("VERSION AS OF time travel by snapshot id and tag") {
    val root = Files.createTempDirectory("graft-dsv2-tt").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k BIGINT)")
      s.sql("INSERT INTO graft.t VALUES (1)")
      s.sql("INSERT INTO graft.t VALUES (2)")
      val cat = new GraftCatalog(root)
      val mid = cat.currentSnapshotId("t") - 1 // after the first insert
      cat.tagSnapshot("t", "first", mid)
      assert(s.sql(s"SELECT count(*) FROM graft.t VERSION AS OF $mid")
        .head().getLong(0) == 1L)
      assert(s.sql("SELECT count(*) FROM graft.t VERSION AS OF 'first'")
        .head().getLong(0) == 1L)
      assert(s.sql("SELECT count(*) FROM graft.t").head().getLong(0) == 2L)
    }
  }

  test("TIMESTAMP AS OF time travel on catalog identifiers") {
    val root = Files.createTempDirectory("graft-dsv2-ts").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k BIGINT)")
      s.sql("INSERT INTO graft.t VALUES (1)")
      Thread.sleep(1100) // snapshot timestamps are mtime-derived; separate them
      s.sql("INSERT INTO graft.t VALUES (2)")
      val cat = new GraftCatalog(root)
      val head = cat.currentSnapshotId("t")
      val midTs = cat.snapshotTimestampMs("t", head - 1)
      assert(cat.snapshotTimestampMs("t", head) > midTs,
        "snapshots must have distinguishable commit timestamps for this test")
      def tsLit(ms: Long): String =
        java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochMilli(ms))
      // an instant between the two commits resolves to the FIRST snapshot
      assert(s.sql(
        s"SELECT count(*) FROM graft.t TIMESTAMP AS OF '${tsLit(midTs)}'")
        .head().getLong(0) == 1L)
      // an instant after the head resolves to the head
      assert(s.sql(
        s"SELECT count(*) FROM graft.t TIMESTAMP AS OF '${tsLit(System.currentTimeMillis() + 1000)}'")
        .head().getLong(0) == 2L)
      // an instant before the table existed errors (Iceberg's contract)
      val e = intercept[Exception] {
        s.sql(
          s"SELECT count(*) FROM graft.t TIMESTAMP AS OF '${tsLit(midTs - 3600 * 1000)}'")
          .collect()
      }
      assert(e.getMessage.contains("no snapshot"), e.getMessage)
    }
  }

  test("a small doorway table auto-broadcasts in joins from manifest sizes") {
    val root = Files.createTempDirectory("graft-dsv2-stats").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.dim (k BIGINT, name STRING)")
      s.sql("INSERT INTO graft.dim SELECT id, concat('n', id) FROM range(0, 50)")
      s.range(0, 100000).createOrReplaceTempView("fact")
      val joined = s.sql(
        """SELECT f.id, d.name FROM fact f
          |JOIN graft.dim d ON f.id % 50 = d.k""".stripMargin)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"a KB-sized catalog table must broadcast without a hint:\n${plan.take(1500)}")
      assert(joined.count() == 100000L)
    }
  }

  test("metadata tables: graft.db.t.files/partitions/snapshots/history") {
    val root = Files.createTempDirectory("graft-dsv2-meta").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE NAMESPACE graft.db")
      s.sql("CREATE TABLE graft.db.t (k BIGINT, grp INT) PARTITIONED BY (grp)")
      s.sql("INSERT INTO graft.db.t SELECT id, CAST(id % 3 AS INT) FROM range(0, 300)")
      s.sql("INSERT INTO graft.db.t SELECT id, CAST(id % 3 AS INT) FROM range(300, 600)")

      val files = s.sql("SELECT content, record_count FROM graft.db.t.files")
        .collect()
      assert(files.nonEmpty && files.forall(_.getString(0) == "data"))
      assert(files.map(_.getLong(1)).sum == 600L)

      val parts = s.sql(
        """SELECT CAST(partition['grp'] AS INT) AS grp, record_count
          |FROM graft.db.t.partitions ORDER BY grp""".stripMargin).collect()
      assert(parts.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
        (0 until 3).map(g => (g, 200L)),
        s"partitions view: ${parts.mkString(",")}")

      val snaps = s.sql(
        "SELECT snapshot_id, is_current, operation FROM graft.db.t.snapshots")
        .collect()
      assert(snaps.count(_.getBoolean(1)) == 1 && snaps.length >= 3)

      assert(s.sql("SELECT count(*) FROM graft.db.t.history").head().getLong(0)
        == snaps.length.toLong)

      // refs: main + every tag + every WAP branch, typed
      val cat = new GraftCatalog(root)
      cat.tagSnapshot("db/t", "v1", cat.currentSnapshotId("db/t"))
      cat.forkTable("db/t", "audit")
      val refs = s.sql("SELECT name, type, snapshot_id FROM graft.db.t.refs")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(refs.contains(("main", "BRANCH", cat.currentSnapshotId("db/t"))))
      assert(refs.contains(("v1", "TAG", cat.currentSnapshotId("db/t"))))
      assert(refs.exists { case (n, t, _) => n == "audit" && t == "BRANCH" })

      // a real table always wins over the metadata suffix; a bogus kind
      // stays a missing table
      intercept[Exception] {
        s.sql("SELECT * FROM graft.db.t.nope").collect()
      }
    }
  }

  test("schema-less table load serves the footer schema, byte-equal to " +
      "the scan's, with deletes pending") {
    // r21: the doorway's relation resolution no longer builds the MoR
    // scan plan just to read .schema for schema-less tables — the footer
    // schema must stay EXACTLY what the scan serves, including once
    // delete files exist (deletes never change the read schema) and on a
    // mixed-schema table (which keeps the scan-derived path)
    val root = Files.createTempDirectory("graft-dsv2-schema").toString
    val cat = new GraftCatalog(root)
    val base = Files.createTempDirectory("graft-dsv2-schema-src").toString
    import spark.implicits._
    (1L to 50L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$base/b0")
    cat.createTable("t",
      graft.sources.CompactionRunner.listParquet(s"$base/b0")
        .map(graft.sources.CompactionRunner.DataFileTask(_, 1L)))
    assert(cat.currentSchema("t").isEmpty, "fixture must be schema-less")
    def loadedSchema() =
      new GraftV2Table(root, "t", asOf = None).schema
    assert(loadedSchema() == cat.scanTable(spark, "t").schema)
    // MoR delete: posdel entries pend, schema unchanged
    cat.deleteWhere(spark, "t",
      org.apache.spark.sql.functions.col("k") <= 5,
      Files.createTempDirectory("graft-dsv2-schema-out").toString)
    assert(cat.loadEntries("t").exists(_.kind == "posdel"))
    assert(loadedSchema() == cat.scanTable(spark, "t").schema)
    // second generation with a DIFFERENT physical schema (extra column):
    // two schema groups -> the cheap path must refuse and the load must
    // still agree with the scan
    (51L to 60L).map(k => (k, s"v$k", k * 2)).toDF("k", "v", "w")
      .coalesce(1).write.parquet(s"$base/b1")
    cat.commitAppend("t",
      graft.sources.CompactionRunner.listParquet(s"$base/b1")
        .map(p => GraftCatalog.AddedFile(p, "parquet", 10L,
          new java.io.File(p).length())))
    assert(loadedSchema() == cat.scanTable(spark, "t").schema)
  }

  test("DDL edges: drop, rename across namespaces, properties, errors") {
    val root = Files.createTempDirectory("graft-dsv2-ddl").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE NAMESPACE graft.a")
      s.sql("CREATE TABLE graft.a.t (k BIGINT)")
      s.sql("INSERT INTO graft.a.t VALUES (7)")
      s.sql("ALTER TABLE graft.a.t SET TBLPROPERTIES ('team' = 'pipeline')")
      assert(new GraftCatalog(root).tableProperties("a/t")("team") == "pipeline")
      s.sql("ALTER TABLE graft.a.t RENAME TO a.u")
      assert(s.sql("SELECT k FROM graft.a.u").head().getLong(0) == 7L)
      intercept[Exception](s.sql("SELECT * FROM graft.a.t").collect())
      s.sql("DROP TABLE graft.a.u")
      assert(s.sql("SHOW TABLES IN graft.a").collect().isEmpty)
      s.sql("DROP NAMESPACE graft.a")
      intercept[Exception](s.sql("CREATE TABLE graft.missing.t (k BIGINT)"))
      // replace-commit conflict surface: a stale base throws the
      // retryable metadata conflict
      s.sql("CREATE TABLE graft.c (k BIGINT)")
      val cat = new GraftCatalog(root)
      val head = cat.currentSnapshotId("c")
      intercept[graft.sources.GraftError.Metadata](
        cat.commitReplaceAt("c", head - 1, Nil))
    }
  }
}
