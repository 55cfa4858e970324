package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.GraftCatalog

/** Session-scoped write-audit-publish routing (`spark.wap.branch`) and
  * first-class branch DML: with the conf set, doorway writes land on the
  * named branch fork (created on first write), reads audit the branch
  * once it exists, `VERSION AS OF 'main'` always reads main, and
  * `publish_branch` adopts the audited state atomically — Iceberg's WAP
  * contract through the DSv2 doorway.
  */
class WapBranchSpec extends SparkSpec {

  private def mount(root: String): String = {
    val g = s"gw_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    g
  }

  test("spark.wap.branch: writes fork, main untouched, publish adopts") {
    val root = Files.createTempDirectory("graft-wap-conf").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('base', id) FROM range(0, 100)")
    val cat = new GraftCatalog(root)
    try {
      spark.conf.set("spark.wap.branch", "audit")
      // a PURE read under the conf, before any write: serves main and
      // must NOT create the branch
      assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 100L)
      assert(!cat.tables().contains("t@audit"),
        "a read-only statement must never create the branch")
      // the first WRITE creates the fork and lands on it
      spark.sql(s"INSERT INTO $g.t SELECT id, concat('staged', id) FROM range(100, 150)")
      assert(cat.tables().contains("t@audit"), "write must create the branch")
      // main unchanged; the audit read (plain SELECT now routes to the
      // branch) and VERSION AS OF 'audit' both see the staged rows
      assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF 'main'")
        .head().getLong(0) == 100L, "main must not see unpublished writes")
      assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 150L,
        "the session's reads audit the branch once it exists")
      assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF 'audit'")
        .head().getLong(0) == 150L)
      // audited DML also lands on the branch, not main
      spark.sql(s"DELETE FROM $g.t WHERE k = 120")
      assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 149L)
      assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF 'main'")
        .head().getLong(0) == 100L)
      // publish: main adopts the audited state
      spark.sql(s"CALL $g.system.publish_branch('t', 'audit')").collect()
      assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF 'main'")
        .head().getLong(0) == 149L)
    } finally spark.conf.unset("spark.wap.branch")
    // conf cleared: plain reads are main again (which now has the rows)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 149L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t WHERE v LIKE 'staged%'")
      .head().getLong(0) == 49L)
  }

  test("branch tables are first-class DML targets: t@branch through SQL") {
    val root = Files.createTempDirectory("graft-wap-dml").toString
    val g = mount(root)
    spark.sql(
      s"""CREATE TABLE $g.t (k BIGINT, v STRING)
         |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 1000)")
    spark.sql(s"ALTER TABLE $g.t CREATE BRANCH audit")
    val cat = new GraftCatalog(root)
    // MoR DELETE against the branch identifier: pos-delete files land on
    // the FORK's chain; main's snapshot never changes
    val mainHead = cat.currentSnapshotId("t")
    spark.sql(s"DELETE FROM $g.`t@audit` WHERE k % 10 = 3 OR k = 999")
    assert(cat.currentSnapshotId("t") == mainHead, "main must not move")
    assert(cat.loadEntries("t@audit").exists(_.kind == "posdel"),
      "the branch DELETE must commit MoR delete files on the fork")
    assert(!cat.loadEntries("t").exists(_.kind == "posdel"))
    val expect = (0L until 1000L).filterNot(k => k % 10 == 3 || k == 999)
    assert(spark.sql(s"SELECT k FROM $g.`t@audit`").collect()
      .map(_.getLong(0)).sorted.toSeq == expect)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 1000L)
    // UPDATE and INSERT against the branch too
    spark.sql(s"UPDATE $g.`t@audit` SET v = 'audited' WHERE k = 0")
    spark.sql(s"INSERT INTO $g.`t@audit` VALUES (5000, 'extra')")
    assert(spark.sql(s"SELECT v FROM $g.`t@audit` WHERE k = 0")
      .head().getString(0) == "audited")
    assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 1000L)
    // maintenance against the branch: compaction retires the fork's
    // delete files without touching main
    spark.sql(s"CALL $g.system.rewrite_data_files('t@audit')").collect()
    assert(!cat.loadEntries("t@audit").exists(_.kind == "posdel"),
      "branch compaction must retire the fork's delete files")
    assert(cat.currentSnapshotId("t") == mainHead)
    // publish carries the audited state (delete applied, update, insert)
    spark.sql(s"CALL $g.system.publish_branch('t', 'audit')").collect()
    assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) ==
      expect.size + 1L)
    assert(spark.sql(s"SELECT v FROM $g.t WHERE k = 0").head().getString(0)
      == "audited")
    assert(spark.sql(s"SELECT v FROM $g.t WHERE k = 5000").head().getString(0)
      == "extra")
  }

  test("EXPLAIN of any write shape under wap.branch creates no branch") {
    val root = Files.createTempDirectory("graft-wap-explain").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v STRING)")
    // TWO files, so the executed COW DELETE below also exercises runtime
    // group filtering (single-file tables opt out automatically) against
    // the deferred fork
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(50, 100)")
    spark.sql(
      s"""CREATE TABLE $g.src (k BIGINT, v STRING)
         |TBLPROPERTIES ('write.merge.mode' = 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $g.src VALUES (1, 'x'), (999, 'y')")
    val cat = new GraftCatalog(root)
    try {
      spark.conf.set("spark.wap.branch", "audit")
      // every write shape: plain append, whole/filter/dynamic overwrite,
      // and row-level DML in BOTH modes — planning (EXPLAIN) must be a
      // pure metadata read, the contract the maintenance TVFs honor
      for (stmt <- Seq(
          s"INSERT INTO $g.t VALUES (100, 'a')",
          s"INSERT OVERWRITE $g.t VALUES (101, 'b')",
          s"INSERT INTO $g.t REPLACE WHERE k < 10 VALUES (102, 'c')",
          s"DELETE FROM $g.t WHERE k % 7 = 0",
          s"UPDATE $g.t SET v = 'u' WHERE k = 3",
          s"MERGE INTO $g.t USING $g.src s ON $g.t.k = s.k " +
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")) {
        spark.sql(s"EXPLAIN EXTENDED $stmt").collect()
        assert(!cat.tables().contains("t@audit"),
          s"EXPLAIN of [$stmt] must not create the branch")
      }
      // merge-on-read row-level DML defers too
      spark.sql(s"EXPLAIN EXTENDED DELETE FROM $g.src WHERE v = 'x'")
        .collect()
      assert(!cat.tables().contains("src@audit"))
      // ...and the REAL statements still fork on commit and land on the
      // branch with main untouched (the deferred-fork path end-to-end)
      val mainHead = cat.currentSnapshotId("t")
      spark.sql(s"DELETE FROM $g.t WHERE k % 7 = 0")
      assert(cat.tables().contains("t@audit"),
        "the executed DML must create the branch at commit")
      assert(cat.currentSnapshotId("t") == mainHead, "main must not move")
      assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF 'main'")
        .head().getLong(0) == 100L)
      assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF 'audit'")
        .head().getLong(0) == 100L - 15L)
      // an overwrite after the fork exists pins its base eagerly and
      // still lands on the branch
      spark.sql(s"INSERT OVERWRITE $g.t VALUES (7, 'only')")
      assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF 'audit'")
        .head().getLong(0) == 1L)
      assert(cat.currentSnapshotId("t") == mainHead)
    } finally spark.conf.unset("spark.wap.branch")
  }

  test("deferred wap fork: MoR row-level DML lands its delta on the fork") {
    val root = Files.createTempDirectory("graft-wap-defer-mor").toString
    val g = mount(root)
    spark.sql(
      s"""CREATE TABLE $g.t (k BIGINT, v STRING)
         |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 200)")
    val cat = new GraftCatalog(root)
    val mainHead = cat.currentSnapshotId("t")
    try {
      spark.conf.set("spark.wap.branch", "audit")
      // untranslatable condition -> WriteDelta; the fork is created by
      // the delta COMMIT, not the planning
      spark.sql(s"DELETE FROM $g.t WHERE k % 13 = 5 OR k % 17 = 2")
      assert(cat.tables().contains("t@audit"))
      assert(cat.loadEntries("t@audit").exists(_.kind == "posdel"),
        "the deferred MoR DELETE must commit delete files on the fork")
      assert(cat.currentSnapshotId("t") == mainHead)
      assert(!cat.loadEntries("t").exists(_.kind == "posdel"))
      val expect = (0L until 200L).filterNot(k => k % 13 == 5 || k % 17 == 2)
      assert(spark.sql(s"SELECT k FROM $g.t VERSION AS OF 'audit'").collect()
        .map(_.getLong(0)).sorted.toSeq == expect)
    } finally spark.conf.unset("spark.wap.branch")
  }

  test("VERSION AS OF 'main' and explicit branch writes bypass wap routing") {
    val root = Files.createTempDirectory("graft-wap-bypass").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT)")
    spark.sql(s"INSERT INTO $g.t VALUES (1), (2)")
    spark.sql(s"ALTER TABLE $g.t CREATE BRANCH other")
    try {
      spark.conf.set("spark.wap.branch", "audit")
      // an EXPLICIT branch identifier is never re-routed by the conf
      spark.sql(s"INSERT INTO $g.`t@other` VALUES (99)")
      assert(spark.sql(s"SELECT count(*) FROM $g.`t@other`").head().getLong(0) == 3L)
      assert(!new GraftCatalog(root).tables().contains("t@audit"),
        "writing t@other must not create the wap branch")
      assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF 'main'")
        .head().getLong(0) == 2L)
    } finally spark.conf.unset("spark.wap.branch")
  }
}
