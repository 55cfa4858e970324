package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{CompactionRunner, GraftCatalog}
import graft.sources.CompactionRunner.DataFileTask

/** The session-catalog DDL surface over the graft format — pins that the
  * full SQL lifecycle works against `CREATE TABLE … USING graft` tables
  * with zero graft imports after the staging step:
  *
  *   - `CREATE TABLE name USING graft OPTIONS (root …, table …)` registers
  *     a catalog table over an existing graft table (reads resolve through
  *     the relation provider on every query);
  *   - `CREATE TABLE … USING graft OPTIONS (…) AS SELECT …` (CTAS) CREATES
  *     the graft table from the query result via the
  *     `CreatableRelationProvider` path;
  *   - `INSERT INTO` appends a counted commit; `DELETE FROM` / `UPDATE` /
  *     `MERGE INTO` go through [[GraftSqlDml]] exactly as on temp views;
  *     `VERSION AS OF` through [[GraftSqlTimeTravel]].
  */
class SqlDdlSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): (GraftCatalog, String) = {
    val root = Files.createTempDirectory("graft-ddl").toString
    val cat = new GraftCatalog(root)
    (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$root/stage")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$root/stage").map(DataFileTask(_, 1L)))
    (cat, root)
  }

  test("CREATE TABLE USING graft + INSERT + DML + DROP lifecycle") {
    val (cat, root) = freshTable()
    spark.sql("DROP TABLE IF EXISTS ddl_t")
    spark.sql(s"CREATE TABLE ddl_t USING graft OPTIONS (root '$root', `table` 't')")

    def n(): Long =
      spark.sql("SELECT count(*) FROM ddl_t").collect().head.getLong(0)
    assert(n() == 10)

    val headBefore = cat.currentSnapshotId("t")
    spark.sql("INSERT INTO ddl_t VALUES (11, 'v11'), (12, 'v12')")
    assert(n() == 12)
    assert(cat.currentSnapshotId("t") == headBefore + 1,
      "INSERT INTO must land as exactly one append commit")

    spark.sql("DELETE FROM ddl_t WHERE k > 10")
    assert(n() == 10)
    spark.sql("UPDATE ddl_t SET v = 'x' WHERE k = 1")
    assert(spark.sql("SELECT v FROM ddl_t WHERE k = 1")
      .collect().head.getString(0) == "x")

    // DROP removes the session-catalog entry; the graft table survives
    // (the catalog object is the source of truth, Iceberg-style)
    spark.sql("DROP TABLE ddl_t")
    assert(cat.tables().contains("t"))
  }

  test("CTAS USING graft creates the graft table from the query result") {
    val (cat, root) = freshTable()
    spark.sql("DROP TABLE IF EXISTS ddl_src")
    spark.sql("DROP TABLE IF EXISTS ddl_ctas")
    spark.sql(s"CREATE TABLE ddl_src USING graft OPTIONS (root '$root', `table` 't')")
    spark.sql(
      s"""CREATE TABLE ddl_ctas USING graft OPTIONS (root '$root', `table` 'ct')
         |AS SELECT k, upper(v) AS v FROM ddl_src WHERE k <= 5""".stripMargin)
    assert(cat.tables().contains("ct"), "CTAS must create the graft table")
    val rows = spark.sql("SELECT k, v FROM ddl_ctas ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == (1L to 5L).map(k => (k, s"V$k")))
    // and the new table is a first-class catalog citizen: snapshot history
    assert(cat.snapshotIds("ct").nonEmpty)
    spark.sql("DROP TABLE ddl_src")
    spark.sql("DROP TABLE ddl_ctas")
  }
}
