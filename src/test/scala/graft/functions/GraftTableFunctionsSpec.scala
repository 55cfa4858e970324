package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.sources.{CompactionRunner, GraftCatalog}
import graft.sources.CompactionRunner.DataFileTask

/** Table-valued functions ([[GraftTableFunctions]]): catalog tables and
  * metadata tables addressable from a bare SQL string — no view
  * registration, no graft imports at the call site.
  */
class GraftTableFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): (GraftCatalog, String) = {
    val root = Files.createTempDirectory("graft-tvf").toString
    val cat = new GraftCatalog(root)
    (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$root/stage")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$root/stage").map(DataFileTask(_, 1L)))
    (cat, root)
  }

  test("graft_table serves the current MoR state") {
    val (cat, root) = freshTable()
    cat.deleteWhere(spark, "t", col("k") % 10 === 0, s"$root/out")
    val got = spark.sql(s"SELECT count(*) AS n, sum(k) AS s FROM graft_table('$root', 't')")
      .collect().head
    val want = cat.scanTable(spark, "t")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("k")).collect().head
    assert(got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1))
    assert(got.getLong(0) == 90)
  }

  test("graft_table time-travels by snapshot id and by tag") {
    val (cat, root) = freshTable()
    val head0 = cat.currentSnapshotId("t")
    cat.tagSnapshot("t", "before", head0)
    cat.deleteWhere(spark, "t", col("k") <= 50, s"$root/out")

    val now = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root', 't')")
      .collect().head.getLong(0)
    val atId = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root', 't', $head0)")
      .collect().head.getLong(0)
    val atTag = spark.sql(s"SELECT count(*) AS n FROM graft_table('$root', 't', 'before')")
      .collect().head.getLong(0)
    assert(now == 50 && atId == 100 && atTag == 100)
  }

  test("graft_table composes: join between two versions in one statement") {
    val (cat, root) = freshTable()
    val head0 = cat.currentSnapshotId("t")
    cat.deleteWhere(spark, "t", col("k") > 90, s"$root/out")
    // rows present then but gone now — the changelog-style diff as plain SQL
    val gone = spark.sql(
      s"""SELECT was.k FROM graft_table('$root', 't', $head0) was
         |LEFT ANTI JOIN graft_table('$root', 't') now ON was.k = now.k""".stripMargin)
      .collect().map(_.getLong(0)).sorted
    assert(gone.toSeq == (91L to 100L))
  }

  test("graft_meta serves the metadata tables") {
    val (cat, root) = freshTable()
    val files = spark.sql(s"SELECT * FROM graft_meta('$root', 't', 'files')")
    assert(files.count() >= 1)
    assert(files.columns.contains("file_path"))
    val snaps = spark.sql(
      s"SELECT count(*) AS n FROM graft_meta('$root', 't', 'snapshots')")
      .collect().head.getLong(0)
    assert(snaps == cat.snapshotIds("t").length)
  }

  test("filters over graft_table reach the relation (pruning hint intact)") {
    val (_, root) = freshTable()
    val df = spark.sql(s"SELECT k, v FROM graft_table('$root', 't') WHERE k BETWEEN 10 AND 20")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (10L to 20L))
    // the underlying relation is PrunedFilteredScan: the filter must appear
    // pushed in the physical plan (re-applied exactly on top, as always)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("Filter"))
  }

  test("graft_changes serves the CDC window as a FROM clause") {
    val (cat, root) = freshTable()
    val s0 = cat.currentSnapshotId("t")
    cat.tagSnapshot("t", "w0", s0)
    cat.deleteWhere(spark, "t", col("k") <= 5, s"$root/out")
    val s1 = cat.currentSnapshotId("t")
    val byId = spark.sql(
      s"""SELECT _change_type, count(*) AS n
         |FROM graft_changes('$root', 't', $s0, $s1)
         |GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byId == Map("D" -> 5L))
    // tag-addressed lower bound, and the D rows carry the data columns
    val deleted = spark.sql(
      s"SELECT k FROM graft_changes('$root', 't', 'w0', $s1) WHERE _change_type = 'D'")
      .collect().map(_.getLong(0)).sorted
    assert(deleted.toSeq == (1L to 5L))
  }

  test("graft_tables lists the whole catalog with heads and file counts") {
    val (cat, root) = freshTable()
    (200L to 210L).map(k => (k, s"w$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$root/stage2")
    cat.createTable("u",
      CompactionRunner.listParquet(s"$root/stage2").map(DataFileTask(_, 1L)))
    cat.deleteWhere(spark, "u", col("k") === 200L, s"$root/out")
    val rows = spark.sql(
      s"""SELECT table_name, current_snapshot_id, data_files, delete_files
         |FROM graft_tables('$root') ORDER BY table_name""".stripMargin)
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("t", "u"))
    val u = rows(1)
    assert(u.getLong(1) == cat.currentSnapshotId("u"))
    assert(u.getLong(2) == 1L && u.getLong(3) >= 1L,
      s"u should show 1 data file + pending delete files, got $u")
    // rebuilt per scan: a table created AFTER the statement planned still
    // appears on re-execution of a NEW statement
    cat.createTable("v", Nil)
    assert(spark.sql(s"SELECT count(*) FROM graft_tables('$root')")
      .collect().head.getLong(0) == 3L)
  }

  test("non-literal and malformed arguments are rejected with named reasons") {
    val (_, root) = freshTable()
    val nonLit = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_table(concat('$root', ''), 't')").collect())
    assert(nonLit.getMessage.contains("literal"))
    val arity = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_table('$root')").collect())
    assert(arity.getMessage.contains("takes"))
    val badKind = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_meta('$root', 't', 'nope')").collect())
    assert(badKind.getMessage.nonEmpty)
  }
}
