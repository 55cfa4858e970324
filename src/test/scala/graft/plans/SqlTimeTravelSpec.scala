package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.sources.{CompactionRunner, GraftCatalog}
import graft.sources.CompactionRunner.DataFileTask

/** SQL time travel ([[GraftSqlTimeTravel]]): `VERSION AS OF` (snapshot id
  * or tag) and `TIMESTAMP AS OF` against graft temp views and
  * `CREATE TABLE … USING graft` catalog tables.
  */
class SqlTimeTravelSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): (GraftCatalog, String) = {
    val root = Files.createTempDirectory("graft-ttravel").toString
    val cat = new GraftCatalog(root)
    (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$root/stage")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$root/stage").map(DataFileTask(_, 1L)))
    (cat, root)
  }

  test("VERSION AS OF snapshot id and tag on a temp view") {
    val (cat, root) = freshTable()
    val head0 = cat.currentSnapshotId("t")
    cat.tagSnapshot("t", "pre_delete", head0)
    cat.deleteWhere(spark, "t", col("k") <= 40, s"$root/out")
    spark.read.format("graft").option("root", root).option("table", "t")
      .load().createOrReplaceTempView("ttravel_v")

    def n(sql: String): Long = spark.sql(sql).collect().head.getLong(0)
    assert(n("SELECT count(*) FROM ttravel_v") == 60)
    assert(n(s"SELECT count(*) FROM ttravel_v VERSION AS OF $head0") == 100)
    assert(n("SELECT count(*) FROM ttravel_v VERSION AS OF 'pre_delete'") == 100)
  }

  test("TIMESTAMP AS OF resolves to the latest snapshot at that instant") {
    val (cat, root) = freshTable()
    val head0 = cat.currentSnapshotId("t")
    val t0 = cat.snapshotTimestampMs("t", head0)
    Thread.sleep(1100) // snapshot mtimes have second-ish granularity on some FS
    cat.deleteWhere(spark, "t", col("k") <= 40, s"$root/out")
    spark.read.format("graft").option("root", root).option("table", "t")
      .load().createOrReplaceTempView("ttravel_ts")

    val iso = java.time.Instant.ofEpochMilli(t0).toString.replace("T", " ").replace("Z", "")
    val was = spark.sql(
      s"SELECT count(*) FROM ttravel_ts TIMESTAMP AS OF '$iso'")
      .collect().head.getLong(0)
    assert(was == 100, s"at $iso expected the pre-delete state")
    // far future → the current state
    val now = spark.sql(
      "SELECT count(*) FROM ttravel_ts TIMESTAMP AS OF '2999-01-01 00:00:00'")
      .collect().head.getLong(0)
    assert(now == 60)
    // before the first commit → a named error, not silent emptiness
    val early = intercept[Exception](spark.sql(
      "SELECT count(*) FROM ttravel_ts TIMESTAMP AS OF '1999-01-01 00:00:00'").collect())
    assert(early.getMessage.contains("no snapshot"))
  }

  test("VERSION AS OF works on a CREATE TABLE USING graft catalog table") {
    val (cat, root) = freshTable()
    val head0 = cat.currentSnapshotId("t")
    cat.deleteWhere(spark, "t", col("k") > 90, s"$root/out")
    spark.sql("DROP TABLE IF EXISTS ttravel_cat")
    spark.sql(
      s"CREATE TABLE ttravel_cat USING graft OPTIONS (root '$root', `table` 't')")
    def n(sql: String): Long = spark.sql(sql).collect().head.getLong(0)
    assert(n("SELECT count(*) FROM ttravel_cat") == 90)
    assert(n(s"SELECT count(*) FROM ttravel_cat VERSION AS OF $head0") == 100)
    spark.sql("DROP TABLE ttravel_cat")
  }

  test("non-graft targets keep Spark's own time-travel error") {
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("ttravel_plain")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM ttravel_plain VERSION AS OF 1").collect())
    assert(e.getMessage.contains("TIME_TRAVEL") || e.getMessage.contains("time travel"))
  }
}
