package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.{CompactionConfig, DataFileTask}
import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The `graft` Spark data source: catalog tables readable via
  * `spark.read.format("graft")` and plain SQL, with pushed filters
  * projected onto the catalog's metadata pruning.
  */
class GraftDataSourceSpec extends SparkSpec {

  import spark.implicits._

  private def makeCatalog(): String = {
    val root = Files.createTempDirectory("graft-ds-cat").toString
    val base = Files.createTempDirectory("graft-ds-base").toString
    (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/b0")
    val cat = new GraftCatalog(root)
    cat.createTable("t",
      CompactionRunner.listParquet(s"$base/b0").map(DataFileTask(_, 1L)))
    cat.compactTable(spark, "t",
      s"${Files.createTempDirectory("graft-ds-out")}",
      CompactionConfig(targetPartitions = 8, clusterBy = Seq("k"),
        statsCols = Seq("k")))
    root
  }

  test("format(graft) reads the MoR state; deletes apply") {
    val root = makeCatalog()
    val cat = new GraftCatalog(root)
    cat.deleteWhere(spark, "t", col("k") <= 10,
      Files.createTempDirectory("graft-ds-d").toString)
    val df = spark.read.format("graft")
      .option("root", root).option("table", "t").load()
    assert(df.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(df.select("k").as[Long].collect().toSet == (11L to 400L).toSet)
  }

  test("snapshot/tag options pin the scan to a retained version") {
    val root = makeCatalog()
    val cat = new GraftCatalog(root)
    val v1 = cat.currentSnapshotId("t")
    cat.tagSnapshot("t", "audited", v1)
    cat.deleteWhere(spark, "t", col("k") <= 100,
      Files.createTempDirectory("graft-ds-tt").toString)

    def read(opts: (String, String)*) = {
      val r = spark.read.format("graft").option("root", root).option("table", "t")
      opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
    }
    // unpinned: the delete applies; pinned (id or tag): the pre-delete MoR
    // state, deletes OF THAT SNAPSHOT only
    assert(read().count() === 300L)
    assert(read("snapshot" -> v1.toString).select("k").as[Long]
      .collect().toSet === (1L to 400L).toSet)
    assert(read("tag" -> "audited").count() === 400L)
    // a pinned view stays pinned across later commits, filters still exact
    val pinned = read("snapshot" -> v1.toString)
    pinned.createOrReplaceTempView("t_v1")
    cat.deleteWhere(spark, "t", col("k") > 390,
      Files.createTempDirectory("graft-ds-tt2").toString)
    assert(spark.sql("SELECT count(*) FROM t_v1 WHERE k <= 50").head().getLong(0)
      === 50L)
    intercept[IllegalArgumentException] {
      read("snapshot" -> v1.toString, "tag" -> "audited")
    }
  }

  test("metadata option serves the inspection tables through the format") {
    val root = makeCatalog()
    def meta(kind: String) = spark.read.format("graft")
      .option("root", root).option("table", "t").option("metadata", kind).load()

    // files: counted compaction outputs, totals equal the data
    val files = meta("files")
    assert(files.schema.fieldNames.contains("record_count"))
    assert(files.select(org.apache.spark.sql.functions.sum(col("record_count")))
      .head().getLong(0) === 400L)

    // SQL over a metadata temp view — the vanilla inspection query
    meta("snapshots").createOrReplaceTempView("t_snapshots")
    val cur = spark.sql(
      "SELECT snapshot_id FROM t_snapshots WHERE is_current").collect()
    assert(cur.length === 1)
    assert(cur.head.getLong(0) === new GraftCatalog(root).currentSnapshotId("t"))

    // the view reflects commits made AFTER view creation (rebuilt per scan)
    new GraftCatalog(root).deleteWhere(spark, "t", col("k") <= 10,
      Files.createTempDirectory("graft-ds-md").toString)
    assert(spark.sql("SELECT count(*) FROM t_snapshots").head().getLong(0) ===
      new GraftCatalog(root).snapshotIds("t").length.toLong)
  }

  test("SQL over a temp view, filters and projection exact") {
    val root = makeCatalog()
    spark.read.format("graft").option("root", root).option("table", "t")
      .load().createOrReplaceTempView("graft_t")
    val got = spark.sql(
      "SELECT v FROM graft_t WHERE k BETWEEN 90 AND 92 ORDER BY k")
      .as[String].collect().toSeq
    assert(got == Seq("v90", "v91", "v92"))
  }

  test("bestRange folds pushed filters to the tightest numeric range") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    // BETWEEN-shaped pair beats a single bound; strings never qualify
    val r = GraftRelation.bestRange(Array(
      GreaterThanOrEqual("k", 90L), LessThanOrEqual("k", 110L),
      EqualTo("v", "x")), schema)
    assert(r.contains(("k", 90.0, 110.0)))
    // equality is a point range; strict bounds relax to closed
    assert(GraftRelation.bestRange(Array(EqualTo("k", 7L)), schema)
      .contains(("k", 7.0, 7.0)))
    assert(GraftRelation.bestRange(Array(GreaterThan("k", 5L)), schema)
      .contains(("k", 5.0, Double.MaxValue)))
    // contradictory bounds or no numeric filters -> no range
    assert(GraftRelation.bestRange(Array(
      GreaterThanOrEqual("k", 10L), LessThanOrEqual("k", 5L)), schema).isEmpty)
    assert(GraftRelation.bestRange(Array(EqualTo("v", "x")), schema).isEmpty)
  }

  test("narrow SQL filter answers from a pruned file subset") {
    val root = makeCatalog()
    val cat = new GraftCatalog(root)
    // the catalog-side pruned scan reads fewer files than the table holds
    // (clustered bounds persisted by makeCatalog's compaction)...
    val pruned = cat.scanTableWhere(spark, "t", "k", 90, 110)
    assert(pruned.inputFiles.length < cat.loadTable("t").size)
    // ...and the data source's answer equals it row-for-row
    val viaDs = spark.read.format("graft")
      .option("root", root).option("table", "t").load()
      .filter(col("k") >= 90 && col("k") <= 110)
    assert(viaDs.select("k").as[Long].collect().sorted.toSeq ==
      pruned.select("k").as[Long].collect().sorted.toSeq)
  }

  test("write.format(graft): append creates + appends; overwrite is one atomic replace") {
    val root = Files.createTempDirectory("graft-ds-w").toString
    def write(rows: Seq[(Long, String)], mode: String): Unit =
      rows.toDF("k", "v").write.format("graft")
        .option("root", root).option("table", "w").mode(mode).save()
    def read() = spark.read.format("graft")
      .option("root", root).option("table", "w").load()

    // append on a missing table creates it with an id-stamped schema
    write(Seq((1L, "a"), (2L, "b")), "append")
    val cat = new GraftCatalog(root)
    assert(cat.tables().contains("w"))
    assert(cat.currentSchema("w").exists(s =>
      s.fields.forall(FieldIds.idOf(_).isDefined)))
    assert(read().count() == 2L)

    // append again: both generations visible
    write(Seq((3L, "c")), "append")
    assert(read().select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // counted manifest metadata rides the commit
    assert(cat.loadEntries("w").filter(_.kind == "data")
      .forall(e => e.recordCount > 0 && e.sizeBytes > 0))

    // overwrite replaces contents in ONE commit (snapshot id advances once)
    val before = cat.currentSnapshotId("w")
    write(Seq((9L, "z")), "overwrite")
    assert(cat.currentSnapshotId("w") == before + 1,
      "overwrite must be a single commit")
    assert(read().select("k").as[Long].collect().toSeq == Seq(9L))
    // history intact: time travel to the pre-overwrite snapshot still serves
    assert(cat.scanTableAt(spark, "w", before).count() == 3L)

    // errorIfExists and ignore follow the standard semantics
    intercept[IllegalArgumentException](write(Seq((0L, "x")), "errorifexists"))
    write(Seq((0L, "x")), "ignore")
    assert(read().count() == 1L, "ignore must be a no-op on an existing table")
  }

  test("plain-SQL INSERT INTO / INSERT OVERWRITE through a temp view") {
    val root = Files.createTempDirectory("graft-ds-ins").toString
    Seq((1L, "a")).toDF("k", "v").write.format("graft")
      .option("root", root).option("table", "s").mode("append").save()
    spark.read.format("graft").option("root", root).option("table", "s")
      .load().createOrReplaceTempView("sql_ins")
    try {
      spark.sql("INSERT INTO sql_ins VALUES (2, 'b'), (3, 'c')")
      val cat = new GraftCatalog(root)
      assert(cat.scanTable(spark, "s").count() == 3L)
      val before = cat.currentSnapshotId("s")
      spark.sql("INSERT OVERWRITE sql_ins VALUES (9, 'z')")
      assert(cat.currentSnapshotId("s") == before + 1,
        "INSERT OVERWRITE must be one commit")
      assert(cat.scanTable(spark, "s").select("k").as[Long].collect().toSeq
        == Seq(9L))
      // snapshot-pinned views refuse writes
      spark.read.format("graft").option("root", root).option("table", "s")
        .option("snapshot", before.toString).load()
        .createOrReplaceTempView("sql_pin")
      val e = intercept[Exception](
        spark.sql("INSERT INTO sql_pin VALUES (0, 'x')"))
      assert(e.getMessage != null)
      assert(cat.scanTable(spark, "s").count() == 1L, "pinned insert must not land")
    } finally {
      spark.catalog.dropTempView("sql_ins")
      spark.catalog.dropTempView("sql_pin")
    }
  }
}
