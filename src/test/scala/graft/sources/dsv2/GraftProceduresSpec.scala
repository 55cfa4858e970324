package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{CompactionRunner, GraftCatalog}
import graft.sources.CompactionRunner.DataFileTask
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** `CALL graft.system.<procedure>(...)` — Iceberg's actual maintenance
  * spelling, through Spark 4's native ProcedureCatalog (no extensions):
  * compaction, expiry, rollback (id + tag), orphan removal, pos-delete
  * compaction, eq→pos conversion, positional AND named arguments.
  */
class GraftProceduresSpec extends SparkSpec {

  import spark.implicits._

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

  test("maintenance lifecycle through CALL: compact, expire, rollback, eq-rewrite") {
    val root = Files.createTempDirectory("graft-proc").toString
    withCatalogSession(root) { s =>
      val cat = new GraftCatalog(root)
      (10L until 30L).map(k => (k, s"v$k")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/_stage")
      cat.createTable("t",
        CompactionRunner.listParquet(s"$root/_stage").map(DataFileTask(_, 1L)))
      cat.appendFiles(s, "t",
        (30L until 40L).map(k => (k, s"v$k")).toDF("k", "v"), s"$root/_stage2")
      cat.deleteWhere(s, "t", col("k") % 2 === 0, s"$root/_del")
      def keys(): Seq[Long] = cat.scanTable(s, "t").select("k")
        .collect().map(_.getLong(0)).sorted.toSeq
      val expect = keys()

      // pos-delete compaction first (named args), then FULL compaction
      s.sql("CALL graft.system.rewrite_position_delete_files(table => 't')")
      assert(cat.scanTable(s, "t").count() == expect.size)
      val row = s.sql("CALL graft.system.rewrite_data_files('t', 'full')")
        .collect().head
      assert(row.schema.fieldNames.contains("snapshot_id"))
      assert(cat.loadEntries("t").count(_.kind != "data") == 0,
        "full compaction retires pending deletes")
      assert(keys() == expect)

      // tag + rollback by tag, then by id
      val head = cat.currentSnapshotId("t")
      cat.tagSnapshot("t", "stable", head)
      cat.appendFiles(s, "t", Seq((99L, "x")).toDF("k", "v"), s"$root/_stage3")
      s.sql("CALL graft.system.rollback_to_tag('t', 'stable')")
      assert(cat.scanTable(s, "t").count() == expect.size)
      s.sql(s"CALL graft.system.rollback_to_snapshot('t', $head)")
      assert(cat.scanTable(s, "t").count() == expect.size)

      // expiry keeps the newest 1 (+ the tagged snapshot)
      val expired = s.sql("CALL graft.system.expire_snapshots('t', 1)")
        .collect().map(_.getLong(0)).toSet
      assert(expired.nonEmpty)
      assert(cat.snapshotIds("t").contains(head), "tagged snapshot survives")

      // eq-delete debt, converted through CALL
      cat.deleteWhereEq(s, "t", Seq(11L, 13L).toDF("k"), s"$root/_eqd")
      val conv = s.sql("CALL graft.system.rewrite_equality_deletes(table => 't')")
        .collect().head
      assert(conv.getLong(1) == 1L, s"one eq file retired: $conv")
      assert(cat.loadEntries("t").count(_.kind == "eqdel") == 0)
      assert(!keys().contains(11L))

      // ...and straight to deletion vectors in one commit
      cat.deleteWhereEq(s, "t", Seq(17L, 19L).toDF("k"), s"$root/_eqd2")
      s.sql("CALL graft.system.rewrite_equality_deletes(table => 't', " +
        "as_deletion_vectors => true)").collect()
      assert(cat.loadEntries("t").count(_.kind == "eqdel") == 0)
      val dv = cat.loadEntries("t").filter(_.kind == "posdel")
      assert(dv.exists(_.format == "dv"),
        s"eq->DV CALL must land deletion vectors: $dv")
      assert(!keys().contains(17L) && !keys().contains(19L))
    }
  }

  test("orphan removal via CALL honors the grace window") {
    val root = Files.createTempDirectory("graft-proc-orph").toString
    withCatalogSession(root) { s =>
      val cat = new GraftCatalog(root)
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/_stage")
      cat.createTable("t",
        CompactionRunner.listParquet(s"$root/_stage").map(DataFileTask(_, 1L)))
      s.sql("CALL graft.system.rewrite_data_files('t', 'full')")
      def local(p: String) = p.stripPrefix("file:")
      val gen1 = cat.loadTable("t").map(e => local(e.path))
      s.sql("CALL graft.system.rewrite_data_files('t', 'full')")
      s.sql("CALL graft.system.expire_snapshots('t', 1)")
      // inside the default grace nothing qualifies
      assert(s.sql("CALL graft.system.remove_orphan_files('t')").collect().isEmpty)
      gen1.foreach(p =>
        new java.io.File(p).setLastModified(System.currentTimeMillis() - 120000))
      val removed = s.sql(
        "CALL graft.system.remove_orphan_files('t', older_than_seconds => 60)")
        .collect().map(r => local(r.getString(0))).toSet
      assert(removed == gen1.toSet, s"expected $gen1, got $removed")
      assert(cat.scanTable(s, "t").count() == 10)
    }
  }

  test("import_table through CALL registers a foreign chain and MoR-reads it") {
    val rootA = Files.createTempDirectory("graft-proc-impa").toString
    val rootB = Files.createTempDirectory("graft-proc-impb").toString
    // source table with a pending MoR delete, exported
    val catA = new GraftCatalog(rootA)
    (0L until 200L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$rootA/_stage")
    catA.createTable("src",
      CompactionRunner.listParquet(s"$rootA/_stage").map(DataFileTask(_, 1L)))
    catA.deleteWhere(spark, "src", col("k") % 10 === 3, s"$rootA/_del")
    val metaPath = graft.sources.IcebergMetadataJson.export(catA, rootA, "src")
    withCatalogSession(rootB) { s =>
      val rows = s.sql(
        s"CALL graft.system.import_table('t', '${metaPath}')").collect()
      assert(rows.length == 1 && rows.head.getLong(0) >= 1L)
      // the imported table serves through the SAME doorway, deletes applied
      assert(s.sql("SELECT count(*) FROM graft.t").head().getLong(0) == 180L)
      assert(s.sql("SELECT count(*) FROM graft.t WHERE k % 10 = 3")
        .head().getLong(0) == 0L)
      // re-import over an existing name is refused with a named error
      val e = intercept[Exception](
        s.sql(s"CALL graft.system.import_table('t', '${metaPath}')").collect())
      assert(e.getMessage.contains("already exists"), e.getMessage)
      // history_depth caps the imported lineage (head + nearest ancestors)
      s.sql(s"CALL graft.system.import_table('t2', '${metaPath}', " +
        "history_depth => 1)").collect()
      val catB2 = new GraftCatalog(
        s.conf.get("spark.sql.catalog.graft.root"))
      assert(catB2.snapshotIds("t2") == Seq(1L))
      assert(s.sql("SELECT count(*) FROM graft.t2").head().getLong(0) == 180L)
    }
  }

  test("errors are named: unknown procedure, bad namespace, missing table, bad args") {
    val root = Files.createTempDirectory("graft-proc-err").toString
    withCatalogSession(root) { s =>
      // Spark wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE; the
      // named cause (unknown procedure / wrong namespace) rides the chain
      def chain(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      val unknown = intercept[Exception](
        s.sql("CALL graft.system.vacuum('t')"))
      assert(chain(unknown).contains("unknown procedure") ||
        chain(unknown).contains("Failed to load routine"), chain(unknown))
      val badNs = intercept[Exception](
        s.sql("CALL graft.other.expire_snapshots('t', 1)"))
      assert(chain(badNs).contains("system") ||
        chain(badNs).contains("Failed to load routine"), chain(badNs))
      val noTable = intercept[Exception](
        s.sql("CALL graft.system.expire_snapshots('missing', 1)"))
      assert(noTable.getMessage.contains("does not exist"), noTable.getMessage)
      val cat = new GraftCatalog(root)
      cat.createTable("t", Nil)
      val badKeep = intercept[Exception](
        s.sql("CALL graft.system.expire_snapshots('t', 0)"))
      assert(badKeep.getMessage.contains("keep_last"), badKeep.getMessage)
      val badMode = intercept[Exception](
        s.sql("CALL graft.system.rewrite_data_files('t', 'both')"))
      assert(badMode.getMessage.contains("mode must be"), badMode.getMessage)
    }
  }
}
