package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ingestion into the catalog (`streamAppend` /
  * `appendStreamBatch`): one exactly-once append commit per micro-batch.
  * Under test: multi-batch landing equals the union of the batches, replays
  * skip without duplicating rows, a torn commit (crash between the stream
  * mark and the HEAD advance) rolls forward on the next batch, and empty
  * batches publish nothing.
  */
case class SinkRow(k: Long, g: String, v: String)

class StreamCatalogSinkSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalogWithRoot(): (GraftCatalog, String) = {
    val root = Files.createTempDirectory("graft-sink-cat").toString
    (new GraftCatalog(root), root)
  }

  test("multi-batch stream lands as one counted snapshot per batch") {
    val (cat, root) = newCatalogWithRoot()
    cat.createTable("t", Nil)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SinkRow]
    val out = Files.createTempDirectory("graft-sink-out").toString
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString

    val batches = Seq(
      (1L to 40L).map(k => SinkRow(k, s"g${k % 2}", s"v$k")),
      (41L to 90L).map(k => SinkRow(k, s"g${k % 2}", s"v$k")),
      (91L to 100L).map(k => SinkRow(k, s"g${k % 2}", s"v$k")))
    batches.foreach { b =>
      input.addData(b)
      val q = cat.streamAppend(input.toDF(), "t", out, ckpt, "ingest")
      q.awaitTermination()
    }

    assert(cat.scanTable(spark, "t").count() === 100L)
    assert(cat.scanTable(spark, "t").select(sum(col("k"))).head().getLong(0)
      === (1L to 100L).sum)
    // one commit per non-empty batch on top of the empty create
    assert(cat.snapshotIds("t").length === 1 + batches.length)
    // appended generations are counted — metadata agrees with data
    val files = cat.metadataTable(spark, "t", "files").collect()
    assert(files.forall(r => !r.isNullAt(r.fieldIndex("record_count"))))
    assert(files.map(_.getAs[Long]("record_count")).sum === 100L)
  }

  test("replayed batch id skips: no duplicate rows, no new snapshot") {
    val (cat, root) = newCatalogWithRoot()
    cat.createTable("t", Nil)
    val out = Files.createTempDirectory("graft-sink-out2").toString
    val df = Seq(SinkRow(1, "a", "x"), SinkRow(2, "b", "y")).toDF()

    assert(cat.appendStreamBatch(spark, "t", df, out, "q", 0L).isDefined)
    val head = cat.currentSnapshotId("t")
    // at-least-once replay of the same batch
    assert(cat.appendStreamBatch(spark, "t", df, out, "q", 0L).isEmpty)
    assert(cat.currentSnapshotId("t") === head)
    assert(cat.scanTable(spark, "t").count() === 2L)
    // a DIFFERENT query id is an independent stream — it commits
    assert(cat.appendStreamBatch(spark, "t", df, out, "q2", 0L).isDefined)
    assert(cat.scanTable(spark, "t").count() === 4L)
  }

  test("torn commit (mark written, HEAD not advanced) rolls forward") {
    val (cat, root) = newCatalogWithRoot()
    cat.createTable("t", Nil)
    val out = Files.createTempDirectory("graft-sink-out3").toString
    cat.appendStreamBatch(spark, "t",
      Seq(SinkRow(1, "a", "x")).toDF(), out, "q", 0L)
    val head = cat.currentSnapshotId("t")

    // hand-craft the crash window: snapshot document installed for batch 1
    // and the mark written, but HEAD never advanced
    val tdir = Paths.get(root, "t")
    Files.copy(tdir.resolve(s"snap-$head.tsv"),
      tdir.resolve(s"snap-${head + 1}.tsv"))
    Files.writeString(tdir.resolve("stream-marks.tsv"), s"q\t1\t${head + 1}")
    assert(cat.currentSnapshotId("t") === head, "HEAD must still lag")

    // replay of the torn batch: completes the commit, then skips
    assert(cat.appendStreamBatch(spark, "t",
      Seq(SinkRow(1, "a", "x")).toDF(), out, "q", 1L).isEmpty)
    assert(cat.currentSnapshotId("t") === head + 1,
      "torn commit must roll forward")
    // and the stream continues on top of the completed chain
    assert(cat.appendStreamBatch(spark, "t",
      Seq(SinkRow(2, "b", "y")).toDF(), out, "q", 2L).contains(head + 2))
  }

  test("torn stream commit does not wedge other commit paths") {
    val (cat, root) = newCatalogWithRoot()
    cat.createTable("t", Nil)
    val out = Files.createTempDirectory("graft-sink-wedge").toString
    cat.appendStreamBatch(spark, "t",
      Seq(SinkRow(1, "a", "x")).toDF(), out, "q", 0L)
    val head = cat.currentSnapshotId("t")

    // crash window: batch 1's document + mark installed, HEAD lagging —
    // the reserved snap-(head+1) would collide with ANY next commit
    val tdir = Paths.get(root, "t")
    Files.copy(tdir.resolve(s"snap-$head.tsv"),
      tdir.resolve(s"snap-${head + 1}.tsv"))
    Files.writeString(tdir.resolve("stream-marks.tsv"), s"q\t1\t${head + 1}")

    // a NON-stream commit must roll the torn commit forward, not conflict
    val id = cat.appendFiles(spark, "t",
      Seq(SinkRow(2, "b", "y")).toDF(), out)
    assert(id === head + 2, "append must land on top of the completed chain")
    assert(cat.scanTable(spark, "t").count() === 2L)
    // the torn batch stays durable: its replay skips
    assert(cat.appendStreamBatch(spark, "t",
      Seq(SinkRow(1, "a", "x")).toDF(), out, "q", 1L).isEmpty)
  }

  test("appendFiles: counted append commit, zero-row no-op") {
    val (cat, _) = newCatalogWithRoot()
    cat.createTable("t", Nil)
    val out = Files.createTempDirectory("graft-sink-app").toString
    val id = cat.appendFiles(spark, "t",
      (1L to 50L).map(k => SinkRow(k, s"g${k % 2}", s"v$k")).toDF(), out)
    assert(id === cat.currentSnapshotId("t"))
    assert(cat.scanTable(spark, "t").count() === 50L)
    val files = cat.metadataTable(spark, "t", "files").collect()
    assert(files.map(_.getAs[Long]("record_count")).sum === 50L)
    // zero rows: no commit
    assert(cat.appendFiles(spark, "t", Seq.empty[SinkRow].toDF(), out) === id)
    assert(cat.snapshotIds("t").length === 2)
  }

  test("streamed ingestion accrues debt the auto-compaction sweeps") {
    val (cat, _) = newCatalogWithRoot()
    cat.createTable("t", Nil)
    val out = Files.createTempDirectory("graft-sink-loop").toString
    (0 to 2).foreach { b =>
      val rows = (b * 100L + 1 to b * 100L + 100)
        .map(k => SinkRow(k, s"g${k % 2}", s"v$k"))
      cat.appendStreamBatch(spark, "t", rows.toDF(), out, "q", b.toLong)
    }
    val before = cat.scanTable(spark, "t")
      .select(count(lit(1)), sum(col("k"))).head()
    val nFilesBefore = cat.loadTable("t").size
    assert(cat.compactionDebt("t") >= 3, "each batch must add debt")

    // below threshold: a pure metadata check, no commit
    assert(cat.maybeCompactTable(spark, "t", s"$out/c0",
      minAppendedFiles = 100).isEmpty)
    // at threshold: the sweep rewrites the streamed small files
    val swept = cat.maybeCompactTable(spark, "t", s"$out/c1",
      minAppendedFiles = 3)
    assert(swept.isDefined, "debt at threshold must trigger")
    assert(cat.loadTable("t").size < nFilesBefore,
      s"sweep must collapse the ${nFilesBefore} streamed files")
    val after = cat.scanTable(spark, "t")
      .select(count(lit(1)), sum(col("k"))).head()
    assert(after === before, "compaction must not change results")
    assert(cat.compactionDebt("t") === 0, "debt settles after the sweep")
  }

  test("empty batch publishes nothing") {
    val (cat, _) = newCatalogWithRoot()
    cat.createTable("t", Nil)
    val out = Files.createTempDirectory("graft-sink-out4").toString
    val empty = Seq.empty[SinkRow].toDF()
    val head = cat.currentSnapshotId("t")
    assert(cat.appendStreamBatch(spark, "t", empty, out, "q", 0L).isEmpty)
    assert(cat.currentSnapshotId("t") === head)
    assert(cat.snapshotIds("t").length === 1)
  }

  test("writeStream.format(graft): zero-import streaming ingestion, exactly-once") {
    val (cat, root) = newCatalogWithRoot()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SinkRow]
    val ckpt = Files.createTempDirectory("graft-sinkfmt-ckpt").toString
    def drain(): Unit = {
      val q = input.toDF().writeStream.format("graft")
        .option("root", root).option("table", "fmt")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    input.addData(SinkRow(1L, "a", "x"), SinkRow(2L, "a", "y"))
    drain() // first batch creates the table from the stream's schema
    assert(cat.tables().contains("fmt"))
    assert(cat.currentSchema("fmt").exists(s =>
      s.fields.forall(FieldIds.idOf(_).isDefined)))
    assert(cat.scanTable(spark, "fmt").count() == 2L)
    val snapAfterFirst = cat.currentSnapshotId("fmt")

    input.addData(SinkRow(3L, "b", "z"))
    drain() // second batch: one more exactly-once commit
    assert(cat.scanTable(spark, "fmt").count() == 3L)
    assert(cat.currentSnapshotId("fmt") == snapAfterFirst + 1)
    // manifest counts ride the streaming commit like any append
    assert(cat.loadEntries("fmt").filter(_.kind == "data")
      .forall(e => e.recordCount > 0 && e.sizeBytes > 0))

    // a fresh run over the SAME checkpoint replays nothing (no new data)
    drain()
    assert(cat.scanTable(spark, "fmt").count() == 3L)
    assert(cat.currentSnapshotId("fmt") == snapAfterFirst + 1)
  }
}
