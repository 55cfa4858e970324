package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** `readStream.format("graft")` — the catalog table as a stream: the
  * snapshot chain is the offset log, append snapshots stream exactly
  * once across runs of one checkpoint, and rewrite snapshots either fail
  * loudly (default) or skip under `skipRewrites`.
  */
class GraftStreamSourceSpec extends SparkSpec {

  import spark.implicits._

  // foreachBatch sink: the memory sink cannot RECOVER from a checkpoint,
  // and cross-run recovery is exactly what is under test
  private def drain(root: String, ckpt: String,
      buf: scala.collection.mutable.ListBuffer[Long],
      skipRewrites: Boolean = false): Unit = {
    var reader = spark.readStream.format("graft")
      .option("root", root).option("table", "t")
    if (skipRewrites) reader = reader.option("skipRewrites", "true")
    val q = reader.load().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        buf ++= b.select("k").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("initial load + incremental appends stream exactly once across runs") {
    val root = Files.createTempDirectory("graft-ss-cat").toString
    val out = Files.createTempDirectory("graft-ss-out").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", Nil)
    cat.appendFiles(spark, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), out)
    val ckpt = Files.createTempDirectory("graft-ss-ckpt").toString

    val got = scala.collection.mutable.ListBuffer[Long]()
    drain(root, ckpt, got)
    assert(got.sorted.toSeq == Seq(1L, 2L), "initial load must stream")

    // two more append commits land BETWEEN runs; only the delta streams
    cat.appendFiles(spark, "t", Seq((3L, "c")).toDF("k", "v"), out)
    cat.appendFiles(spark, "t", Seq((4L, "d")).toDF("k", "v"), out)
    drain(root, ckpt, got)
    assert(got.sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      "delta-only on the second run — no re-streamed rows")
  }

  test("a compaction snapshot fails the stream by default and skips under the option") {
    val root = Files.createTempDirectory("graft-ss-cat").toString
    val out = Files.createTempDirectory("graft-ss-out").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", Nil)
    cat.appendFiles(spark, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), out)
    val ckpt = Files.createTempDirectory("graft-ss-ckpt").toString
    val got = scala.collection.mutable.ListBuffer[Long]()
    drain(root, ckpt, got)
    assert(got.sorted.toSeq == Seq(1L, 2L))

    // a rewrite between runs: re-streaming its files would duplicate rows
    cat.compactTable(spark, "t", s"$out/c1")
    cat.appendFiles(spark, "t", Seq((5L, "e")).toDF("k", "v"), out)

    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(root, ckpt, got)
    }
    assert(e.getCause.getMessage.contains("skipRewrites"), e.getCause.getMessage)

    // fresh checkpoint with the option: rewrite skipped, appends stream,
    // nothing duplicated (the compacted files never re-emit)
    val ckpt2 = Files.createTempDirectory("graft-ss-ckpt2").toString
    val got2 = scala.collection.mutable.ListBuffer[Long]()
    drain(root, ckpt2, got2, skipRewrites = true)
    assert(got2.sorted.toSeq == Seq(1L, 2L, 5L),
      "initial snapshot + post-rewrite append, rewrite files skipped")
  }

  test("a checkpoint that fell behind snapshot expiry fails loudly, never re-emits") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val root = Files.createTempDirectory("graft-ss-lag").toString
    val out = Files.createTempDirectory("graft-ss-lag-out").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", Nil)
    cat.appendFiles(spark, "t", Seq((1L, "a")).toDF("k", "v"), out) // snap 2
    cat.appendFiles(spark, "t", Seq((2L, "b")).toDF("k", "v"), out) // snap 3
    cat.appendFiles(spark, "t", Seq((3L, "c")).toDF("k", "v"), out) // snap 4
    cat.expireSnapshots("t", keepLast = 1) // retained: {4}
    val src = new GraftStreamSource(spark.sqlContext, root, "t",
      skipRewrites = false)
    // a FRESH stream initial-loads the oldest retained snapshot — returns
    // a batch without throwing (row-level exactness is the e2e tests' job;
    // the streaming-tagged frame cannot be counted outside the engine)
    assert(src.getBatch(None, LongOffset(4L)).isStreaming)
    // a RESUMED stream whose offset predates the retention window must
    // fail loudly (the old behavior re-emitted the full table: silent
    // duplicates downstream). getBatch itself throws — before any plan
    val lag = intercept[Exception](
      src.getBatch(Some(LongOffset(2L)), LongOffset(4L)))
    assert(lag.getMessage.contains("fell behind"), lag.getMessage)
  }

  test("a FRESH stream over a tag-island retained set full-loads instead of throwing") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val root = Files.createTempDirectory("graft-ss-island").toString
    val out = Files.createTempDirectory("graft-ss-island-out").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", Nil)
    cat.appendFiles(spark, "t", Seq((1L, "a")).toDF("k", "v"), out) // snap 2
    cat.appendFiles(spark, "t", Seq((2L, "b")).toDF("k", "v"), out) // snap 3
    cat.appendFiles(spark, "t", Seq((3L, "c")).toDF("k", "v"), out) // snap 4
    cat.appendFiles(spark, "t", Seq((4L, "d")).toDF("k", "v"), out) // snap 5
    cat.tagSnapshot("t", "audited", 2L)
    cat.expireSnapshots("t", keepLast = 2)
    // tag-island retention: {2, 4, 5} — the chain 2→4 has a gap at 3
    assert(cat.snapshotIds("t").sorted == Seq(2L, 4L, 5L),
      s"fixture must be non-contiguous, got ${cat.snapshotIds("t").sorted}")
    // pre-fix this threw "diff base 3 has been expired … restart with a
    // fresh checkpoint" — advice that cannot succeed, because this IS a
    // fresh checkpoint. A fresh stream has emitted nothing, so it may
    // simply load the full table at the end offset.
    val src = new GraftStreamSource(spark.sqlContext, root, "t",
      skipRewrites = false)
    assert(src.getBatch(None, LongOffset(5L)).isStreaming)
    // e2e: the whole current table streams exactly once
    val got = scala.collection.mutable.ListBuffer[Long]()
    val ckpt = Files.createTempDirectory("graft-ss-island-ckpt").toString
    drain(root, ckpt, got)
    assert(got.sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      s"fresh stream must deliver the full current table, got ${got.sorted}")
    // a RESUMED stream across the same gap still fails loudly (its rows
    // before the gap were already consumed; a reload would duplicate)
    val lag = intercept[Exception](
      src.getBatch(Some(LongOffset(2L)), LongOffset(5L)))
    assert(lag.getMessage.contains("expired"), lag.getMessage)
  }

  test("a user-supplied readStream schema is rejected up front with the remedy") {
    val root = Files.createTempDirectory("graft-ss-schema").toString
    val out = Files.createTempDirectory("graft-ss-schema-out").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", Nil)
    cat.appendFiles(spark, "t", Seq((1L, "a")).toDF("k", "v"), out)
    val e = intercept[Exception](
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("other",
            org.apache.spark.sql.types.LongType))))
        .format("graft").option("root", root).option("table", "t")
        .load())
    assert(e.getMessage.contains("derives its schema"), e.getMessage)
  }
}
