package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The full production ingestion loop, composed end-to-end — each piece has
  * its own suite (StreamCatalogSinkSpec, CompactionSchedulerSpec,
  * MetadataTablesSpec); this proves they COMPOSE: a real Structured
  * Streaming query lands micro-batches as append snapshots
  * (`streamAppend`), the landed small files accrue metadata-scored debt,
  * a catalog-wide [[CompactionScheduler]] sweep picks the indebted table
  * worst-first and collapses it incrementally, and the metadata tables +
  * MoR scan agree with the pre-sweep state throughout. The loop a 100 TB
  * deployment runs forever: land → score → sweep → serve.
  */
case class LoopDoc(doc_id: Long, lang: String, n_chars: Long)

class ProductionLoopSpec extends SparkSpec {

  import spark.implicits._

  test("stream-land, debt-score, scheduler-sweep, metadata-serve compose") {
    val root = Files.createTempDirectory("graft-loop-cat").toString
    val out = Files.createTempDirectory("graft-loop-out").toString
    val cat = new GraftCatalog(root)
    // two tables: `docs` takes the stream, `idle` must ride the sweep
    // untouched (the mostly-healthy-catalog shape a sweep sees in prod)
    cat.createTable("docs", Nil)
    cat.createTable("idle", Nil)
    cat.appendFiles(spark, "idle",
      Seq(LoopDoc(1L, "en", 10L)).toDF(), s"$out/idle")
    val idleHead = cat.currentSnapshotId("idle")

    // 1. LAND: three AvailableNow drains of a real streaming query — one
    //    append snapshot + one small file generation per batch
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LoopDoc]
    val ckpt = Files.createTempDirectory("graft-loop-ckpt").toString
    (0 until 3).foreach { b =>
      input.addData((1L to 50L).map(k =>
        LoopDoc(b * 50L + k, if (k % 3 == 0) "de" else "en", k)))
      cat.streamAppend(input.toDF(), "docs", s"$out/docs", ckpt, "loop-ingest")
        .awaitTermination()
    }
    val preSweep = cat.scanTable(spark, "docs")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .collect().map(_.toSeq).toSet
    val filesBefore = cat.metadataTable(spark, "docs", "files").count()
    assert(filesBefore >= 3, "each drained batch must land its own file generation")

    // 2. SCORE: debt is visible from snapshot metadata alone
    assert(cat.compactionDebt("docs") >= 3)
    assert(cat.compactionDebt("idle") <= 1)

    // 3. SWEEP: the catalog-wide scheduler compacts the indebted table and
    //    leaves the healthy one alone
    val sched = new CompactionScheduler(cat, s"$out/sweeps",
      minAppendedFiles = 3, maxConcurrent = 2)
    // small-file collapse wants FEWER outputs than inputs; the config
    // default (4) targets parallel rewrite throughput, not collapse
    val sweepConfig = CompactionRunner.CompactionConfig(targetPartitions = 1)
    val outcomes = sched.sweep(spark, sweepConfig).map(o => o.table -> o.outcome).toMap
    assert(outcomes("docs") == "compacted", s"got $outcomes")
    assert(outcomes("idle") == "healthy", s"got $outcomes")
    assert(cat.currentSnapshotId("idle") == idleHead,
      "a healthy table must not gain snapshots from a sweep")

    // 4. SERVE: metadata shows the collapse; the data is untouched
    val filesAfter = cat.metadataTable(spark, "docs", "files").count()
    assert(filesAfter < filesBefore,
      s"sweep must collapse the $filesBefore streamed files, got $filesAfter")
    val postSweep = cat.scanTable(spark, "docs")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .collect().map(_.toSeq).toSet
    assert(postSweep == preSweep, "compaction must not change query results")
    // the snapshots metadata table records the whole history — creates,
    // three stream appends, one compaction
    val snaps = cat.metadataTable(spark, "docs", "snapshots").count()
    assert(snaps >= 5, s"expected create+3 appends+compaction, got $snaps")
    assert(cat.compactionDebt("docs") == 0, "debt settles after the sweep")

    // 5. LOOP: the next sweep over the now-healthy catalog is metadata-only
    val again = sched.sweep(spark, sweepConfig).map(o => o.table -> o.outcome).toMap
    assert(again.values.forall(_ == "healthy"), s"got $again")

    // 6. OBSERVE through the REST doorway: the facade's snapshot log shows
    //    the whole loop — the stream appends AND the sweep's replace commit
    //    with its summary — to a plain HTTP client with zero graft imports
    //    (how an ops dashboard actually watches this loop)
    val server = new graft.wire.RestCatalogServer(cat, port = 0)
    try {
      val conn = new java.net.URI(
        s"http://127.0.0.1:${server.boundPort}/v1/namespaces/default/tables/docs")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val in = conn.getInputStream
      val meta = new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      in.close()
      cat.snapshotIds("docs").foreach(id =>
        assert(meta.contains(s""""snapshot-id":$id"""), s"missing snap $id"))
      assert(meta.contains(s""""current-snapshot-id":${cat.currentSnapshotId("docs")}"""))
      // the appends and the compaction are distinguishable from the log
      assert(meta.contains("\"operation\":\"append\""), meta)
      assert(meta.contains("\"operation\":\"replace\""),
        s"sweep's compaction commit missing from the REST snapshot log: $meta")
    } finally server.close()
  }
}
