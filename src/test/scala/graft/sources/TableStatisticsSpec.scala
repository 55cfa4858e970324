package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The spec's `statistics` / `partition-statistics` metadata surface:
  * ANALYZE (one distributed NDV pass → Puffin theta blobs, estimate in
  * the standard `ndv` property), the partition-statistics parquet file,
  * export → import round-trip of the pointers by reference, and the
  * doorway's `estimateStatistics` serving the distinct counts.
  */
class TableStatisticsSpec extends SparkSpec {

  private def mount(root: String): String = {
    val g = s"gsts_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    g
  }

  test("compute_table_stats records NDV blobs a scan serves as column stats") {
    val root = Files.createTempDirectory("graft-stats").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.c (c_custkey BIGINT, c_mktsegment STRING)")
    spark.read.parquet(s"$sfDir/customer.parquet")
      .createOrReplaceTempView("gsts_src")
    spark.sql(s"INSERT INTO $g.c SELECT c_custkey, c_mktsegment FROM gsts_src")
    val rows = spark.sql(s"CALL $g.system.compute_table_stats('c')").collect()
    assert(rows.map(_.getString(0)).toSet == Set("c_custkey", "c_mktsegment"))
    val exactKeys = spark.sql("SELECT count(DISTINCT c_custkey) FROM gsts_src")
      .head().getLong(0)
    val cat = new GraftCatalog(root)
    val ndv = cat.columnNdv("c")
    // HLL++ default error is ~2.3%; 10% is a generous correctness bound
    assert(ndv.contains("c_custkey") &&
      math.abs(ndv("c_custkey") - exactKeys) <= exactKeys / 10,
      s"NDV ${ndv.get("c_custkey")} vs exact $exactKeys")
    assert(ndv.get("c_mktsegment").exists(n => n >= 4 && n <= 6)) // 5 segments
    // the stats file is real Puffin: footer lists one theta blob per
    // column, keyed by field id, with the standard `ndv` property
    val ref = cat.tableStatistics("c").get
    assert(ref.snapshotId == cat.currentSnapshotId("c"))
    val (blobs, _) = Puffin.readFooter(ref.path,
      new org.apache.hadoop.conf.Configuration())
    assert(blobs.forall(_.blobType == Puffin.ThetaBlobType))
    assert(blobs.flatMap(_.fields).sorted == Seq(1, 2))
    assert(blobs.forall(_.properties.get("ndv").exists(_.toLongOption.isDefined)))
    // byte-compat: the payloads are REAL compact theta sketches — the
    // STOCK DataSketches library heapifies them directly and its own
    // estimate matches the published ndv property (what a foreign
    // planner would compute from the blob)
    val raf = new java.io.RandomAccessFile(
      ref.path.stripPrefix("file://"), "r")
    try blobs.foreach { b =>
      val payload = new Array[Byte](b.length.toInt)
      raf.seek(b.offset)
      raf.readFully(payload)
      val sk = org.apache.datasketches.theta.Sketches.heapifySketch(
        org.apache.datasketches.memory.Memory.wrap(payload))
      assert(math.round(sk.getEstimate) ==
        b.properties("ndv").toLong,
        s"stock heapify must reproduce the published ndv for fields ${b.fields}")
      assert(sk.isOrdered, "the spec blob must be a compact ORDERED sketch")
    } finally raf.close()
    // the doorway's estimateStatistics serves the distinct counts
    val table = new graft.sources.dsv2.GraftV2Table(root, "c", asOf = None)
    val scan = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())).build()
    val stats = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    val cs = stats.columnStats()
    assert(!cs.isEmpty, "estimateStatistics must carry column stats")
    import scala.jdk.CollectionConverters._
    val byName = cs.asScala.map { case (k, v) =>
      k.fieldNames().mkString(".") -> v.distinctCount() }
    assert(byName.get("c_custkey").exists(o =>
      o.isPresent && o.getAsLong == ndv("c_custkey")))
  }

  test("partitioned ANALYZE writes the spec's partition-statistics file") {
    val root = Files.createTempDirectory("graft-pstats").toString
    val g = mount(root)
    spark.sql(
      s"""CREATE TABLE $g.o (o_orderkey BIGINT, o_orderpriority STRING)
         |PARTITIONED BY (o_orderpriority)""".stripMargin)
    spark.read.parquet(s"$sfDir/orders.parquet")
      .createOrReplaceTempView("gsts_osrc")
    spark.sql(s"INSERT INTO $g.o SELECT o_orderkey, o_orderpriority " +
      "FROM gsts_osrc")
    spark.sql(s"CALL $g.system.compute_table_stats('o')").collect()
    val cat = new GraftCatalog(root)
    val pref = cat.partitionStatistics("o").get
    val pstats = spark.read.parquet(pref.path)
    // the spec's column names, one row per partition tuple
    for (c <- Seq("partition", "spec_id", "data_record_count",
      "data_file_count", "total_data_file_size_in_bytes",
      "last_updated_snapshot_id"))
      assert(pstats.columns.contains(c), s"missing $c: ${pstats.columns.toSeq}")
    val nParts = spark.sql(
      "SELECT count(DISTINCT o_orderpriority) FROM gsts_osrc").head().getLong(0)
    assert(pstats.count() == nParts)
    val totalRecs = pstats.agg(sum("data_record_count")).head().getLong(0)
    assert(totalRecs == spark.table("gsts_osrc").count())
  }

  test("statistics pointers survive export -> import by reference") {
    val root = Files.createTempDirectory("graft-stats-exp").toString
    val g = mount(root)
    spark.sql(
      s"""CREATE TABLE $g.d (k BIGINT, seg STRING)
         |PARTITIONED BY (seg)""".stripMargin)
    spark.sql(s"INSERT INTO $g.d SELECT id, concat('s', id % 3) " +
      "FROM range(0, 300)")
    spark.sql(s"CALL $g.system.compute_table_stats('d')").collect()
    val cat = new GraftCatalog(root)
    val metaPath = IcebergMetadataJson.export(cat, root, "d")
    val doc = Files.readString(metaPath)
    assert(doc.contains("\"statistics\":["), doc.take(400))
    assert(doc.contains("\"partition-statistics\":["))
    assert(doc.contains(Puffin.ThetaBlobType))
    val rootB = Files.createTempDirectory("graft-stats-imp").toString
    val catB = new GraftCatalog(rootB)
    catB.importTable("d", metaPath.toString)
    // pointers adopted by reference: foreign paths, local snapshot ids
    val refB = catB.tableStatistics("d").get
    assert(refB.path == cat.tableStatistics("d").get.path,
      "the import must reference the foreign stats file, not copy it")
    assert(catB.columnNdv("d") == cat.columnNdv("d"))
    assert(catB.partitionStatistics("d").map(_.path) ==
      cat.partitionStatistics("d").map(_.path))
    // and the imported table's scan serves the foreign distinct counts
    val table = new graft.sources.dsv2.GraftV2Table(rootB, "d", asOf = None)
    val stats = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())).build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(!stats.columnStats().isEmpty)
    // size/rows still estimate from manifests — the imported dim remains
    // auto-broadcastable
    assert(stats.sizeInBytes().isPresent && stats.sizeInBytes().getAsLong > 0)
  }

  test("incremental ANALYZE sketches only the delta and unions exactly") {
    val root = Files.createTempDirectory("graft-stats-inc").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, seg STRING)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('s', id % 7) " +
      "FROM range(0, 300)")
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect()
    val cat = new GraftCatalog(root)
    val gen1 = cat.loadEntries("t").filter(_.kind == "data").map(_.path)
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('s', id % 7) " +
      "FROM range(300, 1300)")
    // THE delta proof: delete the FIRST generation's data files from disk
    // before the incremental pass — it must succeed anyway, because it
    // only scans the files added since the last statistics snapshot and
    // unions with the recorded sketches
    gen1.foreach(p => Files.delete(java.nio.file.Paths.get(
      p.stripPrefix("file://"))))
    val rows = spark.sql(
      s"CALL $g.system.compute_table_stats('t', mode => 'incremental')")
      .collect()
    assert(rows.map(_.getString(0)).toSet == Set("k", "seg"))
    val ndv = cat.columnNdv("t")
    // union of [0,300) and [300,1300) sketches ~= 1300 distinct keys
    assert(math.abs(ndv("k") - 1300) <= 130, s"union ndv = ${ndv("k")}")
    assert(ndv.get("seg").exists(n => n >= 6 && n <= 8)) // 7 segments
    // a FULL re-analyze now would fail (gen1 files are gone) — proving
    // the incremental pass really never touched them
    intercept[Exception](
      spark.sql(s"CALL $g.system.compute_table_stats('t')").collect())
  }

  test("expiry garbage-collects the expired snapshot's statistics files") {
    val root = Files.createTempDirectory("graft-stats-gc").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT)")
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(0, 50)")
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect()
    val cat = new GraftCatalog(root)
    val oldRef = cat.tableStatistics("t").get
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(50, 120)")
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect()
    cat.expireSnapshots("t", keepLast = 1)
    // the old pointer AND its catalog-local Puffin file are gone; the
    // current one survives and still serves
    assert(!Files.exists(java.nio.file.Paths.get(oldRef.path)),
      s"expired stats file must be collected: ${oldRef.path}")
    assert(cat.tableStatistics("t").exists(_.snapshotId ==
      cat.currentSnapshotId("t")))
    assert(cat.columnNdv("t").contains("k"))
  }

  test("re-analyze at an unchanged head writes a NEW generation, in-place never") {
    // Puffin footers cache process-wide BY PATH; another process on the
    // same root may hold the old footer's blob offsets. A re-ANALYZE must
    // therefore never rewrite a stats path in place — a stale reader must
    // fail cleanly (file gone), not decode garbage byte ranges.
    val root = Files.createTempDirectory("graft-stats-gen").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, seg STRING) PARTITIONED BY (seg)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('s', id % 3) FROM range(0, 200)")
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect()
    val cat = new GraftCatalog(root)
    val ref1 = cat.tableStatistics("t").get
    val pref1 = cat.partitionStatistics("t").get
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect() // same head
    val ref2 = cat.tableStatistics("t").get
    val pref2 = cat.partitionStatistics("t").get
    assert(ref2.snapshotId == ref1.snapshotId, "head unchanged")
    assert(ref2.path != ref1.path,
      s"re-analyze must write a new generation, got ${ref2.path}")
    assert(pref2.path != pref1.path)
    // superseded generations are swept after the pointer swap
    assert(!Files.exists(java.nio.file.Paths.get(ref1.path)), ref1.path)
    assert(!Files.exists(java.nio.file.Paths.get(pref1.path)), pref1.path)
    assert(cat.columnNdv("t").get("k").exists(n => math.abs(n - 200) <= 20))
  }

  test("an unusable prior degrades incremental ANALYZE to a full pass") {
    val root = Files.createTempDirectory("graft-stats-degrade").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT)")
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(0, 300)")
    val cat = new GraftCatalog(root)
    val head = cat.currentSnapshotId("t")
    val conf = new org.apache.hadoop.conf.Configuration()
    def forge(props: Map[String, String]): Unit = {
      // a spec-legal foreign stats file whose theta payload this engine
      // cannot use: garbage bytes, optionally marked zstd-compressed
      val fp = s"$root/t/foreign-${props.hashCode}.puffin"
      val (sz, fsz) = Puffin.writeBlobs(fp, Seq(Puffin.BlobSpec(
        Puffin.ThetaBlobType, Seq(1), head, head,
        Array.fill[Byte](64)(0x5A), props)), conf)
      cat.adoptStatistics("t", head, fp, sz, fsz, partition = false)
    }
    // variant 1: compressed blob — the codec guard must refuse it up front
    forge(Map("ndv" -> "999999", "compression-codec" -> "zstd"))
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(300, 400)")
    val r1 = spark.sql(
      s"CALL $g.system.compute_table_stats('t', mode => 'incremental')").collect()
    assert(r1.nonEmpty)
    assert(cat.columnNdv("t").get("k").exists(n => math.abs(n - 400) <= 40),
      s"full-pass NDV expected, got ${cat.columnNdv("t")}")
    // variant 2: uncompressed garbage — heapify/merge fails mid-union and
    // the pass must still degrade to full, not fail the ANALYZE
    val head2 = cat.currentSnapshotId("t")
    val fp2 = s"$root/t/foreign-garbage.puffin"
    val (sz2, fsz2) = Puffin.writeBlobs(fp2, Seq(Puffin.BlobSpec(
      Puffin.ThetaBlobType, Seq(1), head2, head2,
      Array.fill[Byte](64)(0x3C), Map("ndv" -> "999999"))), conf)
    cat.adoptStatistics("t", head2, fp2, sz2, fsz2, partition = false)
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(400, 500)")
    val r2 = spark.sql(
      s"CALL $g.system.compute_table_stats('t', mode => 'incremental')").collect()
    assert(r2.nonEmpty)
    assert(cat.columnNdv("t").get("k").exists(n => math.abs(n - 500) <= 50),
      s"full-pass NDV expected, got ${cat.columnNdv("t")}")
  }

  test("partition-statistics types the partition struct by transform result") {
    val root = Files.createTempDirectory("graft-pstats-typed").toString
    val g = mount(root)
    spark.sql(
      s"""CREATE TABLE $g.e (k BIGINT, d DATE, seg STRING)
         |PARTITIONED BY (bucket(4, k), days(d), seg)""".stripMargin)
    spark.sql(s"INSERT INTO $g.e SELECT id, date_add(date'2024-01-01', " +
      "CAST(id % 3 AS INT)), concat('s', id % 2) FROM range(0, 60)")
    spark.sql(s"CALL $g.system.compute_table_stats('e')").collect()
    val cat = new GraftCatalog(root)
    val pref = cat.partitionStatistics("e").get
    val pstats = spark.read.parquet(pref.path)
    import org.apache.spark.sql.types._
    val pstruct = pstats.schema("partition").dataType.asInstanceOf[StructType]
    val byTransform = cat.partitionSpec("e").map(f =>
      f.transform.takeWhile(_ != '[') -> pstruct(f.name).dataType).toMap
    // the spec's unified partition type: int for bucket, DATE for day,
    // the source type for identity
    assert(byTransform.get("bucket").contains(IntegerType), byTransform.toString)
    assert(byTransform.get("day").contains(DateType), byTransform.toString)
    assert(byTransform.get("identity").contains(StringType), byTransform.toString)
    // values decode as the typed slots and the rollup still sums right
    assert(pstats.agg(sum("data_record_count")).head().getLong(0) == 60L)
    val days = pstats.select("partition.*").collect()
      .map(r => r.get(pstruct.fieldIndex(
        cat.partitionSpec("e").find(_.transform.startsWith("day")).get.name)))
    assert(days.forall(_.isInstanceOf[java.sql.Date]), days.mkString(","))
  }

  test("lifecycle: delete -> compact -> scheduler re-analyze restores NDV") {
    val root = Files.createTempDirectory("graft-stats-life").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, seg STRING)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('s', id % 5) FROM range(0, 1000)")
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect()
    val cat = new GraftCatalog(root)
    assert(!cat.statsStale("t") && cat.analyzeDebt("t") == 0)
    val ndv0 = cat.columnNdv("t")("k")
    assert(math.abs(ndv0 - 1000) <= 100)
    // a delete-heavy commit: theta cannot subtract, so the sketches are
    // now stale-HIGH and only a full re-analyze repairs them
    spark.sql(s"DELETE FROM $g.t WHERE k >= 200")
    assert(cat.statsStale("t"), "rows removed must mark the stats stale")
    assert(cat.analyzeDebt("t") > 0)
    // stale stats still SERVE (Iceberg's convention — an estimate, never
    // a correctness input)
    assert(cat.columnNdv("t")("k") == ndv0)
    // compaction rewrites files — still stale, still served
    cat.compactTable(spark, "t", s"$root/t/_data/life-compacted")
    assert(cat.statsStale("t"))
    // the scheduler's statistics sweep: stale -> FULL re-analyze
    val sched = new CompactionScheduler(cat, s"$root/_sweep")
    val swept = sched.statsSweep(spark)
    assert(swept.exists(o => o.table == "t" && o.outcome == "re_analyzed"),
      swept.toString)
    assert(!cat.statsStale("t"))
    val ndv1 = cat.columnNdv("t")("k")
    assert(math.abs(ndv1 - 200) <= 20,
      s"re-analyze must drop the NDV to the surviving keys, got $ndv1")
    // appends alone: not stale — the cheap INCREMENTAL union refreshes
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('s', id % 5) " +
      "FROM range(1000, 1100)")
    assert(!cat.statsStale("t"), "appends alone must not mark stale")
    assert(cat.statsChurn("t").exists(_.addedDataFiles > 0))
    val swept2 = sched.statsSweep(spark, minAddedFiles = 1)
    assert(swept2.exists(o => o.table == "t" && o.outcome == "stats_refreshed"),
      swept2.toString)
    val ndv2 = cat.columnNdv("t")("k")
    assert(math.abs(ndv2 - 300) <= 30, s"incremental union expected ~300: $ndv2")
    // and a fresh table below the added-files threshold is left alone
    val swept3 = sched.statsSweep(spark, minAddedFiles = 1000)
    assert(swept3.exists(o => o.table == "t" && o.outcome == "stats_fresh"),
      swept3.toString)
    // never-analyzed tables are skipped entirely (statistics are opt-in)
    spark.sql(s"CREATE TABLE $g.virgin (k BIGINT)")
    spark.sql(s"INSERT INTO $g.virgin SELECT id FROM range(0, 10)")
    assert(!sched.statsSweep(spark).exists(_.table == "virgin"))
    // one-call maintenance: sweep(refreshStats = true) appends the
    // statistics pass to the compaction outcomes
    val all = sched.sweep(spark, refreshStats = true)
    assert(all.exists(o => o.table == "t" &&
      Set("stats_fresh", "stats_refreshed", "re_analyzed")(o.outcome)),
      all.toString)
  }

  test("REST statistics endpoint runs ANALYZE with mode and staleness") {
    val root = Files.createTempDirectory("graft-stats-rest").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT)")
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(0, 250)")
    val cat = new GraftCatalog(root)
    val server = new graft.wire.RestCatalogServer(cat)
    try {
      def post(path: String, body: String): (Int, String) = {
        val url = java.net.URI.create(
          s"http://127.0.0.1:${server.boundPort}$path").toURL
        val c = url.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod("POST")
        c.setDoOutput(true)
        c.getOutputStream.write(body.getBytes("UTF-8"))
        val code = c.getResponseCode
        val in = if (code < 400) c.getInputStream else c.getErrorStream
        val out = new String(in.readAllBytes(), "UTF-8")
        in.close()
        (code, out)
      }
      val (code, body) = post(
        "/v1/namespaces/default/tables/t/statistics", """{"mode":"full"}""")
      assert(code == 200, s"$code: $body")
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      val ndv = n.get("columns").get("k").asLong
      assert(math.abs(ndv - 250) <= 25, body)
      assert(!n.get("stale").asBoolean, body)
      assert(cat.tableStatistics("t").isDefined)
      // incremental mode unions with the recorded sketches
      spark.sql(s"INSERT INTO $g.t SELECT id FROM range(250, 400)")
      val (code2, body2) = post(
        "/v1/namespaces/default/tables/t/statistics",
        """{"mode":"incremental"}""")
      assert(code2 == 200, s"$code2: $body2")
      val n2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body2)
      assert(math.abs(n2.get("columns").get("k").asLong - 400) <= 40, body2)
      // contract errors: bad mode 400, unknown table 404
      assert(post("/v1/namespaces/default/tables/t/statistics",
        """{"mode":"sideways"}""")._1 == 400)
      assert(post("/v1/namespaces/default/tables/nope/statistics", "{}")._1 == 404)
    } finally server.close()
  }

  test("a rollback that removes delete files re-stales the stats (stale-LOW)") {
    // sketches are computed from the MoR scan (deletes applied); a
    // rollback that RETRACTS a delete file brings the suppressed rows
    // back, so the recorded NDVs are now stale-LOW — as re-analyze-worthy
    // as stale-high, and previously invisible to the churn diff
    val root = Files.createTempDirectory("graft-stats-rb").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(0, 100)")
    val cat = new GraftCatalog(root)
    val beforeDelete = cat.currentSnapshotId("t")
    spark.sql(s"DELETE FROM $g.t WHERE k % 7 = 3")
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect()
    assert(!cat.statsStale("t"))
    val ndvPostDelete = cat.columnNdv("t")("k")
    assert(ndvPostDelete < 100, s"sketch must exclude deleted rows: $ndvPostDelete")
    cat.rollbackTo("t", beforeDelete)
    assert(cat.statsStale("t"),
      "retracted delete files must mark the sketches stale")
    assert(cat.statsChurn("t").exists(_.removedDeleteFiles > 0))
    val swept = new CompactionScheduler(cat, s"$root/_sweep").statsSweep(spark)
    assert(swept.exists(o => o.table == "t" && o.outcome == "re_analyzed"))
    assert(cat.columnNdv("t").get("k").exists(n => math.abs(n - 100) <= 10))
  }

  test("the statistics metadata table reports pointers and staleness") {
    val root = Files.createTempDirectory("graft-stats-meta").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, seg STRING) PARTITIONED BY (seg)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('s', id % 2) FROM range(0, 100)")
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect()
    def rows() = spark.sql(s"SELECT type, is_current, stale FROM $g.t.statistics")
      .collect().map(r => (r.getString(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toSet
    assert(rows() == Set(("column", true, Some(false)),
      ("partition", true, Some(false))), rows().toString)
    // a delete stales BOTH live pointers (theta rule for the sketches,
    // any-entry-movement for the partition rollup)
    spark.sql(s"DELETE FROM $g.t WHERE k < 10")
    assert(rows() == Set(("column", true, Some(true)),
      ("partition", true, Some(true))), rows().toString)
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect()
    val all = spark.sql(s"SELECT is_current FROM $g.t.statistics WHERE " +
      "type = 'column'").collect().map(_.getBoolean(0)).toSeq
    assert(all.count(identity) == 1 && all.size == 2,
      s"old pointer retained, one live: $all")
  }

  test("re-analyze replaces the sketch; stale stats serve for later snapshots") {
    val root = Files.createTempDirectory("graft-stats-re").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT)")
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(0, 100)")
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect()
    val cat = new GraftCatalog(root)
    val ndv1 = cat.columnNdv("t")("k")
    assert(math.abs(ndv1 - 100) <= 10)
    // a later append: the OLD stats still serve (stale, Iceberg's rule)
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(100, 1000)")
    assert(cat.columnNdv("t")("k") == ndv1)
    // re-analyze at the new head replaces the estimate
    spark.sql(s"CALL $g.system.compute_table_stats('t')").collect()
    val ndv2 = cat.columnNdv("t")("k")
    assert(math.abs(ndv2 - 1000) <= 100, s"ndv2 = $ndv2")
    // time travel to the old head still serves the OLD sketch
    assert(cat.columnNdv("t", Some(2L)) == Map("k" -> ndv1))
  }
}
