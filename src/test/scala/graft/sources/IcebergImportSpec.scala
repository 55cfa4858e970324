package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileStats
import org.apache.spark.sql.types._

/** The Iceberg metadata IMPORT path — the upstream half the reference gets
  * from `iceberg-rust` (`core/src/compaction/mod.rs:44,90-171`): parse a
  * foreign `metadata.json` → manifest list → manifests into a mountable
  * table, MoR-read it (position deletes, equality deletes, Puffin DVs),
  * time-travel it, and compact it. The export → import round trip is also
  * the second-implementation check of the export: everything the exporter
  * writes must be reconstructible by a parser that shares none of the
  * catalog's in-memory state.
  */
class IcebergImportSpec extends SparkSpec {

  import spark.implicits._

  private def mount(root: String): String = {
    val g = s"gimp_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    g
  }

  /** A DV + eq-delete MoR fixture with 3+ snapshots under `root`. */
  private def buildFixture(root: String): String = {
    val g = mount(root)
    spark.sql(
      s"""CREATE TABLE $g.t (k BIGINT, v STRING)
         |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 2000)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(2000, 4000)")
    spark.sql(s"DELETE FROM $g.t WHERE k % 31 = 4") // -> pos-deletes
    spark.sql(s"CALL $g.system.rewrite_position_delete_files('t', " +
      "as_deletion_vectors => true)").collect()
    spark.sql(s"DELETE FROM $g.t WHERE k IN (1, 1000, 3999)") // -> eq-delete
    g
  }

  test("export -> import into a fresh root serves the identical MoR scan") {
    val rootA = Files.createTempDirectory("graft-imp-a").toString
    buildFixture(rootA)
    val catA = new GraftCatalog(rootA)
    assert(catA.loadEntries("t").exists(e => e.kind == "posdel" && e.format == "dv"))
    assert(catA.loadEntries("t").exists(_.kind == "eqdel"))
    val metaPath = IcebergMetadataJson.export(catA, rootA, "t")

    val rootB = Files.createTempDirectory("graft-imp-b").toString
    val catB = new GraftCatalog(rootB)
    val localHead = catB.importTable("t", metaPath.toString)
    assert(localHead == catA.currentSnapshotId("t"),
      "the imported chain must have one local snapshot per foreign one")

    // delete files imported as delete files, DV blobs regrouped per sidecar
    val entsB = catB.loadEntries("t")
    val entsA = catA.loadEntries("t")
    assert(entsB.filter(e => e.kind == "posdel" && e.format == "dv")
      .map(_.path).toSet ==
      entsA.filter(e => e.kind == "posdel" && e.format == "dv")
        .map(_.path).toSet)
    val eqB = entsB.filter(_.kind == "eqdel")
    assert(eqB.nonEmpty && eqB.forall(e =>
      e.eqCols.nonEmpty && e.eqIds.nonEmpty),
      s"imported eq-deletes must carry bound columns AND ids: $eqB")
    // data entries keep their stats (pruning survives the import)
    assert(entsB.filter(_.kind == "data").forall(e =>
      e.stats.exists(_.colMins.contains("k")) && e.recordCount > 0 &&
        e.sizeBytes > 0))
    // schema round-trips with field ids
    val idsA = catA.currentSchema("t").get.fields.flatMap(FieldIds.idOf).toSeq
    val idsB = catB.currentSchema("t").get.fields.flatMap(FieldIds.idOf).toSeq
    assert(idsA == idsB && idsA.nonEmpty)
    // provenance
    val props = catB.tableProperties("t")
    assert(props.get("import.metadata-location").contains(metaPath.toString))
    assert(props.contains("import.source-table-uuid"))
    assert(props.get("write.delete.mode").contains("merge-on-read"),
      "foreign table properties must be adopted")

    // THE check: identical MoR scans, current and time-travelled
    def rows(cat: GraftCatalog, asOf: Option[Long]) = {
      val df = asOf.fold(cat.scanTable(spark, "t"))(id =>
        cat.scanTableAt(spark, "t", id))
      df.as[(Long, String)].collect().toSet
    }
    assert(rows(catB, None) == rows(catA, None))
    assert(rows(catB, None).size == 4000 - 129 - 3) // 129 multiples-of-31+4 in [0,4000)
    for (sid <- catA.snapshotIds("t"))
      assert(rows(catB, Some(sid)) == rows(catA, Some(sid)),
        s"time travel to snapshot $sid must match")
    // foreign commit times carry over (TIMESTAMP AS OF sees the original
    // history, not the moment of import)
    for (sid <- catA.snapshotIds("t"))
      assert(catB.snapshotTimestampMs("t", sid) ==
        catA.snapshotTimestampMs("t", sid),
        s"snapshot $sid must keep its foreign commit time")
  }

  test("an imported table compacts: deletes retire, content identical") {
    val rootA = Files.createTempDirectory("graft-impc-a").toString
    buildFixture(rootA)
    val catA = new GraftCatalog(rootA)
    val metaPath = IcebergMetadataJson.export(catA, rootA, "t")
    val rootB = Files.createTempDirectory("graft-impc-b").toString
    val catB = new GraftCatalog(rootB)
    catB.importTable("t", metaPath.toString)
    val before = catB.scanTable(spark, "t").as[(Long, String)].collect().toSet
    assert(catB.loadEntries("t").exists(_.kind != "data"),
      "fixture must hold pending delete files before compaction")
    catB.compactTable(spark, "t", s"$rootB/t/_data/compacted")
    val after = catB.loadEntries("t")
    assert(after.forall(_.kind == "data"),
      s"compaction must retire every imported delete file: $after")
    assert(after.forall(_.path.contains(rootB)), // paths may carry file://
      "compaction outputs must land under the importing root")
    assert(catB.scanTable(spark, "t").as[(Long, String)].collect().toSet == before)
  }

  test("historyDepth imports the head plus its nearest ancestors only") {
    val rootA = Files.createTempDirectory("graft-impd-a").toString
    buildFixture(rootA)
    val catA = new GraftCatalog(rootA)
    val metaPath = IcebergMetadataJson.export(catA, rootA, "t")
    val rootB = Files.createTempDirectory("graft-impd-b").toString
    val catB = new GraftCatalog(rootB)
    val head = catB.importTable("t", metaPath.toString, historyDepth = Some(2))
    assert(head == 2L && catB.snapshotIds("t") == Seq(1L, 2L),
      "depth 2 must import exactly two snapshots")
    assert(catB.tableProperties("t").get("import.history-depth").contains("2"))
    // the HEAD's content is complete — depth only limits time travel
    assert(catB.scanTable(spark, "t").as[(Long, String)].collect().toSet ==
      catA.scanTable(spark, "t").as[(Long, String)].collect().toSet)
    // travel past the horizon fails loudly (no such local snapshot)
    intercept[Exception](catB.scanTableAt(spark, "t", 4L).collect())
  }

  test("imported appends carry the previous snapshot's segments by reference") {
    // the entry-order contract: each imported snapshot lists the entries
    // it shares with its predecessor FIRST, in the predecessor's order —
    // so additive commits (appends, delete-file adds) reference the prior
    // segments instead of paying a full O(files) segment per snapshot
    val rootA = Files.createTempDirectory("graft-impsg-a").toString
    buildFixture(rootA)
    val catA = new GraftCatalog(rootA)
    val metaPath = IcebergMetadataJson.export(catA, rootA, "t")
    val rootB = Files.createTempDirectory("graft-impsg-b").toString
    val catB = new GraftCatalog(rootB)
    catB.importTable("t", metaPath.toString)
    def refs(id: Long): Seq[String] = {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(
        java.nio.file.Paths.get(rootB, "t", s"snap-$id.tsv"))
        .asScala.toSeq.drop(1) // header line
    }
    // snapshot 2 (append) and 3 (delete-file add) extend their
    // predecessors' reference lists as strict prefixes
    assert(refs(2).startsWith(refs(1)),
      s"append must carry: ${refs(1)} vs ${refs(2)}")
    assert(refs(3).startsWith(refs(2)),
      s"delete add must carry: ${refs(2)} vs ${refs(3)}")
  }

  test("partition spec and sort order import with their source bindings") {
    val rootA = Files.createTempDirectory("graft-impp-a").toString
    val g = mount(rootA)
    spark.sql(
      s"""CREATE TABLE $g.p (k BIGINT, cat STRING, v DOUBLE)
         |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql(s"INSERT INTO $g.p SELECT id, concat('c', id % 3), id * 0.5 " +
      "FROM range(0, 500)")
    val catA = new GraftCatalog(rootA)
    catA.setSortOrder("p", Seq("k"))
    val metaPath = IcebergMetadataJson.export(catA, rootA, "p")
    val rootB = Files.createTempDirectory("graft-impp-b").toString
    val catB = new GraftCatalog(rootB)
    catB.importTable("p", metaPath.toString)
    assert(catB.partitionSpec("p") == catA.partitionSpec("p"))
    assert(catB.sortOrder("p") == Seq("k"))
    // partition tuples on the entries survive (partition pruning works)
    assert(catB.loadEntries("p").filter(_.kind == "data")
      .forall(_.partitionVals.nonEmpty))
    assert(catB.scanTable(spark, "p").count() == 500)
  }

  test("exported partition tuples are the spec's positional typed struct") {
    // round 17 closes the last write-side dialect deviation: with the
    // declared spec supplied, manifests serialize tuples as the
    // positional struct typed by the transforms' result types (1000+
    // field ids) — what a stock reader expects — and the re-import
    // partition-prunes through the standard positional machinery
    val rootA = Files.createTempDirectory("graft-expos-a").toString
    val g = mount(rootA)
    spark.sql(
      s"""CREATE TABLE $g.p (k BIGINT, v STRING)
         |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql(s"INSERT INTO $g.p SELECT id, concat('v', id) FROM range(0, 400)")
    val catA = new GraftCatalog(rootA)
    val metaPath = IcebergMetadataJson.export(catA, rootA, "p")
    // raw-Avro read of the exported data manifest: partition must be a
    // RECORD (not this library's name-keyed array), int-typed, id 1000
    val head = catA.currentSnapshotId("p")
    val reader = new org.apache.avro.file.DataFileReader(
      new java.io.File(s"$rootA/p/snap-$head-m0.avro"),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try {
      val rec = reader.next()
      val df = rec.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      val part = df.get("partition")
      assert(part.isInstanceOf[org.apache.avro.generic.GenericRecord],
        s"partition must be a positional struct, got ${part.getClass}")
      val pr = part.asInstanceOf[org.apache.avro.generic.GenericRecord]
      assert(pr.get("k_bucket").isInstanceOf[Integer],
        s"bucket slot must be a typed int: ${pr.get("k_bucket")}")
      assert(pr.getSchema.getField("k_bucket")
        .getObjectProp("field-id") == (1000: Integer))
    } finally reader.close()
    // the re-imported table prunes a point lookup to the covering bucket
    val rootB = Files.createTempDirectory("graft-expos-b").toString
    val catB = new GraftCatalog(rootB)
    catB.importTable("p", metaPath.toString)
    val files = catB.loadEntries("p").count(_.kind == "data")
    val keep = catB.inKeepPaths(spark, "p", "k", Seq(5L))
    assert(keep.nonEmpty && keep.size < files,
      s"positional round trip must keep pruning (kept ${keep.size}/$files)")
    assert(catB.scanTable(spark, "p").count() == 400)
  }

  test("positional tuples fall back where they would misdescribe files") {
    import IcebergManifest.{ManifestEntry, PartitionFieldSpec}
    val dir = Files.createTempDirectory("graft-posfall").toString
    val (p, sz) = stagedFile(dir, 10)
    val conf = new org.apache.hadoop.conf.Configuration()
    def partitionShape(path: String): org.apache.avro.Schema.Type = {
      val r = new org.apache.avro.file.DataFileReader(
        new java.io.File(path),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try r.next().get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
        .getSchema.getField("partition").schema().getType
      finally r.close()
    }
    val spec = Seq(PartitionFieldSpec("k_bucket", "bucket[8]", "k", LongType))
    // (1) matching recorded transform -> positional RECORD
    IcebergManifest.write(s"$dir/m-pos.avro", Seq(ManifestEntry(
      IcebergManifest.StatusAdded,
      DataFileStats(p, sz, 10, Map.empty, Map.empty, Map.empty),
      sequenceNumber = 1,
      partitionVals = Map("k_bucket" -> "3"),
      partitionTransforms = Map("k_bucket" -> "bucket[8]|k"))),
      handSchema, conf, partitionFields = spec)
    assert(partitionShape(s"$dir/m-pos.avro") ==
      org.apache.avro.Schema.Type.RECORD)
    // (2) an entry from a REPLACED transform that kept its name
    // (bucket[4] ordinals are NOT bucket[8] ordinals) -> name-keyed
    IcebergManifest.write(s"$dir/m-old.avro", Seq(ManifestEntry(
      IcebergManifest.StatusAdded,
      DataFileStats(p, sz, 10, Map.empty, Map.empty, Map.empty),
      sequenceNumber = 1,
      partitionVals = Map("k_bucket" -> "3"),
      partitionTransforms = Map("k_bucket" -> "bucket[4]|k"))),
      handSchema, conf, partitionFields = spec)
    assert(partitionShape(s"$dir/m-old.avro") ==
      org.apache.avro.Schema.Type.ARRAY,
      "an evolved-away transform must not serialize as the current spec")
    // (3) an entry with NO tuple (delete files) -> name-keyed: a stock
    // reader scopes deletes by tuple, and an all-null tuple would scope
    // them to the null partition (deletes silently stop applying)
    IcebergManifest.write(s"$dir/m-del.avro", Seq(ManifestEntry(
      IcebergManifest.StatusAdded,
      DataFileStats(s"$dir/eq.parquet", 1, 1, Map.empty, Map.empty, Map.empty),
      content = IcebergManifest.ContentEqualityDeletes,
      sequenceNumber = 2, equalityIds = Seq(1))),
      handSchema, conf, partitionFields = spec)
    assert(partitionShape(s"$dir/m-del.avro") ==
      org.apache.avro.Schema.Type.ARRAY)
    // (4) a spec field name Avro rejects -> name-keyed, never a crash
    IcebergManifest.write(s"$dir/m-dash.avro", Seq(ManifestEntry(
      IcebergManifest.StatusAdded,
      DataFileStats(p, sz, 10, Map.empty, Map.empty, Map.empty),
      sequenceNumber = 1,
      partitionVals = Map("k-bucket" -> "3"),
      partitionTransforms = Map("k-bucket" -> "bucket[8]|k"))),
      handSchema, conf,
      partitionFields =
        Seq(PartitionFieldSpec("k-bucket", "bucket[8]", "k", LongType)))
    assert(partitionShape(s"$dir/m-dash.avro") ==
      org.apache.avro.Schema.Type.ARRAY)
  }

  test("snapshot tags export in refs and import remapped to local ids") {
    val rootA = Files.createTempDirectory("graft-impt-a").toString
    val g = mount(rootA)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT)")
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(0, 50)")
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(50, 80)")
    val catA = new GraftCatalog(rootA)
    catA.tagSnapshot("t", "validated", 2L) // the first-insert snapshot
    val metaPath = IcebergMetadataJson.export(catA, rootA, "t")
    assert(Files.readString(metaPath).contains(
      """"validated":{"snapshot-id":2,"type":"tag"}"""),
      "the export must render the tag in refs")
    val rootB = Files.createTempDirectory("graft-impt-b").toString
    val catB = new GraftCatalog(rootB)
    catB.importTable("t", metaPath.toString)
    assert(catB.tags("t") == Map("validated" -> 2L))
    // the tag reads: 50 rows at the tagged snapshot, 80 at head
    assert(catB.loadTableAtTag("t", "validated").nonEmpty)
    assert(catB.scanTableAt(spark, "t", catB.tags("t")("validated"))
      .count() == 50)
    assert(catB.scanTable(spark, "t").count() == 80)
  }

  test("schema evolution history imports: renamed column reads at every snapshot") {
    val rootA = Files.createTempDirectory("graft-impe-a").toString
    val g = mount(rootA)
    spark.sql(s"CREATE TABLE $g.e (a BIGINT, b STRING)")
    spark.sql(s"INSERT INTO $g.e SELECT id, concat('x', id) FROM range(0, 100)")
    spark.sql(s"ALTER TABLE $g.e RENAME COLUMN b TO label")
    spark.sql(s"INSERT INTO $g.e SELECT id, concat('y', id) FROM range(100, 200)")
    val catA = new GraftCatalog(rootA)
    val metaPath = IcebergMetadataJson.export(catA, rootA, "e")
    val rootB = Files.createTempDirectory("graft-impe-b").toString
    val catB = new GraftCatalog(rootB)
    catB.importTable("e", metaPath.toString)
    // current schema carries the rename; old files still resolve by id
    assert(catB.currentSchema("e").get.fieldNames.toSeq == Seq("a", "label"))
    assert(catB.scanTable(spark, "e").count() == 200)
    assert(catB.scanTable(spark, "e")
      .filter($"label" === "x5" || $"label" === "y150").count() == 2)
    // the pre-rename snapshot still reads under its OWN schema
    val preRename = catB.scanTableAt(spark, "e", 2L)
    assert(preRename.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(preRename.count() == 100)
  }

  // ---- hand-built foreign chains (shapes our exporter never writes) ------

  private def handChain(
      dir: String,
      entries: Seq[IcebergManifest.ManifestEntry],
      schema: StructType,
      schemaJsonFields: String): String = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val mPath = s"$dir/m0.avro"
    IcebergManifest.write(mPath, entries, schema, conf)
    val listPath = s"$dir/list1.avro"
    IcebergManifest.writeList(listPath, Seq(IcebergManifest.ManifestFile(
      mPath, Files.size(java.nio.file.Paths.get(mPath)),
      partitionSpecId = 0, content = 0, sequenceNumber = 1,
      minSequenceNumber = 1, addedSnapshotId = 1, addedFilesCount = entries.size,
      existingFilesCount = 0, deletedFilesCount = 0,
      addedRowsCount = entries.map(e => math.max(0L, e.file.recordCount)).sum,
      existingRowsCount = 0, deletedRowsCount = 0)), conf)
    val meta =
      s"""{"format-version":2,"table-uuid":"hand-1","location":"$dir",
         |"last-sequence-number":1,"last-updated-ms":0,"last-column-id":2,
         |"current-schema-id":0,
         |"schemas":[{"schema-id":0,"type":"struct","fields":[$schemaJsonFields]}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         |"last-partition-id":999,"default-sort-order-id":0,
         |"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":1,
         |"snapshots":[{"snapshot-id":1,"sequence-number":1,"timestamp-ms":0,
         |"manifest-list":"$listPath","summary":{"operation":"append"},
         |"schema-id":0}],
         |"snapshot-log":[],"metadata-log":[]}""".stripMargin
    val mp = s"$dir/v1.metadata.json"
    Files.writeString(java.nio.file.Paths.get(mp), meta)
    mp
  }

  private val handSchemaFields =
    """{"id":1,"name":"k","required":false,"type":"long"},
      |{"id":2,"name":"v","required":false,"type":"string"}""".stripMargin

  private def handSchema: StructType = StructType(Seq(
    FieldIds.withFieldId(StructField("k", LongType), 1),
    FieldIds.withFieldId(StructField("v", StringType), 2)))

  private def stagedFile(dir: String, n: Long): (String, Long) = {
    (0L until n).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$dir/stage")
    val p = CompactionRunner.listParquet(s"$dir/stage").head
    (p, Files.size(java.nio.file.Paths.get(p)))
  }

  test("DELETED manifest entries do not import; EXISTING and ADDED do") {
    val dir = Files.createTempDirectory("graft-impd").toString
    val (p, sz) = stagedFile(dir, 50)
    def entry(status: Int, path: String) = IcebergManifest.ManifestEntry(
      status, DataFileStats(path, sz, 50, Map.empty, Map.empty, Map.empty),
      sequenceNumber = 1)
    val mp = handChain(dir, Seq(
      entry(0, p), // EXISTING — a stock writer's carried-forward entry
      entry(IcebergManifest.StatusDeleted, s"$dir/ghost.parquet")),
      handSchema, handSchemaFields)
    val root = Files.createTempDirectory("graft-impd-r").toString
    val cat = new GraftCatalog(root)
    cat.importTable("d", mp)
    val ents = cat.loadEntries("d")
    assert(ents.map(_.path) == Seq(p),
      s"DELETED entries must not import: $ents")
    assert(cat.scanTable(spark, "d").count() == 50)
  }

  test("an equality delete keyed on an unresolvable field id refuses the import") {
    val dir = Files.createTempDirectory("graft-impq").toString
    val (p, sz) = stagedFile(dir, 10)
    val mp = handChain(dir, Seq(
      IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
        DataFileStats(p, sz, 10, Map.empty, Map.empty, Map.empty),
        sequenceNumber = 1),
      IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
        DataFileStats(s"$dir/eq.parquet", 1, 1, Map.empty, Map.empty, Map.empty),
        content = IcebergManifest.ContentEqualityDeletes,
        sequenceNumber = 2, equalityIds = Seq(999))),
      handSchema, handSchemaFields)
    val root = Files.createTempDirectory("graft-impq-r").toString
    val cat = new GraftCatalog(root)
    val e = intercept[GraftError.Metadata](cat.importTable("q", mp))
    assert(e.getMessage.contains("999"), e.getMessage)
    assert(!cat.tableExists("q"), "a refused import must not register the table")
    // ...and must write NOTHING (snapshot docs are write-once; a partial
    // write would wedge the retry after the upstream document is fixed)
    assert(!Files.exists(java.nio.file.Paths.get(root, "q", "snap-1.tsv")),
      "a refused import must leave no snapshot documents behind")
  }

  test("import a chain living entirely on s3://, MoR-read and compact it there") {
    // the reference's exact deployment shape: catalog pointer local,
    // metadata.json + manifests + data + delete files all in the object
    // store, compaction output landing back in the store
    val s3 = new graft.wire.S3StubServer()
    try {
      val props = Map(
        "fs.s3.impl" -> "graft.wire.S3ClientFileSystem",
        "fs.s3.endpoint" -> s3.endpoint,
        // endpoint resolution prefers the Iceberg-mapped fs.s3a.endpoint:
        // a prior suite's wire request leaves its (now dead) stub port
        // there on the SHARED session conf — set both so this test's
        // store wins regardless of suite order
        "fs.s3a.endpoint" -> s3.endpoint,
        "fs.s3.impl.disable.cache" -> "true")
      graft.wire.WireBridge.applyFileIo(spark, props)
      val conf = spark.sessionState.newHadoopConf()
      def putS3(key: String, bytes: Array[Byte]): Unit = {
        val p = new org.apache.hadoop.fs.Path(s"s3://bucket/$key")
        val out = p.getFileSystem(conf).create(p, true)
        try out.write(bytes) finally out.close()
      }
      val local = Files.createTempDirectory("graft-imps-stage").toString
      val (dp, _) = stagedFile(local, 100)
      putS3("w/data/d1.parquet", Files.readAllBytes(java.nio.file.Paths.get(dp)))
      // a position-delete row file for d1 positions 0 and 7 (ks 0 and 7)
      Seq(("s3://bucket/w/data/d1.parquet", 0L),
        ("s3://bucket/w/data/d1.parquet", 7L))
        .toDF("file_path", "pos").coalesce(1).write.parquet(s"$local/pd")
      putS3("w/data/pd1.parquet", Files.readAllBytes(java.nio.file.Paths.get(
        CompactionRunner.listParquet(s"$local/pd").head)))
      val dSize = s3.keys.size // just to touch the stub's state
      assert(dSize >= 2)
      val entries = Seq(
        IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
          DataFileStats("s3://bucket/w/data/d1.parquet", 1, 100,
            Map("k" -> "0"), Map("k" -> "99"), Map.empty),
          sequenceNumber = 1),
        IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
          DataFileStats("s3://bucket/w/data/pd1.parquet", 1, 2,
            Map.empty, Map.empty, Map.empty),
          content = IcebergManifest.ContentPositionDeletes,
          sequenceNumber = 2))
      IcebergManifest.write("s3://bucket/w/meta/m0.avro", entries, handSchema, conf)
      val mLen = new org.apache.hadoop.fs.Path("s3://bucket/w/meta/m0.avro")
        .getFileSystem(conf)
        .getFileStatus(new org.apache.hadoop.fs.Path("s3://bucket/w/meta/m0.avro"))
        .getLen
      IcebergManifest.writeList("s3://bucket/w/meta/list1.avro",
        Seq(IcebergManifest.ManifestFile("s3://bucket/w/meta/m0.avro", mLen,
          partitionSpecId = 0, content = 0, sequenceNumber = 2,
          minSequenceNumber = 1, addedSnapshotId = 1, addedFilesCount = 2,
          existingFilesCount = 0, deletedFilesCount = 0, addedRowsCount = 102,
          existingRowsCount = 0, deletedRowsCount = 0)), conf)
      putS3("w/meta/v1.metadata.json",
        s"""{"format-version":2,"table-uuid":"s3-hand","location":"s3://bucket/w",
           |"last-column-id":2,"current-schema-id":0,
           |"schemas":[{"schema-id":0,"type":"struct","fields":[$handSchemaFields]}],
           |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
           |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
           |"current-snapshot-id":1,
           |"snapshots":[{"snapshot-id":1,"sequence-number":1,"timestamp-ms":0,
           |"manifest-list":"s3://bucket/w/meta/list1.avro",
           |"summary":{"operation":"append"},"schema-id":0}]}""".stripMargin
          .getBytes("UTF-8"))
      val root = Files.createTempDirectory("graft-imps-r").toString
      val cat = new GraftCatalog(root)
      cat.importTable("s", "s3://bucket/w/meta/v1.metadata.json", conf)
      // MoR read straight off the store: 100 rows minus 2 deleted positions
      val scan = cat.scanTable(spark, "s")
      assert(scan.count() == 98)
      assert(scan.filter($"k".isin(0L, 7L)).count() == 0)
      // compact INTO the store: delete file retired, output keys on s3
      cat.compactTable(spark, "s", "s3://bucket/w/compacted")
      val after = cat.loadEntries("s")
      assert(after.forall(_.kind == "data"))
      assert(after.forall(_.path.startsWith("s3://bucket/w/compacted")),
        s"compaction output must land in the store: ${after.map(_.path)}")
      assert(cat.scanTable(spark, "s").count() == 98)
    } finally s3.close()
  }

  test("a STOCK-shaped manifest decodes: binary bounds, positional partition, inherited seq") {
    // hand-built with the STOCK writer's Avro shape (the spec's field
    // names/types as a real Iceberg writer produces them): binary
    // single-value bounds, a positional partition struct typed by the
    // spec, nullable sequence_number relying on manifest-list
    // inheritance, and extra fields (value_counts, split_offsets,
    // sort_order_id) this model doesn't carry — same spec-vector posture
    // as the Puffin and pg-wire suites, since no stock writer ships in
    // this environment
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val kvLong = SchemaBuilder.array().items(
      SchemaBuilder.record("k117_v118").fields()
        .requiredInt("key").requiredLong("value").endRecord())
    val kvBytes = SchemaBuilder.array().items(
      SchemaBuilder.record("k126_v127").fields()
        .requiredInt("key").requiredBytes("value").endRecord())
    val partStruct = SchemaBuilder.record("r102").fields()
      .name("k_bucket").`type`().optional().intType()
      .endRecord()
    val dataFile = SchemaBuilder.record("r2").fields()
      .requiredInt("content")
      .requiredString("file_path")
      .requiredString("file_format")
      .name("partition").`type`(partStruct).noDefault()
      .requiredLong("record_count")
      .requiredLong("file_size_in_bytes")
      .name("value_counts").`type`().optional().`type`(kvLong)
      .name("null_value_counts").`type`().optional().`type`(kvLong)
      .name("lower_bounds").`type`().optional().`type`(kvBytes)
      .name("upper_bounds").`type`().optional().`type`(kvBytes)
      .name("split_offsets").`type`().optional().array().items().longType()
      .name("equality_ids").`type`().optional().array().items().intType()
      .name("sort_order_id").`type`().optional().intType()
      .endRecord()
    val entrySchema = SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status")
      .name("snapshot_id").`type`().optional().longType()
      .name("sequence_number").`type`().optional().longType()
      .name("file_sequence_number").`type`().optional().longType()
      .name("data_file").`type`(dataFile).noDefault()
      .endRecord()
    val dir = Files.createTempDirectory("graft-stockman").toString
    val path = s"$dir/stock-m0.avro"
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.create(entrySchema, new java.io.File(path))
    def kvRec(arr: org.apache.avro.Schema, key: Int, v: Any): GenericRecord = {
      val r = new GenericData.Record(arr.getElementType)
      r.put("key", key)
      r.put("value", v)
      r
    }
    val part = new GenericData.Record(partStruct)
    part.put("k_bucket", 3)
    val df = new GenericData.Record(dataFile)
    df.put("content", 0)
    df.put("file_path", "s3://bucket/w/d1.parquet")
    df.put("file_format", "PARQUET")
    df.put("partition", part)
    df.put("record_count", 100L)
    df.put("file_size_in_bytes", 2048L)
    df.put("value_counts", java.util.List.of(kvRec(kvLong, 1, 100L)))
    df.put("null_value_counts", java.util.List.of(kvRec(kvLong, 1, 4L)))
    df.put("lower_bounds", java.util.List.of(
      kvRec(kvBytes, 1, java.nio.ByteBuffer.wrap(
        IcebergSingleValue.encode(LongType, "5").get)),
      // a bound for a DROPPED column (no schema binding) must drop, not fail
      kvRec(kvBytes, 99, java.nio.ByteBuffer.wrap(Array[Byte](1, 0, 0, 0)))))
    df.put("upper_bounds", java.util.List.of(
      kvRec(kvBytes, 1, java.nio.ByteBuffer.wrap(
        IcebergSingleValue.encode(LongType, "104").get)),
      kvRec(kvBytes, 2, java.nio.ByteBuffer.wrap(
        IcebergSingleValue.encode(StringType, "zz").get))))
    df.put("split_offsets", java.util.List.of(java.lang.Long.valueOf(4L)))
    df.put("sort_order_id", 0)
    val rec = new GenericData.Record(entrySchema)
    rec.put("status", 0) // EXISTING
    rec.put("snapshot_id", 42L)
    rec.put("sequence_number", null) // inherited from the list row
    rec.put("data_file", df)
    w.append(rec)
    w.close()

    val entries = IcebergManifest.read(path, handSchema,
      new org.apache.hadoop.conf.Configuration(), inheritedSeq = 7L)
    assert(entries.length == 1)
    val e = entries.head
    assert(e.status == 0 && e.snapshotId.contains(42L))
    assert(e.sequenceNumber == 7L, "null sequence_number must inherit")
    assert(e.file.path == "s3://bucket/w/d1.parquet" && e.format == "PARQUET")
    assert(e.file.recordCount == 100L && e.file.sizeBytes == 2048L)
    // binary bounds decode to the catalog's string renderings by field id
    assert(e.file.colMins == Map("k" -> "5"), e.file.colMins)
    assert(e.file.colMaxs == Map("k" -> "104", "v" -> "zz"))
    assert(e.file.nullCounts == Map("k" -> 4L))
    // the positional partition struct binds by its field names
    assert(e.partitionVals == Map("k_bucket" -> "3"))
    assert(e.partitionTransforms.isEmpty)
  }

  test("a stock chain's positional tuples become prunable via the manifest's spec") {
    // stock manifests carry NO per-file transform info — the import
    // rebuilds it from the manifest's own partition-spec id, so a foreign
    // bucket-partitioned table point-prunes immediately after import
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = Files.createTempDirectory("graft-stockprune").toString
    val (p1, sz) = stagedFile(dir, 50)
    val p2 = {
      (50L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$dir/stage2")
      CompactionRunner.listParquet(s"$dir/stage2").head
    }
    val partStruct = SchemaBuilder.record("r102").fields()
      .name("k_bucket").`type`().optional().intType().endRecord()
    val dataFile = SchemaBuilder.record("r2").fields()
      .requiredInt("content").requiredString("file_path")
      .requiredString("file_format")
      .name("partition").`type`(partStruct).noDefault()
      .requiredLong("record_count").requiredLong("file_size_in_bytes")
      .endRecord()
    val entrySchema = SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status")
      .name("sequence_number").`type`().optional().longType()
      .name("data_file").`type`(dataFile).noDefault()
      .endRecord()
    val mPath = s"$dir/m0.avro"
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.create(entrySchema, new java.io.File(mPath))
    val probeBucket = graft.functions.IcebergMurmur3.bucketLong(5L, 8)
    for ((p, bucket) <- Seq((p1, probeBucket), (p2, (probeBucket + 3) % 8))) {
      val part = new GenericData.Record(partStruct)
      part.put("k_bucket", bucket)
      val df = new GenericData.Record(dataFile)
      df.put("content", 0)
      df.put("file_path", p)
      df.put("file_format", "PARQUET")
      df.put("partition", part)
      df.put("record_count", 50L)
      df.put("file_size_in_bytes", sz)
      val rec = new GenericData.Record(entrySchema)
      rec.put("status", 1)
      rec.put("sequence_number", null) // inherited
      rec.put("data_file", df)
      w.append(rec)
    }
    w.close()
    val conf = new org.apache.hadoop.conf.Configuration()
    IcebergManifest.writeList(s"$dir/list1.avro", Seq(IcebergManifest.ManifestFile(
      mPath, Files.size(java.nio.file.Paths.get(mPath)),
      partitionSpecId = 2, content = 0, sequenceNumber = 1,
      minSequenceNumber = 1, addedSnapshotId = 1, addedFilesCount = 2,
      existingFilesCount = 0, deletedFilesCount = 0, addedRowsCount = 100,
      existingRowsCount = 0, deletedRowsCount = 0)), conf)
    Files.writeString(java.nio.file.Paths.get(s"$dir/v1.metadata.json"),
      s"""{"format-version":2,"table-uuid":"sp-1","location":"$dir",
         |"last-column-id":2,"current-schema-id":0,
         |"schemas":[{"schema-id":0,"type":"struct","fields":[$handSchemaFields]}],
         |"default-spec-id":2,
         |"partition-specs":[{"spec-id":0,"fields":[]},
         |  {"spec-id":2,"fields":[{"name":"k_bucket","transform":"bucket[8]",
         |   "source-id":1,"field-id":1000}]}],
         |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":1,
         |"snapshots":[{"snapshot-id":1,"sequence-number":1,"timestamp-ms":0,
         |"manifest-list":"$dir/list1.avro","summary":{"operation":"append"},
         |"schema-id":0}]}""".stripMargin)
    val root = Files.createTempDirectory("graft-stockprune-r").toString
    val cat = new GraftCatalog(root)
    cat.importTable("t", s"$dir/v1.metadata.json")
    // the declared spec binds; per-file transforms rebuilt from spec 2
    assert(cat.partitionSpec("t") ==
      Seq(GraftCatalog.PartitionFieldDef("k_bucket", "bucket[8]", "k")))
    val ents = cat.loadEntries("t").filter(_.kind == "data")
    assert(ents.forall(_.partitionTransforms == Map("k_bucket" -> "bucket[8]|k")),
      ents.map(_.partitionTransforms).toString)
    // the point lookup opens ONLY the covering bucket's file
    val keep = cat.inKeepPaths(spark, "t", "k", Seq(5L))
    assert(keep == Set(p1), s"bucket pruning must keep only $p1: $keep")
    assert(cat.scanTable(spark, "t").count() == 100)
  }

  test("a v1 document's bare partition-spec binds: imported files prune") {
    // v1's deprecated flat `partition-spec` array (no spec-id wrapper,
    // no `partition-specs`) must bind as spec 0 per the migration rules —
    // otherwise a v1-era table imports unpartitioned and every point
    // lookup opens every file
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = Files.createTempDirectory("graft-v1spec").toString
    val (p1, sz) = stagedFile(dir, 50)
    val p2 = {
      (50L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$dir/stage2")
      CompactionRunner.listParquet(s"$dir/stage2").head
    }
    val partStruct = SchemaBuilder.record("r102").fields()
      .name("k_bucket").`type`().optional().intType().endRecord()
    val dataFile = SchemaBuilder.record("r2").fields()
      .requiredString("file_path").requiredString("file_format")
      .name("partition").`type`(partStruct).noDefault()
      .requiredLong("record_count").requiredLong("file_size_in_bytes")
      .endRecord()
    val entrySchema = SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status")
      .name("data_file").`type`(dataFile).noDefault()
      .endRecord() // v1: no content, no sequence_number anywhere
    val mPath = s"$dir/m0.avro"
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.create(entrySchema, new java.io.File(mPath))
    val probeBucket = graft.functions.IcebergMurmur3.bucketLong(5L, 8)
    for ((p, bucket) <- Seq((p1, probeBucket), (p2, (probeBucket + 3) % 8))) {
      val part = new GenericData.Record(partStruct)
      part.put("k_bucket", bucket)
      val df = new GenericData.Record(dataFile)
      df.put("file_path", p)
      df.put("file_format", "PARQUET")
      df.put("partition", part)
      df.put("record_count", 50L)
      df.put("file_size_in_bytes", sz)
      val rec = new GenericData.Record(entrySchema)
      rec.put("status", 1)
      rec.put("data_file", df)
      w.append(rec)
    }
    w.close()
    val conf = new org.apache.hadoop.conf.Configuration()
    IcebergManifest.writeList(s"$dir/list1.avro", Seq(IcebergManifest.ManifestFile(
      mPath, Files.size(java.nio.file.Paths.get(mPath)),
      partitionSpecId = 0, content = 0, sequenceNumber = 0,
      minSequenceNumber = 0, addedSnapshotId = 1, addedFilesCount = 2,
      existingFilesCount = 0, deletedFilesCount = 0, addedRowsCount = 100,
      existingRowsCount = 0, deletedRowsCount = 0)), conf)
    Files.writeString(java.nio.file.Paths.get(s"$dir/v1.metadata.json"),
      s"""{"format-version":1,"table-uuid":"v1-legacy","location":"$dir",
         |"last-column-id":2,
         |"schema":{"type":"struct","fields":[$handSchemaFields]},
         |"partition-spec":[{"name":"k_bucket","transform":"bucket[8]",
         |  "source-id":1,"field-id":1000}],
         |"current-snapshot-id":1,
         |"snapshots":[{"snapshot-id":1,"timestamp-ms":1000,
         |"manifest-list":"$dir/list1.avro"}]}""".stripMargin)
    val root = Files.createTempDirectory("graft-v1spec-r").toString
    val cat = new GraftCatalog(root)
    cat.importTable("t", s"$dir/v1.metadata.json")
    assert(cat.partitionSpec("t") ==
      Seq(GraftCatalog.PartitionFieldDef("k_bucket", "bucket[8]", "k")))
    val keep = cat.inKeepPaths(spark, "t", "k", Seq(5L))
    assert(keep == Set(p1), s"v1 bucket pruning must keep only $p1: $keep")
    assert(cat.scanTable(spark, "t").count() == 100)
  }

  test("v1 documents without sequence numbers import in timestamp order") {
    // v1 snapshot ids are arbitrary longs — a snapshot-id sort would put
    // 900 after the head and silently exclude it. timestamp-ms is v1's
    // only ordering signal.
    val meta = IcebergImport.parse(
      """{"format-version":1,"current-schema-id":0,
        |"schema":{"type":"struct","fields":[
        |  {"id":1,"name":"k","required":false,"type":"long"}]},
        |"current-snapshot-id":77,
        |"snapshots":[
        |  {"snapshot-id":77,"timestamp-ms":3000,"manifest-list":"/l3"},
        |  {"snapshot-id":900,"timestamp-ms":1000,"manifest-list":"/l1"},
        |  {"snapshot-id":5,"timestamp-ms":2000,"manifest-list":"/l2"}]}"""
        .stripMargin)
    assert(meta.snapshots.forall(_.sequenceNumber.isEmpty))
    assert(IcebergImport.mainLineage(meta).map(_.snapshotId) ==
      Seq(900L, 5L, 77L))
  }

  test("parent-snapshot-id walk excludes rolled-back non-ancestor snapshots") {
    // 20 was committed after 10 (seq 2) then rolled back; head 30 forked
    // from 10. A sequence-order import would wrongly include 20.
    val meta = IcebergImport.parse(
      """{"format-version":2,"current-schema-id":0,
        |"schemas":[{"schema-id":0,"type":"struct","fields":[
        |  {"id":1,"name":"k","required":false,"type":"long"}]}],
        |"current-snapshot-id":30,
        |"snapshots":[
        |  {"snapshot-id":10,"sequence-number":1,"timestamp-ms":1,
        |   "manifest-list":"/l1"},
        |  {"snapshot-id":20,"sequence-number":2,"timestamp-ms":2,
        |   "parent-snapshot-id":10,"manifest-list":"/l2"},
        |  {"snapshot-id":30,"sequence-number":3,"timestamp-ms":3,
        |   "parent-snapshot-id":10,"manifest-list":"/l3"}]}""".stripMargin)
    assert(IcebergImport.mainLineage(meta).map(_.snapshotId) == Seq(10L, 30L))
    // ...and a parent pointer to EXPIRED history starts the lineage at the
    // oldest retained ancestor instead of failing
    val truncated = IcebergImport.parse(
      """{"format-version":2,"current-schema-id":0,
        |"schemas":[{"schema-id":0,"type":"struct","fields":[
        |  {"id":1,"name":"k","required":false,"type":"long"}]}],
        |"current-snapshot-id":30,
        |"snapshots":[
        |  {"snapshot-id":30,"sequence-number":3,"timestamp-ms":3,
        |   "parent-snapshot-id":9999,"manifest-list":"/l3"}]}""".stripMargin)
    assert(IcebergImport.mainLineage(truncated).map(_.snapshotId) == Seq(30L))
  }

  test("import refuses a non-empty table directory and leaves it untouched") {
    val dir = Files.createTempDirectory("graft-impne").toString
    val (p, sz) = stagedFile(dir, 10)
    val mp = handChain(dir, Seq(IcebergManifest.ManifestEntry(
      IcebergManifest.StatusAdded,
      DataFileStats(p, sz, 10, Map.empty, Map.empty, Map.empty),
      sequenceNumber = 1)), handSchema, handSchemaFields)
    val root = Files.createTempDirectory("graft-impne-r").toString
    val leftover = java.nio.file.Paths.get(root, "n", "precious.txt")
    Files.createDirectories(leftover.getParent)
    Files.writeString(leftover, "user data the import must not wipe")
    val e = intercept[GraftError.Metadata](
      new GraftCatalog(root).importTable("n", mp))
    assert(e.getMessage.contains("non-empty"), e.getMessage)
    assert(Files.exists(leftover),
      "a refused import must not destroy pre-existing files")
    // the same chain imports cleanly once the directory is clean
    Files.delete(leftover)
    val cat = new GraftCatalog(root)
    cat.importTable("n", mp)
    assert(cat.scanTable(spark, "n").count() == 10)
  }

  test("re-export of an imported table keeps sequence-number invariants") {
    // foreign entries carry a HUGE sequence number; the re-exported
    // document must not publish a last-sequence-number below it (strict
    // stock readers reject documents violating the invariant)
    val dir = Files.createTempDirectory("graft-impseq").toString
    val (p, sz) = stagedFile(dir, 20)
    val mp = handChain(dir, Seq(IcebergManifest.ManifestEntry(
      IcebergManifest.StatusAdded,
      DataFileStats(p, sz, 20, Map.empty, Map.empty, Map.empty),
      sequenceNumber = 5000000L)), handSchema, handSchemaFields)
    val root = Files.createTempDirectory("graft-impseq-r").toString
    val cat = new GraftCatalog(root)
    cat.importTable("s", mp)
    val out = IcebergMetadataJson.export(cat, root, "s")
    val doc = Files.readString(out)
    assert(doc.contains("\"last-sequence-number\":5000000"), doc.take(400))
    assert(doc.contains("\"sequence-number\":5000000"),
      "the snapshot's sequence-number must cover its entries")
    // and the re-exported chain re-imports identically (now via the
    // parent-snapshot-id walk the export emits)
    val root2 = Files.createTempDirectory("graft-impseq-r2").toString
    val cat2 = new GraftCatalog(root2)
    cat2.importTable("s", out.toString)
    assert(cat2.scanTable(spark, "s").count() == 20)
    // commits AFTER the huge foreign seq must export STRICTLY INCREASING
    // sequence numbers (an equal-seq plateau lets stock validators reject
    // the chain or misorder delete applicability at equal-seq boundaries)
    val (p2, sz2) = stagedFile(s"$dir/next", 5)
    cat.commitAppend("s", Seq(GraftCatalog.AddedFile(p2, recordCount = 5,
      sizeBytes = sz2)))
    val (p3, sz3) = stagedFile(s"$dir/next2", 3)
    cat.commitAppend("s", Seq(GraftCatalog.AddedFile(p3, recordCount = 3,
      sizeBytes = sz3)))
    val doc2 = Files.readString(IcebergMetadataJson.export(cat, root, "s"))
    val seqs = "\"sequence-number\":(\\d+)".r
      .findAllMatchIn(doc2).map(_.group(1).toLong).toSeq
    assert(seqs.size >= 3 && seqs == seqs.sorted && seqs.distinct == seqs,
      s"snapshot sequence numbers must strictly increase: $seqs")
    assert(seqs.head == 5000000L && seqs.last == 5000002L, seqs.toString)
    assert(doc2.contains("\"last-sequence-number\":5000002"), doc2.take(400))
  }

  test("position deletes on spacey partition paths apply in every read path") {
    // the literal/encoded domain seam: the data file lives under a
    // Hive-layout dir with a SPACE (seg=NOT SPECIFIED), the pos-delete
    // row file records the LITERAL path (what stock writers store), and
    // the scan side renders percent-encoded — both the row-path MoR scan
    // and the doorway's vectorized mask must still drop the positions
    val dir = Files.createTempDirectory("graft-impspacey").toString
    val dataDir = s"$dir/seg=NOT SPECIFIED"
    (0L until 40L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(dataDir)
    val dp = CompactionRunner.listParquet(dataDir).head
    assert(dp.contains(" "), s"fixture must exercise a spacey path: $dp")
    Seq((s"file://$dp", 3L), (s"file://$dp", 7L))
      .toDF("file_path", "pos").coalesce(1).write.parquet(s"$dir/pd")
    val pd = CompactionRunner.listParquet(s"$dir/pd").head
    val conf = new org.apache.hadoop.conf.Configuration()
    val sz = (p: String) => Files.size(java.nio.file.Paths.get(p))
    IcebergManifest.write(s"$dir/m0.avro", Seq(
      IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
        DataFileStats(dp, sz(dp), 40, Map.empty, Map.empty, Map.empty),
        sequenceNumber = 1),
      IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
        DataFileStats(pd, sz(pd), 2, Map.empty, Map.empty, Map.empty),
        content = IcebergManifest.ContentPositionDeletes,
        sequenceNumber = 2)), handSchema, conf)
    IcebergManifest.writeList(s"$dir/l1.avro", Seq(IcebergManifest.ManifestFile(
      s"$dir/m0.avro", sz(s"$dir/m0.avro"),
      partitionSpecId = 0, content = 0, sequenceNumber = 2,
      minSequenceNumber = 1, addedSnapshotId = 1, addedFilesCount = 2,
      existingFilesCount = 0, deletedFilesCount = 0, addedRowsCount = 42,
      existingRowsCount = 0, deletedRowsCount = 0)), conf)
    Files.writeString(java.nio.file.Paths.get(s"$dir/v1.metadata.json"),
      s"""{"format-version":2,"table-uuid":"spacey","location":"$dir",
         |"last-column-id":2,"current-schema-id":0,
         |"schemas":[{"schema-id":0,"type":"struct","fields":[$handSchemaFields]}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":1,
         |"snapshots":[{"snapshot-id":1,"sequence-number":1,"timestamp-ms":0,
         |"manifest-list":"$dir/l1.avro","summary":{"operation":"append"},
         |"schema-id":0}]}""".stripMargin)
    val root = Files.createTempDirectory("graft-impspacey-r").toString
    val cat = new GraftCatalog(root)
    cat.importTable("t", s"$dir/v1.metadata.json")
    // the ROW-path MoR scan
    val scan = cat.scanTable(spark, "t")
    assert(scan.count() == 38, "pos deletes on the spacey path must apply")
    assert(scan.filter($"k".isin(3L, 7L)).count() == 0)
    // ...and the doorway (vectorized-mask) read
    val g = s"gsp_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 38L)
    assert(spark.sql(s"SELECT count(*) FROM $g.t WHERE k IN (3, 7)")
      .head().getLong(0) == 0L)
  }

  test("a WAP-style branch ref imports as a publishable fork") {
    // the classic write-audit-publish document: main at snapshot 1, a
    // staged snapshot 2 (parent 1, NOT in the main lineage) named by a
    // branch ref. The import must register `t@audit`, expose it through
    // VERSION AS OF 'audit', and let publish adopt it onto main.
    val dir = Files.createTempDirectory("graft-impbr").toString
    val (pA, szA) = stagedFile(dir, 60)
    val pB = {
      (60L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$dir/stage2")
      CompactionRunner.listParquet(s"$dir/stage2").head
    }
    val szB = Files.size(java.nio.file.Paths.get(pB))
    val conf = new org.apache.hadoop.conf.Configuration()
    def entry(p: String, sz: Long, n: Long, seq: Long) =
      IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
        DataFileStats(p, sz, n, Map.empty, Map.empty, Map.empty),
        sequenceNumber = seq)
    IcebergManifest.write(s"$dir/m1.avro", Seq(entry(pA, szA, 60, 1)),
      handSchema, conf)
    IcebergManifest.write(s"$dir/m2.avro",
      Seq(entry(pA, szA, 60, 1), entry(pB, szB, 40, 2)), handSchema, conf)
    def list(lp: String, mp: String, seq: Long): Unit =
      IcebergManifest.writeList(lp, Seq(IcebergManifest.ManifestFile(
        mp, Files.size(java.nio.file.Paths.get(mp)),
        partitionSpecId = 0, content = 0, sequenceNumber = seq,
        minSequenceNumber = 1, addedSnapshotId = seq, addedFilesCount = 1,
        existingFilesCount = 0, deletedFilesCount = 0, addedRowsCount = 0,
        existingRowsCount = 0, deletedRowsCount = 0)), conf)
    list(s"$dir/l1.avro", s"$dir/m1.avro", 1)
    list(s"$dir/l2.avro", s"$dir/m2.avro", 2)
    Files.writeString(java.nio.file.Paths.get(s"$dir/v1.metadata.json"),
      s"""{"format-version":2,"table-uuid":"wap-doc","location":"$dir",
         |"last-sequence-number":2,"last-column-id":2,"current-schema-id":0,
         |"schemas":[{"schema-id":0,"type":"struct","fields":[$handSchemaFields]}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":1,
         |"refs":{"main":{"snapshot-id":1,"type":"branch"},
         |        "audit":{"snapshot-id":2,"type":"branch"},
         |        "lost":{"snapshot-id":999,"type":"branch"}},
         |"snapshots":[
         |  {"snapshot-id":1,"sequence-number":1,"timestamp-ms":1000,
         |   "manifest-list":"$dir/l1.avro","summary":{"operation":"append"},
         |   "schema-id":0},
         |  {"snapshot-id":2,"sequence-number":2,"timestamp-ms":2000,
         |   "parent-snapshot-id":1,
         |   "manifest-list":"$dir/l2.avro","summary":{"operation":"append"},
         |   "schema-id":0}]}""".stripMargin)
    val root = Files.createTempDirectory("graft-impbr-r").toString
    val cat = new GraftCatalog(root)
    cat.importTable("t", s"$dir/v1.metadata.json")
    // main imported at its head (60 rows); the staged branch rode along
    assert(cat.scanTable(spark, "t").count() == 60)
    assert(cat.tableExists("t@audit"), "the branch ref must register a fork")
    assert(!cat.tableExists("t@lost"),
      "a branch ref with no importable target must skip, not fail")
    assert(cat.scanTable(spark, "t@audit").count() == 100)
    // the doorway exposes it: VERSION AS OF 'audit' reads the staged state
    val g = s"gbr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    assert(spark.sql(s"SELECT count(*) FROM $g.t VERSION AS OF 'audit'")
      .head().getLong(0) == 100L)
    // ...and publish adopts the audited state onto main (base == head)
    cat.publishFork("t@audit")
    assert(cat.scanTable(spark, "t").count() == 100)
  }

  test("an in-lineage branch ref forks at its local snapshot") {
    val rootA = Files.createTempDirectory("graft-impbl-a").toString
    val g = mount(rootA)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT)")
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(0, 50)")
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(50, 80)")
    val catA = new GraftCatalog(rootA)
    val metaPath = IcebergMetadataJson.export(catA, rootA, "t")
    // hand-add a branch ref at the first-insert snapshot (id 2)
    val doc = Files.readString(metaPath).replace(
      """"refs":{""",
      """"refs":{"stable":{"snapshot-id":2,"type":"branch"},""")
    Files.writeString(metaPath, doc)
    val rootB = Files.createTempDirectory("graft-impbl-b").toString
    val catB = new GraftCatalog(rootB)
    catB.importTable("t", metaPath.toString)
    assert(catB.tableExists("t@stable"))
    assert(catB.scanTable(spark, "t@stable").count() == 50)
    assert(catB.scanTable(spark, "t").count() == 80)
  }

  test("the parser rejects malformed and unsupported documents loudly") {
    intercept[GraftError.Metadata](IcebergImport.parse("not json at all"))
    intercept[GraftError.Metadata](IcebergImport.parse("""{"no-version":true}"""))
    intercept[GraftError.Metadata](
      IcebergImport.parse("""{"format-version":7}"""))
    // unknown types must fail, not silently coerce
    intercept[GraftError.Metadata](IcebergImport.parse(
      """{"format-version":2,"schemas":[{"schema-id":0,"type":"struct",
        |"fields":[{"id":1,"name":"g","required":false,"type":"geometry"}]}],
        |"current-schema-id":0}""".stripMargin))
    // ...including a malformed fixed length
    intercept[GraftError.Metadata](IcebergImport.parse(
      """{"format-version":2,"schemas":[{"schema-id":0,"type":"struct",
        |"fields":[{"id":1,"name":"f","required":false,"type":"fixed[zero]"}]}],
        |"current-schema-id":0}""".stripMargin))
  }

  test("uuid/fixed/time/ns types import with their physical annotations") {
    val meta = IcebergImport.parse(
      """{"format-version":2,"current-schema-id":0,
        |"schemas":[{"schema-id":0,"type":"struct","fields":[
        |  {"id":1,"name":"u","required":false,"type":"uuid"},
        |  {"id":2,"name":"fp","required":false,"type":"fixed[16]"},
        |  {"id":3,"name":"t","required":false,"type":"time"},
        |  {"id":4,"name":"tn","required":false,"type":"timestamp_ns"},
        |  {"id":5,"name":"tzn","required":false,"type":"timestamptz_ns"}]}],
        |"current-snapshot-id":-1,"snapshots":[]}""".stripMargin)
    val s = meta.schemas.head._2
    // SURVEY §1.2's documented conventions (the wire bridge's mappings)
    assert(s("u").dataType == StringType)
    assert(s("fp").dataType == BinaryType)
    assert(s("t").dataType == LongType)
    assert(s("tn").dataType == LongType && s("tzn").dataType == LongType)
    assert(Seq("u", "fp", "t", "tn", "tzn").flatMap(n =>
      FieldIds.physicalOf(s(n))) ==
      Seq("uuid", "fixed[16]", "time", "timestamp_ns", "timestamptz_ns"))
    // physical annotations survive an export rendering (round trip)
    val root = Files.createTempDirectory("graft-impuu").toString
    val cat = new GraftCatalog(root)
    cat.createTable("u",
      Seq(CompactionRunner.DataFileTask("/a.parquet", 1)), Some(s))
    val doc = Files.readString(IcebergMetadataJson.export(cat, root, "u"))
    for (t <- Seq("\"uuid\"", "\"fixed[16]\"", "\"time\"",
      "\"timestamp_ns\"", "\"timestamptz_ns\""))
      assert(doc.contains(t), s"export must render $t: ${doc.take(600)}")
  }

  test("timestamp_ns values round-trip import -> export -> re-import bit-exact") {
    // the ns mapping is a LONG of nanos-from-epoch (lossless, SURVEY
    // §1.2); this proves the DATA keeps sub-microsecond digits through
    // the whole import -> export -> re-import cycle, not just the
    // schema declaration
    val dir = Files.createTempDirectory("graft-impns").toString
    val base = 1700000000000000000L
    val vals = Seq(base + 123L, base + 1999L, base + 456789L)
    assert(vals.forall(_ % 1000 != 0), "fixture must exercise sub-us digits")
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("k", "tn").coalesce(1).write.parquet(s"$dir/stage")
    val p = CompactionRunner.listParquet(s"$dir/stage").head
    val mp = handChain(dir, Seq(IcebergManifest.ManifestEntry(
      IcebergManifest.StatusAdded,
      DataFileStats(p, Files.size(java.nio.file.Paths.get(p)), 3,
        Map.empty, Map.empty, Map.empty),
      sequenceNumber = 1)),
      StructType(Seq(StructField("k", LongType), StructField("tn", LongType))),
      """{"id":1,"name":"k","required":false,"type":"long"},
        |{"id":2,"name":"tn","required":false,"type":"timestamp_ns"}"""
        .stripMargin)
    val root = Files.createTempDirectory("graft-impns-r").toString
    val cat = new GraftCatalog(root)
    cat.importTable("t", mp)
    def tns(c: GraftCatalog): Seq[Long] =
      c.scanTable(spark, "t").select("tn").collect().map(_.getLong(0)).toSeq.sorted
    assert(tns(cat) == vals, "import must keep every ns digit")
    assert(cat.currentSchema("t").exists(s =>
      FieldIds.physicalOf(s("tn")).contains("timestamp_ns")))
    val out = IcebergMetadataJson.export(cat, root, "t")
    assert(Files.readString(out).contains("\"timestamp_ns\""))
    val root2 = Files.createTempDirectory("graft-impns-r2").toString
    val cat2 = new GraftCatalog(root2)
    cat2.importTable("t", out.toString)
    assert(tns(cat2) == vals,
      "export -> re-import must preserve ns precision bit-exact")
    assert(cat2.currentSchema("t").exists(s =>
      FieldIds.physicalOf(s("tn")).contains("timestamp_ns")))
  }

  test("uuid and fixed bounds encode/decode per the spec's byte layout") {
    // Appendix D: uuid serializes as 16 bytes big-endian
    val u = "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    val ub = IcebergSingleValue.encode(StringType, u, Some("uuid")).get
    assert(ub.map(b => f"${b & 0xff}%02x").mkString ==
      u.replace("-", ""), "uuid bytes must be the canonical digits, BE")
    assert(IcebergSingleValue.decode(StringType, ub, Some("uuid")).contains(u))
    // WITHOUT the annotation the same string is UTF-8 (36 bytes) — the
    // annotation is what keeps the two domains apart
    assert(IcebergSingleValue.encode(StringType, u).get.length == 36)
    // fixed[4]: raw length-checked bytes, hex string domain
    val fb = IcebergSingleValue.encode(BinaryType, "DEADBEEF", Some("fixed[4]")).get
    assert(fb.toSeq == Seq(0xde, 0xad, 0xbe, 0xef).map(_.toByte))
    assert(IcebergSingleValue.decode(BinaryType, fb, Some("fixed[4]"))
      .contains("deadbeef"))
    // wrong length drops, never corrupts
    assert(IcebergSingleValue.encode(BinaryType, "DEADBEEF", Some("fixed[8]")).isEmpty)
    assert(IcebergSingleValue.decode(BinaryType, fb, Some("fixed[8]")).isEmpty)
    assert(IcebergSingleValue.decode(StringType,
      Array[Byte](1, 2, 3), Some("uuid")).isEmpty)
  }

  test("parser: nested types, partition spec, and sort order bind by field id") {
    val meta = IcebergImport.parse(
      """{"format-version":2,"table-uuid":"u","location":"/x",
        |"last-column-id":9,
        |"current-schema-id":3,
        |"schemas":[{"schema-id":3,"type":"struct","fields":[
        |  {"id":1,"name":"k","required":true,"type":"long"},
        |  {"id":2,"name":"tags","required":false,"type":
        |    {"type":"list","element-id":7,"element":"string","element-required":false}},
        |  {"id":3,"name":"attrs","required":false,"type":
        |    {"type":"map","key-id":8,"key":"string","value-id":9,
        |     "value":"double","value-required":true}},
        |  {"id":4,"name":"pt","required":false,"type":
        |    {"type":"struct","fields":[
        |      {"id":5,"name":"x","required":false,"type":"double"}]}}]}],
        |"default-spec-id":2,
        |"partition-specs":[
        |  {"spec-id":0,"fields":[]},
        |  {"spec-id":2,"fields":[{"name":"k_bucket","transform":"bucket[8]",
        |    "source-id":1,"field-id":1000}]}],
        |"default-sort-order-id":4,
        |"sort-orders":[{"order-id":0,"fields":[]},
        |  {"order-id":4,"fields":[{"transform":"identity","source-id":1,
        |    "direction":"asc","null-order":"nulls-first"}]}],
        |"current-snapshot-id":-1,"snapshots":[]}""".stripMargin)
    assert(meta.currentSnapshotId.isEmpty)
    val s = meta.schemas.head._2
    assert(s("k").dataType == LongType && !s("k").nullable)
    assert(s("tags").dataType == ArrayType(StringType, containsNull = true))
    assert(s("attrs").dataType ==
      MapType(StringType, DoubleType, valueContainsNull = false))
    assert(s("pt").dataType.asInstanceOf[StructType]("x").dataType == DoubleType)
    assert(FieldIds.allIds(s).sorted == Seq(1, 2, 3, 4, 5))
    assert(meta.partitionFields ==
      Seq(GraftCatalog.PartitionFieldDef("k_bucket", "bucket[8]", "k")))
    assert(meta.sortColumns == Seq("k"))
    // a spec whose source id cannot bind imports as NO spec (all-or-nothing)
    val noBind = IcebergImport.parse(
      """{"format-version":2,"current-schema-id":0,
        |"schemas":[{"schema-id":0,"type":"struct","fields":[
        |  {"id":1,"name":"k","required":false,"type":"long"}]}],
        |"default-spec-id":0,
        |"partition-specs":[{"spec-id":0,"fields":[
        |  {"name":"gone","transform":"identity","source-id":42,"field-id":1000}]}],
        |"current-snapshot-id":-1,"snapshots":[]}""".stripMargin)
    assert(noBind.partitionFields.isEmpty)
  }
}
