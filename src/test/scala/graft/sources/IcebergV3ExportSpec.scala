package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** The Iceberg-v3 delete-file export chain, end to end: a stock reader
  * walking `metadata.json` → the head snapshot's Avro manifest list →
  * the delete manifest must DISCOVER every Puffin deletion vector (one
  * entry per blob, `referenced_data_file`/`content_offset`/
  * `content_size_in_bytes`) and every equality-delete file
  * (`content` = 2, `equality_ids`), and decode the vectors to exactly
  * the positions the catalog itself serves. Delete-free tables must
  * keep exporting `format-version` 2.
  */
class IcebergV3ExportSpec extends SparkSpec {

  private def mount(root: String): String = {
    val g = s"gv3_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    g
  }

  test("exported metadata discovers and resolves every DV blob and eq delete") {
    val root = Files.createTempDirectory("graft-v3exp").toString
    val g = mount(root)
    spark.sql(
      s"""CREATE TABLE $g.t (k BIGINT, v STRING)
         |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 2000)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(2000, 4000)")
    // untranslatable -> parquet pos-deletes; migrate them to Puffin DVs
    spark.sql(s"DELETE FROM $g.t WHERE k % 31 = 4")
    spark.sql(s"CALL $g.system.rewrite_position_delete_files('t', " +
      "as_deletion_vectors => true)").collect()
    // key equality -> a pending eq-delete file (content 2 in the export)
    spark.sql(s"DELETE FROM $g.t WHERE k IN (1, 1000, 3999)")
    val cat = new GraftCatalog(root)
    val dvEntries = cat.loadEntries("t").filter(e =>
      e.kind == "posdel" && e.format == "dv")
    assert(dvEntries.nonEmpty, "fixture must hold deletion vectors")
    assert(cat.loadEntries("t").exists(_.kind == "eqdel"))

    val metaPath = IcebergMetadataJson.export(cat, root, "t")
    val text = Files.readString(metaPath)
    assert(text.contains("\"format-version\":3"),
      "a DV-bearing table must export format-version 3")

    // hop 1: metadata.json -> the HEAD snapshot's manifest list
    val meta = spark.read.option("multiLine", "true").json(metaPath.toString)
    import org.apache.spark.sql.functions._
    val head = meta.head().getAs[Long]("current-snapshot-id")
    val listPath = meta.select(explode(col("snapshots")).as("s"))
      .select(col("s.snapshot-id").as("id"), col("s.manifest-list").as("ml"))
      .collect().find(_.getAs[Long]("id") == head).get.getAs[String]("ml")
    val conf = new org.apache.hadoop.conf.Configuration()
    val manifests = IcebergManifest.readList(listPath, conf)
    assert(manifests.map(_.content).sorted == Seq(0, 1),
      s"head list must carry one data and one delete manifest: $manifests")

    // hop 2: the delete manifest's entries
    val schema = cat.currentSchema("t").get
    val delManifest = manifests.find(_.content == 1).get
    assert(Files.size(java.nio.file.Paths.get(delManifest.manifestPath)) ==
      delManifest.manifestLength)
    val entries = IcebergManifest.read(delManifest.manifestPath, schema, conf)
    val dvs = entries.filter(_.format == "puffin")
    val eqs = entries.filter(_.content == IcebergManifest.ContentEqualityDeletes)
    assert(dvs.nonEmpty && eqs.nonEmpty)
    assert(dvs.forall(e => e.content == IcebergManifest.ContentPositionDeletes &&
      e.referencedDataFile.isDefined && e.contentOffset.isDefined &&
      e.contentSizeInBytes.isDefined && e.sequenceNumber > 0))
    assert(eqs.forall(_.equalityIds.nonEmpty),
      s"eq-delete entries must carry equality_ids: $eqs")

    // hop 3: decode each blob AT the manifest's offset/size — byte-level
    // discovery, no reliance on this library's footer reader
    val decoded: Map[String, Array[Long]] = dvs.map { e =>
      val bytes = Files.readAllBytes(java.nio.file.Paths.get(
        e.file.path.stripPrefix("file:")))
      val blob = bytes.slice(e.contentOffset.get.toInt,
        (e.contentOffset.get + e.contentSizeInBytes.get).toInt)
      // deletion-vector-v1 blob: len(i32 BE) | magic | vector | crc(i32 BE)
      val vector = blob.slice(8, blob.length - 4)
      val positions = Puffin.deserializeBitmap64(vector)
      assert(positions.length == e.file.recordCount,
        "manifest record_count must equal the blob's cardinality")
      e.referencedDataFile.get -> positions
    }.toMap
    // ...and the union matches the catalog's own decode exactly
    val own: Map[String, Array[Long]] = dvEntries.flatMap(e =>
      DeletionVectors.read(e.path, conf)).toMap
    assert(decoded.keySet == own.keySet.map(CompactionRunner.canonPath) ||
      decoded.keySet == own.keySet,
      s"referenced files differ: ${decoded.keySet} vs ${own.keySet}")
    own.foreach { case (f, ps) =>
      val got = decoded.getOrElse(f, decoded(CompactionRunner.canonPath(f)))
      assert(got.toSeq == ps.toSeq, s"positions differ for $f")
    }

    // the data manifest inventories the live data files with their seqs
    val dataEntries = IcebergManifest.read(
      manifests.find(_.content == 0).get.manifestPath, schema, conf)
    assert(dataEntries.map(_.file.path).toSet ==
      cat.loadEntries("t").filter(_.kind == "data").map(_.path).toSet)
    assert(dataEntries.forall(_.content == IcebergManifest.ContentData))
  }

  test("v3 export carries row lineage, real operations, sort order, and spec field ids") {
    val root = Files.createTempDirectory("graft-v3exp4").toString
    val g = mount(root)
    spark.sql(
      s"""CREATE TABLE $g.t (k BIGINT, v STRING)
         |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 500)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(500, 900)")
    spark.sql(s"ALTER TABLE $g.t WRITE ORDERED BY k")
    spark.sql(s"DELETE FROM $g.t WHERE k % 11 = 3")
    spark.sql(s"CALL $g.system.rewrite_position_delete_files('t', " +
      "as_deletion_vectors => true)").collect()
    val cat = new GraftCatalog(root)
    val metaPath = IcebergMetadataJson.export(cat, root, "t")
    val text = Files.readString(metaPath)
    assert(text.contains("\"format-version\":3"))

    // v3 row lineage: next-row-id covers every data row ever added
    val meta = spark.read.option("multiLine", "true").json(metaPath.toString)
    import org.apache.spark.sql.functions._
    val nextRowId = meta.head().getAs[Long]("next-row-id")
    assert(nextRowId >= 900L, s"next-row-id must cover all added rows: $nextRowId")

    // real per-snapshot operations, not a hardcoded "append"
    val ops = meta.select(explode(col("snapshots")).as("s"))
      .select(col("s.summary.operation")).collect().map(_.getString(0)).toSeq
    // create = metadata, two inserts = append, the DELETE and the DV
    // migration (delete files swapped, data untouched) = delete
    assert(ops == Seq("metadata", "append", "append", "delete", "delete"),
      s"operations must reflect the commit history: $ops")

    // declared write order exports as sort-order 1, identity asc
    assert(text.contains("\"default-sort-order-id\":1"), text)
    assert(text.contains("\"transform\":\"identity\"") &&
      text.contains("\"direction\":\"asc\""), text)

    // manifests: first_row_id blocks are disjoint and monotonic; every
    // entry records the snapshot that added its file
    val head = meta.head().getAs[Long]("current-snapshot-id")
    val listPath = meta.select(explode(col("snapshots")).as("s"))
      .select(col("s.snapshot-id").as("id"), col("s.manifest-list").as("ml"))
      .collect().find(_.getAs[Long]("id") == head).get.getAs[String]("ml")
    val conf = new org.apache.hadoop.conf.Configuration()
    val manifests = IcebergManifest.readList(listPath, conf)
    val dataManifest = manifests.find(_.content == 0).get
    val schema = cat.currentSchema("t").get
    val dataEntries = IcebergManifest.read(dataManifest.manifestPath, schema, conf)
    assert(dataEntries.forall(e => e.firstRowId.isDefined && e.snapshotId.isDefined))
    val blocks = dataEntries
      .map(e => (e.firstRowId.get, e.firstRowId.get + e.file.recordCount))
      .sortBy(_._1)
    blocks.sliding(2).foreach {
      case Seq((_, end), (start, _)) =>
        assert(start >= end, s"row-id blocks must not overlap: $blocks")
      case _ => ()
    }
    assert(blocks.forall(_._1 < nextRowId) &&
      blocks.map(_._2).max <= nextRowId)
    assert(dataManifest.firstRowId.contains(blocks.map(_._1).min),
      "the manifest-list row carries its lowest entry block")
    // entries added by DIFFERENT commits carry different snapshot ids
    assert(dataEntries.map(_.snapshotId.get).distinct.size >= 1 &&
      dataEntries.forall(_.snapshotId.get <= head))

    // the Avro schema carries the spec's field-id attributes
    val avroReader = new org.apache.avro.file.DataFileReader(
      new java.io.File(dataManifest.manifestPath),
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val writerSchema = avroReader.getSchema
    avroReader.close()
    assert(writerSchema.getField("status").getObjectProp("field-id") == (0: Integer))
    assert(writerSchema.getField("snapshot_id").getObjectProp("field-id") == (1: Integer))
    assert(writerSchema.getField("data_file").getObjectProp("field-id") == (2: Integer))
    val df = writerSchema.getField("data_file").schema()
    assert(df.getField("file_path").getObjectProp("field-id") == (100: Integer))
    assert(df.getField("partition").getObjectProp("field-id") == (102: Integer))
    assert(df.getField("first_row_id").getObjectProp("field-id") == (142: Integer))
    assert(df.getField("referenced_data_file").getObjectProp("field-id") == (143: Integer))
  }

  test("partition tuples round-trip through the manifest export") {
    val root = Files.createTempDirectory("graft-v3exp5").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    spark.sql(s"INSERT INTO $g.t VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    val cat = new GraftCatalog(root)
    IcebergMetadataJson.export(cat, root, "t")
    val conf = new org.apache.hadoop.conf.Configuration()
    val head = cat.currentSnapshotId("t")
    val manifests = IcebergManifest.readList(
      s"$root/t/snap-$head-manifest-list.avro", conf)
    val entries = IcebergManifest.read(
      manifests.find(_.content == 0).get.manifestPath,
      cat.currentSchema("t").get, conf)
    val tuples = entries.map(_.partitionVals)
    assert(tuples.forall(_.keySet == Set("cat")), s"tuples: $tuples")
    assert(tuples.flatMap(_.values).toSet == Set("a", "b"))
    // ...and match what the catalog itself recorded per file
    val own = cat.loadEntries("t").filter(_.kind == "data")
      .map(e => CompactionRunner.canonPath(e.path) -> e.partitionVals).toMap
    entries.foreach { e =>
      assert(own(CompactionRunner.canonPath(e.file.path)) == e.partitionVals)
    }
  }

  test("delete-free exports stay format-version 2 with a data-only list") {
    val root = Files.createTempDirectory("graft-v3exp2").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT)")
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(0, 100)")
    val cat = new GraftCatalog(root)
    val metaPath = IcebergMetadataJson.export(cat, root, "t")
    assert(Files.readString(metaPath).contains("\"format-version\":2"))
    val meta = spark.read.option("multiLine", "true").json(metaPath.toString)
    import org.apache.spark.sql.functions._
    val lists = meta.select(explode(col("snapshots")).as("s"))
      .select(col("s.manifest-list")).collect().map(_.getString(0))
    val conf = new org.apache.hadoop.conf.Configuration()
    lists.foreach { lp =>
      val ms = IcebergManifest.readList(lp, conf)
      assert(ms.forall(_.content == 0), s"unexpected delete manifest in $lp")
    }
  }

  test("parquet pos-delete files export as content 1 without DV fields, still v2") {
    val root = Files.createTempDirectory("graft-v3exp3").toString
    val g = mount(root)
    spark.sql(
      s"""CREATE TABLE $g.t (k BIGINT)
         |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $g.t SELECT id FROM range(0, 1000)")
    spark.sql(s"DELETE FROM $g.t WHERE k % 17 = 3") // parquet pos-deletes
    val cat = new GraftCatalog(root)
    val metaPath = IcebergMetadataJson.export(cat, root, "t")
    // row-file deletes are v2-legal — no DV, no v3 bump
    assert(Files.readString(metaPath).contains("\"format-version\":2"))
    val meta = spark.read.option("multiLine", "true").json(metaPath.toString)
    import org.apache.spark.sql.functions._
    val head = meta.head().getAs[Long]("current-snapshot-id")
    val listPath = meta.select(explode(col("snapshots")).as("s"))
      .select(col("s.snapshot-id").as("id"), col("s.manifest-list").as("ml"))
      .collect().find(_.getAs[Long]("id") == head).get.getAs[String]("ml")
    val conf = new org.apache.hadoop.conf.Configuration()
    val del = IcebergManifest.readList(listPath, conf).find(_.content == 1).get
    val entries = IcebergManifest.read(
      del.manifestPath, cat.currentSchema("t").get, conf)
    assert(entries.nonEmpty && entries.forall(e =>
      e.content == IcebergManifest.ContentPositionDeletes &&
        e.format == "parquet" && e.referencedDataFile.isEmpty))
  }
}
