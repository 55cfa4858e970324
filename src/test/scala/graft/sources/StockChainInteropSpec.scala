package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** Round-trip interop through a SECOND manifest-writer implementation.
  *
  * The import path's other spec coverage decodes stock-shaped manifests
  * that are hand-built per test; this suite goes further: a self-contained
  * STOCK WRITER TWIN ([[StockWriterTwin]]) that emits a complete
  * multi-snapshot merge-on-read chain — data files, a position-delete row
  * file, an equality delete, manifest lists, `metadata.json` — using raw
  * Avro with the spec's field names, nullable unions, positional layout,
  * and sequence-number inheritance, sharing ZERO code with
  * [[IcebergManifest]]'s writer (whose dialect deviations — name-keyed
  * partition tuples, always-explicit sequence numbers — it deliberately
  * does not follow). The catalog must mount the chain, serve the exact
  * MoR row set, time-travel it, and compact it in place.
  *
  * This is the reference's whole job on a table it did not write
  * (`core/src/compaction/mod.rs:90-171`), driven end-to-end from a writer
  * that is not this library.
  */
class StockChainInteropSpec extends SparkSpec {

  import spark.implicits._

  /** A minimal independent Iceberg v2 metadata writer: spec field names,
    * nullable unions for optional fields, binary single-value bounds
    * written inline (big/little-endian per type, not via the library's
    * codec), entry `sequence_number` left NULL to exercise manifest-list
    * inheritance.
    */
  private object StockWriterTwin {

    private val kvBytes: Schema = SchemaBuilder.array().items(
      SchemaBuilder.record("k126_v127").fields()
        .requiredInt("key").requiredBytes("value").endRecord())

    private val dataFile: Schema = SchemaBuilder.record("r2").fields()
      .requiredInt("content")
      .requiredString("file_path")
      .requiredString("file_format")
      // unpartitioned: the spec's empty positional struct
      .name("partition").`type`(
        SchemaBuilder.record("r102").fields().endRecord()).noDefault()
      .requiredLong("record_count")
      .requiredLong("file_size_in_bytes")
      .name("lower_bounds").`type`().optional().`type`(kvBytes)
      .name("upper_bounds").`type`().optional().`type`(kvBytes)
      .name("equality_ids").`type`().optional().array().items().intType()
      .endRecord()

    private val entrySchema: Schema =
      SchemaBuilder.record("manifest_entry").fields()
        .requiredInt("status")
        .name("snapshot_id").`type`().optional().longType()
        .name("sequence_number").`type`().optional().longType()
        .name("file_sequence_number").`type`().optional().longType()
        .name("data_file").`type`(dataFile).noDefault()
        .endRecord()

    private val listSchema: Schema =
      SchemaBuilder.record("manifest_file").fields()
        .requiredString("manifest_path")
        .requiredLong("manifest_length")
        .requiredInt("partition_spec_id")
        .requiredInt("content")
        .requiredLong("sequence_number")
        .requiredLong("min_sequence_number")
        .requiredLong("added_snapshot_id")
        .requiredInt("added_files_count")
        .requiredInt("existing_files_count")
        .requiredInt("deleted_files_count")
        .requiredLong("added_rows_count")
        .requiredLong("existing_rows_count")
        .requiredLong("deleted_rows_count")
        .endRecord()

    final case class File(
        path: String,
        content: Int, // 0 data, 1 pos-deletes, 2 eq-deletes
        records: Long,
        loK: Option[Long] = None,
        hiK: Option[Long] = None,
        eqIds: Seq[Int] = Nil)

    private def le8(n: Long): Array[Byte] =
      Array.tabulate(8)(i => ((n >>> (8 * i)) & 0xff).toByte)

    private def kvRec(key: Int, v: Array[Byte]): GenericRecord = {
      val r = new GenericData.Record(kvBytes.getElementType)
      r.put("key", key)
      r.put("value", java.nio.ByteBuffer.wrap(v))
      r
    }

    /** One manifest of `files`, added at `snapshotId`; entry seq NULL
      * (inherited from the list row, the stock writer convention).
      */
    def writeManifest(path: String, snapshotId: Long, files: Seq[File]): Unit = {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](entrySchema))
      w.create(entrySchema, new java.io.File(path))
      try files.foreach { f =>
        val df = new GenericData.Record(dataFile)
        df.put("content", f.content)
        df.put("file_path", f.path)
        df.put("file_format", "PARQUET")
        df.put("partition",
          new GenericData.Record(dataFile.getField("partition").schema()))
        df.put("record_count", f.records)
        df.put("file_size_in_bytes", Files.size(Paths.get(f.path)))
        df.put("lower_bounds",
          f.loK.map(v => java.util.List.of(kvRec(1, le8(v)))).orNull)
        df.put("upper_bounds",
          f.hiK.map(v => java.util.List.of(kvRec(1, le8(v)))).orNull)
        df.put("equality_ids",
          if (f.eqIds.isEmpty) null
          else {
            val l = new java.util.ArrayList[Integer]()
            f.eqIds.foreach(i => l.add(Integer.valueOf(i)))
            l
          })
        val rec = new GenericData.Record(entrySchema)
        rec.put("status", 1) // ADDED
        rec.put("snapshot_id", snapshotId)
        rec.put("sequence_number", null) // inherit from the list row
        rec.put("file_sequence_number", null)
        rec.put("data_file", df)
        w.append(rec)
      } finally w.close()
    }

    /** One manifest-list row per (manifest, its commit seq). */
    def writeList(path: String, rows: Seq[(String, Int, Long, Long)]): Unit = {
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](listSchema))
      w.create(listSchema, new java.io.File(path))
      try rows.foreach { case (mp, content, seq, addedAt) =>
        val r = new GenericData.Record(listSchema)
        r.put("manifest_path", mp)
        r.put("manifest_length", Files.size(Paths.get(mp)))
        r.put("partition_spec_id", 0)
        r.put("content", content)
        r.put("sequence_number", seq)
        r.put("min_sequence_number", seq)
        r.put("added_snapshot_id", addedAt)
        r.put("added_files_count", 1)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", 0L)
        r.put("existing_rows_count", 0L)
        r.put("deleted_rows_count", 0L)
        w.append(r)
      } finally w.close()
    }

    def writeMetadata(
        dir: String,
        lists: Seq[(Long, String)]): String = { // (snapshotId == seq, listPath)
      val snaps = lists.map { case (id, lp) =>
        val parent =
          if (id > 1) s""""parent-snapshot-id":${id - 1},""" else ""
        s"""{"snapshot-id":$id,"sequence-number":$id,$parent
           |"timestamp-ms":${id * 1000},"manifest-list":"$lp",
           |"summary":{"operation":"append"}}""".stripMargin.replace("\n", "")
      }.mkString(",")
      val head = lists.map(_._1).max
      val mp = s"$dir/v$head.metadata.json"
      Files.writeString(Paths.get(mp),
        s"""{"format-version":2,"table-uuid":"stock-twin","location":"$dir",
           |"last-sequence-number":$head,"last-column-id":2,
           |"current-schema-id":0,
           |"schemas":[{"schema-id":0,"type":"struct","fields":[
           |  {"id":1,"name":"k","required":false,"type":"long"},
           |  {"id":2,"name":"v","required":false,"type":"string"}]}],
           |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
           |"last-partition-id":999,"default-sort-order-id":0,
           |"sort-orders":[{"order-id":0,"fields":[]}],
           |"current-snapshot-id":$head,"snapshots":[$snaps]}""".stripMargin)
      mp
    }
  }

  private def oneParquet(dir: String, df: org.apache.spark.sql.DataFrame): String = {
    df.coalesce(1).write.parquet(dir)
    CompactionRunner.listParquet(dir).head
  }

  test("a chain written entirely by the stock twin mounts, MoR-reads, and compacts") {
    import StockWriterTwin._
    val dir = Files.createTempDirectory("graft-stocktwin").toString

    // snapshot 1: two data files, 0..99 and 100..199
    val d1 = oneParquet(s"$dir/d1",
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v"))
    val d2 = oneParquet(s"$dir/d2",
      (100L until 200L).map(k => (k, s"v$k")).toDF("k", "v"))
    writeManifest(s"$dir/m1.avro", 1L, Seq(
      File(d1, 0, 100, loK = Some(0), hiK = Some(99)),
      File(d2, 0, 100, loK = Some(100), hiK = Some(199))))

    // snapshot 2: a position-delete ROW FILE — k=3 (d1 pos 3), k=107 (d2 pos 7)
    val pd = oneParquet(s"$dir/pd",
      Seq((d1, 3L), (d2, 7L)).toDF("file_path", "pos"))
    writeManifest(s"$dir/m2.avro", 2L, Seq(File(pd, 1, 2)))

    // snapshot 3: an equality delete keyed on field id 1 (k), k=150
    val eq = oneParquet(s"$dir/eq", Seq(Tuple1(150L)).toDF("k"))
    writeManifest(s"$dir/m3.avro", 3L, Seq(File(eq, 2, 1, eqIds = Seq(1))))

    // manifest lists (stock append shape: each snapshot re-lists history)
    writeList(s"$dir/l1.avro", Seq((s"$dir/m1.avro", 0, 1L, 1L)))
    writeList(s"$dir/l2.avro", Seq(
      (s"$dir/m1.avro", 0, 1L, 1L), (s"$dir/m2.avro", 1, 2L, 2L)))
    writeList(s"$dir/l3.avro", Seq(
      (s"$dir/m1.avro", 0, 1L, 1L), (s"$dir/m2.avro", 1, 2L, 2L),
      (s"$dir/m3.avro", 1, 3L, 3L)))
    val metaPath = writeMetadata(dir, Seq(
      (1L, s"$dir/l1.avro"), (2L, s"$dir/l2.avro"), (3L, s"$dir/l3.avro")))

    val root = Files.createTempDirectory("graft-stocktwin-r").toString
    val cat = new GraftCatalog(root)
    cat.importTable("t", metaPath)

    // entry fidelity: null entry seq inherited from list rows; bounds
    // decoded from the twin's inline binary encoding; eq ids bound
    val ents = cat.loadEntries("t")
    assert(ents.count(_.kind == "data") == 2)
    assert(ents.filter(_.kind == "data").forall(e =>
      e.stats.exists(s => s.colMins.get("k").exists(_.forall(_.isDigit)))))
    assert(ents.exists(e => e.kind == "posdel" && e.seqNum == 2L))
    assert(ents.exists(e =>
      e.kind == "eqdel" && e.seqNum == 3L && e.eqCols == Seq("k")))

    // THE MoR read: 200 rows minus pos-deleted {3, 107} minus eq-deleted {150}
    val expect = (0L until 200L).filterNot(Set(3L, 107L, 150L))
      .map(k => (k, s"v$k")).toSet
    assert(cat.scanTable(spark, "t").as[(Long, String)].collect().toSet == expect)
    // time travel: before the deletes, all 200 rows
    assert(cat.scanTableAt(spark, "t", 1L).count() == 200)
    assert(cat.scanTableAt(spark, "t", 2L).count() == 198)

    // compaction of the foreign chain: deletes retire, content identical,
    // output lands under the importing root
    cat.compactTable(spark, "t", s"$root/t/_data/compacted")
    val after = cat.loadEntries("t")
    assert(after.forall(_.kind == "data"),
      s"compaction must retire the twin's delete files: $after")
    assert(after.forall(_.path.contains(root)))
    assert(cat.scanTable(spark, "t").as[(Long, String)].collect().toSet == expect)
  }
}
