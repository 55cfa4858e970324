package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

import scala.jdk.CollectionConverters._

/** The CONVERSE of [[StockChainInteropSpec]]: that suite proves this
  * library READS a chain a second implementation wrote; this one proves a
  * second implementation reads a chain this library EXPORTED — v3 Puffin
  * deletion vectors, positional partition tuples, equality deletes and
  * all. [[StockReaderTwin]] is built from public knowledge only: the
  * spec's Avro field names (generic reads — no schema literals shared
  * with [[IcebergManifest]]), jackson for `metadata.json`, the STOCK
  * `org.roaringbitmap` library for the DV blob payloads (which doubles as
  * the byte-compat proof of the hand-rolled portable serializer), and
  * `spark.read.parquet` as the row engine. It shares ZERO decode code
  * with [[IcebergManifest]]/[[Puffin]]/[[GraftCatalog]].
  */
class StockReaderInteropSpec extends SparkSpec {

  private object StockReaderTwin {

    private def readAvro(path: String): Seq[GenericRecord] = {
      val r = new DataFileReader[GenericRecord](
        new java.io.File(path.stripPrefix("file://").stripPrefix("file:")),
        new GenericDatumReader[GenericRecord]())
      try {
        val b = Seq.newBuilder[GenericRecord]
        while (r.hasNext) b += r.next()
        b.result()
      } finally r.close()
    }

    private def field(g: GenericRecord, n: String): Option[AnyRef] =
      if (g.getSchema.getField(n) == null) None else Option(g.get(n))
    private def str(g: GenericRecord, n: String): Option[String] =
      field(g, n).map(_.toString)
    private def lng(g: GenericRecord, n: String): Option[Long] =
      field(g, n).map(_.asInstanceOf[Number].longValue)
    private def int(g: GenericRecord, n: String): Option[Int] =
      field(g, n).map(_.asInstanceOf[Number].intValue)

    private def plain(p: String): String =
      p.stripPrefix("file://").stripPrefix("file:")

    private final case class Entry(
        content: Int, path: String, seq: Long, eqNames: Seq[String],
        refFile: Option[String], offset: Option[Long], size: Option[Long],
        partitionNames: Seq[String])

    /** One v3 `deletion-vector-v1` blob, decoded with the STOCK roaring
      * library: `len (i32 BE, = |magic|+|vector|) | magic D1 D3 39 64 |
      * portable 64-bit bitmap | crc32(magic+vector) (i32 BE)`.
      */
    private def readDvBlob(puffinPath: String, off: Long, len: Long): Seq[Long] = {
      val raf = new java.io.RandomAccessFile(plain(puffinPath), "r")
      val bytes = new Array[Byte](len.toInt)
      try { raf.seek(off); raf.readFully(bytes) } finally raf.close()
      val bb = java.nio.ByteBuffer.wrap(bytes) // BE by default
      val blobLen = bb.getInt
      require(blobLen + 8 == bytes.length,
        s"DV blob length mismatch: $blobLen + 8 != ${bytes.length}")
      val magic = Array.fill(4)(bb.get())
      require(magic.sameElements(Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)),
        "bad deletion-vector magic")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, 4, blobLen)
      val stored = java.nio.ByteBuffer.wrap(bytes, 4 + blobLen, 4).getInt
      require(crc.getValue.toInt == stored, "DV blob crc mismatch")
      val rb = new org.roaringbitmap.longlong.Roaring64NavigableMap()
      rb.deserializePortable(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes, 8, blobLen - 4)))
      val out = Seq.newBuilder[Long]
      val it = rb.iterator()
      while (it.hasNext) out += it.next()
      out.result()
    }

    /** Scan the chain at `metaPath`'s current snapshot and return the
      * surviving (k, v) rows — MoR semantics applied by THIS reader.
      */
    def scan(
        spark: org.apache.spark.sql.SparkSession,
        metaPath: String): Set[(Long, String)] = {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val meta = om.readTree(Files.readString(java.nio.file.Paths.get(metaPath)))
      val headId = meta.get("current-snapshot-id").asLong
      val snap = meta.get("snapshots").elements.asScala
        .find(_.get("snapshot-id").asLong == headId).get
      // field id -> name (eq-delete key binding)
      val schemaId = Option(snap.get("schema-id")).map(_.asInt)
        .getOrElse(meta.get("current-schema-id").asInt)
      val nameById: Map[Int, String] = meta.get("schemas").elements.asScala
        .find(_.get("schema-id").asInt == schemaId).get
        .get("fields").elements.asScala
        .map(f => f.get("id").asInt -> f.get("name").asText).toMap
      val entries: Seq[Entry] = readAvro(snap.get("manifest-list").asText)
        .flatMap { mrow =>
          val mseq = lng(mrow, "sequence_number").getOrElse(0L)
          readAvro(str(mrow, "manifest_path").get).flatMap { e =>
            if (int(e, "status").contains(2)) None // DELETED entries drop
            else {
              val df = e.get("data_file").asInstanceOf[GenericRecord]
              val eqIds = field(df, "equality_ids")
                .map(_.asInstanceOf[java.util.List[_]].asScala
                  .map(_.asInstanceOf[Number].intValue).toSeq).getOrElse(Nil)
              val pnames = Option(df.getSchema.getField("partition"))
                .map(_.schema()) // may be a union with null
                .map(s => if (s.isUnion) s.getTypes.asScala
                  .find(_.getType == org.apache.avro.Schema.Type.RECORD) else Some(s))
                .flatten.filter(_.getType == org.apache.avro.Schema.Type.RECORD)
                .map(_.getFields.asScala.map(_.name).toSeq).getOrElse(Nil)
              Some(Entry(
                int(df, "content").getOrElse(0),
                str(df, "file_path").get,
                lng(e, "sequence_number").getOrElse(mseq), // inheritance
                eqIds.flatMap(nameById.get),
                str(df, "referenced_data_file"),
                lng(df, "content_offset"),
                lng(df, "content_size_in_bytes"),
                pnames))
            }
          }
        }
      // deleted positions per (plain) data file path
      val positions = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.Set[Long]]
      def kill(file: String, pos: Long): Unit =
        positions.getOrElseUpdate(plain(file),
          scala.collection.mutable.Set.empty[Long]) += pos
      entries.filter(_.content == 1).foreach { d =>
        (d.refFile, d.offset, d.size) match {
          case (Some(rf), Some(off), Some(len)) => // v3 deletion vector
            readDvBlob(d.path, off, len).foreach(kill(rf, _))
          case _ => // classic pos-delete parquet rows
            spark.read.parquet(plain(d.path))
              .select("file_path", "pos").collect()
              .foreach(r => kill(r.getString(0), r.getLong(1)))
        }
      }
      // equality deletes: key rows + the seq guard (apply to OLDER data)
      val eqs: Seq[(Seq[String], Long, Set[Seq[Any]])] =
        entries.filter(_.content == 2).map { d =>
          val keys = spark.read.parquet(plain(d.path))
            .select(d.eqNames.map(org.apache.spark.sql.functions.col): _*)
            .collect().map(_.toSeq).toSet
          (d.eqNames, d.seq, keys)
        }
      entries.filter(_.content == 0).flatMap { d =>
        val rows = spark.read.parquet(plain(d.path))
          .select(org.apache.spark.sql.functions.col("k"),
            org.apache.spark.sql.functions.col("v"),
            org.apache.spark.sql.functions.col("_metadata.row_index").as("_p"))
          .collect()
        val dead: scala.collection.Set[Long] =
          positions.getOrElse(plain(d.path),
            scala.collection.mutable.Set.empty[Long])
        rows.iterator.filter { r =>
          !dead.contains(r.getLong(2)) && eqs.forall { case (names, seq, keys) =>
            seq <= d.seq || {
              val tuple: Seq[Any] = names.map {
                case "k" => r.getLong(0)
                case "v" => r.getString(1)
                case other => fail(s"unexpected eq key $other")
              }
              !keys.contains(tuple)
            }
          }
        }.map(r => (r.getLong(0), r.getString(1))).toSeq
      }.toSet
    }
  }

  test("a graft-exported chain (v3 DVs + tuples + eq deletes) reads stock") {
    val root = Files.createTempDirectory("graft-stockread").toString
    val g = s"gsr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    spark.sql(
      s"""CREATE TABLE $g.t (k BIGINT, v STRING, seg STRING)
         |PARTITIONED BY (seg)
         |TBLPROPERTIES ('write.delete.mode'='merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id), " +
      "concat('s', id % 2) FROM range(0, 200)")
    // an untranslatable predicate -> pos-delete row files -> migrate to
    // v3 Puffin DVs; a key-equality delete -> a pending eq-delete file
    spark.sql(s"DELETE FROM $g.t WHERE k % 31 = 4")
    spark.sql(s"CALL $g.system.rewrite_position_delete_files('t', " +
      "as_deletion_vectors => true)").collect()
    spark.sql(s"DELETE FROM $g.t WHERE k IN (150, 77)")
    val cat = new GraftCatalog(root)
    val entries = cat.loadEntries("t")
    assert(entries.exists(e => e.kind == "posdel" && e.format == "dv"),
      s"fixture must carry a DV: $entries")
    assert(entries.exists(_.kind == "eqdel"), "fixture must carry an eq delete")
    val expected = spark.sql(s"SELECT k, v FROM $g.t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(expected.size == 191 &&
      !Seq(4L, 35L, 150L, 77L).exists(k => expected.exists(_._1 == k)),
      s"fixture row set unexpected: ${expected.size}")
    // export, then scan the chain with the INDEPENDENT reader
    val metaPath = IcebergMetadataJson.export(cat, root, "t").toString
    assert(Files.readString(java.nio.file.Paths.get(metaPath))
      .contains("\"format-version\":3"), "DV chains must export as v3")
    val got = StockReaderTwin.scan(spark, metaPath)
    assert(got == expected,
      s"stock reader diverged: missing ${expected -- got}, extra ${got -- expected}")
  }
}
