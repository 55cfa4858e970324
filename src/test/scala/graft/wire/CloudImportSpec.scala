package graft.wire

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{CompactionRunner, FieldIds, GraftCatalog, IcebergManifest}
import graft.sources.CompactionRunner.DataFileStats
import org.apache.spark.sql.types._

/** The import walk over every object-store FileIO this library speaks —
  * ONE parameterized chain builder driven across s3:// (S3 REST), wasb://
  * (Azure Blob REST), and gs:// (GCS XML, S3-interoperable): the
  * reference's deployment shape (catalog pointer local, metadata +
  * manifests + data + delete files all in the store) must mount,
  * MoR-read, and compact identically whichever store holds the chain.
  * The per-protocol read/write mechanics live in [[CloudFileIoSpec]] /
  * S3FileIoSpec; this suite exercises the IMPORT walk on top of each.
  */
class CloudImportSpec extends SparkSpec {

  import spark.implicits._

  private val handSchemaFields =
    """{"id":1,"name":"k","required":false,"type":"long"},
      |{"id":2,"name":"v","required":false,"type":"string"}""".stripMargin

  private val handSchema: StructType = StructType(Seq(
    FieldIds.withFieldId(StructField("k", LongType), 1),
    FieldIds.withFieldId(StructField("v", StringType), 2)))

  private final case class Store(
      name: String, base: String, conf: Map[String, String],
      close: () => Unit)

  private def stores(): Seq[Store] = Seq(
    {
      val s3 = new S3StubServer()
      Store("s3", "s3://bucket/w", Map(
        "fs.s3.impl" -> "graft.wire.S3ClientFileSystem",
        "fs.s3.endpoint" -> s3.endpoint,
        // endpoint resolution prefers the Iceberg-mapped fs.s3a.endpoint;
        // a prior suite may have left a dead port there on the shared
        // session conf — set both (same posture as IcebergImportSpec)
        "fs.s3a.endpoint" -> s3.endpoint,
        "fs.s3.impl.disable.cache" -> "true"), () => s3.close())
    },
    {
      val az = new AzureBlobStubServer()
      Store("wasb", "wasb://warehouse@acct/w", Map(
        "fs.wasb.impl" -> "graft.wire.AzureBlobFileSystem",
        "fs.azure.endpoint" -> az.endpoint,
        "fs.wasb.impl.disable.cache" -> "true"), () => az.close())
    },
    {
      val gcs = new S3StubServer() // GCS XML API = the S3 dialect
      Store("gs", "gs://warehouse/w", Map(
        "fs.gs.impl" -> "graft.wire.GcsClientFileSystem",
        "fs.gs.endpoint" -> gcs.endpoint,
        "fs.gs.impl.disable.cache" -> "true"), () => gcs.close())
    })

  test("a foreign chain imports, MoR-reads, and compacts on every store") {
    for (store <- stores()) try {
      WireBridge.applyFileIo(spark, store.conf)
      val conf = spark.sessionState.newHadoopConf()
      def putBytes(key: String, bytes: Array[Byte]): Unit = {
        val p = new org.apache.hadoop.fs.Path(s"${store.base}/$key")
        val out = p.getFileSystem(conf).create(p, true)
        try out.write(bytes) finally out.close()
      }
      // stage the data + pos-delete parquet locally, copy into the store
      val local = Files.createTempDirectory(s"graft-cimp-${store.name}").toString
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$local/d")
      putBytes("data/d1.parquet", Files.readAllBytes(java.nio.file.Paths.get(
        CompactionRunner.listParquet(s"$local/d").head)))
      Seq((s"${store.base}/data/d1.parquet", 0L),
        (s"${store.base}/data/d1.parquet", 7L))
        .toDF("file_path", "pos").coalesce(1).write.parquet(s"$local/pd")
      putBytes("data/pd1.parquet", Files.readAllBytes(java.nio.file.Paths.get(
        CompactionRunner.listParquet(s"$local/pd").head)))
      val entries = Seq(
        IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
          DataFileStats(s"${store.base}/data/d1.parquet", 1, 100,
            Map("k" -> "0"), Map("k" -> "99"), Map.empty),
          sequenceNumber = 1),
        IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
          DataFileStats(s"${store.base}/data/pd1.parquet", 1, 2,
            Map.empty, Map.empty, Map.empty),
          content = IcebergManifest.ContentPositionDeletes,
          sequenceNumber = 2))
      IcebergManifest.write(s"${store.base}/meta/m0.avro", entries,
        handSchema, conf)
      val mLen = {
        val p = new org.apache.hadoop.fs.Path(s"${store.base}/meta/m0.avro")
        p.getFileSystem(conf).getFileStatus(p).getLen
      }
      IcebergManifest.writeList(s"${store.base}/meta/list1.avro",
        Seq(IcebergManifest.ManifestFile(s"${store.base}/meta/m0.avro", mLen,
          partitionSpecId = 0, content = 0, sequenceNumber = 2,
          minSequenceNumber = 1, addedSnapshotId = 1, addedFilesCount = 2,
          existingFilesCount = 0, deletedFilesCount = 0, addedRowsCount = 102,
          existingRowsCount = 0, deletedRowsCount = 0)), conf)
      putBytes("meta/v1.metadata.json",
        s"""{"format-version":2,"table-uuid":"cloud-${store.name}",
           |"location":"${store.base}","last-column-id":2,
           |"current-schema-id":0,
           |"schemas":[{"schema-id":0,"type":"struct","fields":[$handSchemaFields]}],
           |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
           |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
           |"current-snapshot-id":1,
           |"snapshots":[{"snapshot-id":1,"sequence-number":1,"timestamp-ms":0,
           |"manifest-list":"${store.base}/meta/list1.avro",
           |"summary":{"operation":"append"},"schema-id":0}]}""".stripMargin
          .getBytes("UTF-8"))
      val root = Files.createTempDirectory(s"graft-cimp-r-${store.name}").toString
      val cat = new GraftCatalog(root)
      cat.importTable("t", s"${store.base}/meta/v1.metadata.json", conf)
      val scan = cat.scanTable(spark, "t")
      assert(scan.count() == 98, s"${store.name}: MoR scan")
      assert(scan.filter($"k".isin(0L, 7L)).count() == 0, store.name)
      cat.compactTable(spark, "t", s"${store.base}/compacted")
      val after = cat.loadEntries("t")
      assert(after.forall(_.kind == "data"), s"${store.name}: $after")
      assert(after.forall(_.path.startsWith(s"${store.base}/compacted")),
        s"${store.name}: ${after.map(_.path)}")
      assert(cat.scanTable(spark, "t").count() == 98, store.name)
    } finally store.close()
  }
}
