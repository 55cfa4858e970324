package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileStats
import org.apache.spark.sql.types._

/** Property-style fuzz of the LITERAL/ENCODED path-domain contract
  * (`CompactionRunner.canonDecoded`): entries, manifests and delete rows
  * carry LITERAL paths; `_metadata.file_path` renders Hadoop-encoded;
  * the scan side decodes exactly once. Round 17 found one real
  * silent-wrong-rows bug on this seam (spacey partition dirs resurrected
  * pos-deleted rows); this spec generates ADVERSARIAL partition dir
  * names — spaces, literal %XX sequences, `+`, unicode, invalid `%ZZ`
  * escapes, parens, `~`, `=` — and asserts the SAME surviving row set
  * across every read path on the same snapshot: the row-path MoR scan,
  * the doorway's vectorized mask, and the exported chain re-imported
  * into a fresh root.
  */
class PathDomainPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260816L)

  // fragments that have historically confused exactly one layer: raw
  // space (encoded by _metadata), literal %XX (double-decode hazard),
  // '+' (form-decode hazard), invalid escapes (must never throw), and
  // multibyte UTF-8. '#'/':' stay out — Hadoop Path itself cannot
  // address them (fragment/scheme separators), so no writer produces
  // such data dirs.
  private val fragments = Vector(
    "a b", "%20", "x%2Fy", "p+q", "%ZZ", "ü漢", "(v)", "~t", "a=b",
    "NOT SPECIFIED", "%25", "dot.dot", "c%3ad")

  private def randValue(): String =
    (0 until (1 + rnd.nextInt(2)))
      .map(_ => fragments(rnd.nextInt(fragments.size))).mkString("-")

  private val schemaFields =
    """{"id":1,"name":"k","required":false,"type":"long"},
      |{"id":2,"name":"v","required":false,"type":"string"}""".stripMargin
  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("pos deletes under adversarial partition paths agree across read paths") {
    val conf = new org.apache.hadoop.conf.Configuration()
    for (round <- 0 until 4) {
      val dir = Files.createTempDirectory(s"graft-pathfuzz$round").toString
      val values = Seq.fill(2 + rnd.nextInt(2))(randValue()).distinct
      // per partition dir: 6 rows, positions 1 and 4 pos-deleted
      val staged: Seq[(String, Long)] = values.zipWithIndex.map { case (v, i) =>
        val dataDir = s"$dir/seg=$v"
        (0L until 6L).map(k => (i * 10L + k, s"v$k")).toDF("k", "v")
          .coalesce(1).write.parquet(dataDir)
        val p = CompactionRunner.listParquet(dataDir).head
        (p, i * 10L)
      }
      val expected: Set[Long] = staged.flatMap { case (_, base) =>
        Seq(2L, 3L, 5L).map(base + _) // 1,4 pos-deleted; 0 eq-deleted
      }.toSet
      // the delete rows record LITERAL file:// paths (what stock writers
      // store), one delete file covering every partition
      staged.map { case (p, _) => (s"file://$p", 1L) }
        .++(staged.map { case (p, _) => (s"file://$p", 4L) })
        .toDF("file_path", "pos").coalesce(1).write.parquet(s"$dir/pd")
      val pd = CompactionRunner.listParquet(s"$dir/pd").head
      // an eq-delete too: the vectorized eq mask compares data-file seq
      // BY PATH (the r17 seam), so adversarial dirs must not desync it
      staged.map { case (_, base) => Tuple1(base) }.toDF("k")
        .coalesce(1).write.parquet(s"$dir/eq")
      val eqf = CompactionRunner.listParquet(s"$dir/eq").head
      val sz = (p: String) => Files.size(java.nio.file.Paths.get(p))
      val entries = staged.map { case (p, _) =>
        IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
          DataFileStats(p, sz(p), 6, Map.empty, Map.empty, Map.empty),
          sequenceNumber = 1)
      } :+ IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
        DataFileStats(pd, sz(pd), staged.size * 2L,
          Map.empty, Map.empty, Map.empty),
        content = IcebergManifest.ContentPositionDeletes,
        sequenceNumber = 2) :+
        IcebergManifest.ManifestEntry(IcebergManifest.StatusAdded,
          DataFileStats(eqf, sz(eqf), staged.size.toLong,
            Map.empty, Map.empty, Map.empty),
          content = IcebergManifest.ContentEqualityDeletes,
          equalityIds = Seq(1), sequenceNumber = 3)
      IcebergManifest.write(s"$dir/m0.avro", entries, schema, conf)
      IcebergManifest.writeList(s"$dir/l1.avro",
        Seq(IcebergManifest.ManifestFile(
          s"$dir/m0.avro", sz(s"$dir/m0.avro"),
          partitionSpecId = 0, content = 0, sequenceNumber = 2,
          minSequenceNumber = 1, addedSnapshotId = 1,
          addedFilesCount = entries.size, existingFilesCount = 0,
          deletedFilesCount = 0, addedRowsCount = staged.size * 6L + 2,
          existingRowsCount = 0, deletedRowsCount = 0)), conf)
      Files.writeString(java.nio.file.Paths.get(s"$dir/v1.metadata.json"),
        s"""{"format-version":2,"table-uuid":"fuzz$round","location":"$dir",
           |"last-column-id":2,"current-schema-id":0,
           |"schemas":[{"schema-id":0,"type":"struct","fields":[$schemaFields]}],
           |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
           |"default-sort-order-id":0,
           |"sort-orders":[{"order-id":0,"fields":[]}],
           |"current-snapshot-id":1,
           |"snapshots":[{"snapshot-id":1,"sequence-number":1,
           |"timestamp-ms":0,"manifest-list":"$dir/l1.avro",
           |"summary":{"operation":"append"},"schema-id":0}]}""".stripMargin)
      val root = Files.createTempDirectory(s"graft-pathfuzz$round-r").toString
      val cat = new GraftCatalog(root)
      cat.importTable("t", s"$dir/v1.metadata.json")
      def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("k").collect().map(_.getLong(0)).toSet
      // 1. the row-path MoR scan
      val rowPath = keys(cat.scanTable(spark, "t"))
      assert(rowPath == expected,
        s"row path diverged for dirs $values:\n got $rowPath\n want $expected")
      // 2. the doorway's vectorized-mask read
      val g = s"gpf_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$g",
        "graft.sources.dsv2.GraftSparkCatalog")
      spark.conf.set(s"spark.sql.catalog.$g.root", root)
      val doorway = keys(spark.sql(s"SELECT k FROM $g.t"))
      assert(doorway == expected,
        s"vectorized mask diverged for dirs $values: got $doorway")
      // 3. export -> re-import into a fresh root -> scan
      val out = IcebergMetadataJson.export(cat, root, "t")
      val root2 = Files.createTempDirectory(s"graft-pathfuzz$round-r2").toString
      val cat2 = new GraftCatalog(root2)
      cat2.importTable("t", out.toString)
      val reimported = keys(cat2.scanTable(spark, "t"))
      assert(reimported == expected,
        s"exported chain diverged for dirs $values: got $reimported")
    }
  }
}
