package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IcebergMetadataJsonSpec extends SparkSpec {

  test("exported metadata.json is valid JSON with spec-shaped v2 fields") {
    val root = Files.createTempDirectory("graft-meta").toString
    val cat = new GraftCatalog(root)
    val schema = FieldIds.stamp(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("price", DecimalType(18, 6)))))
    cat.createTable("t", Seq(DataFileTask("/a.parquet", 1)), Some(schema))
    cat.commitRewrite("t", Seq(DataFileTask("/b.parquet", 2)), Nil)
    val path = IcebergMetadataJson.export(cat, root, "t")
    assert(path.getFileName.toString == "v2.metadata.json")

    // parse with Spark's JSON reader — a malformed document becomes a
    // _corrupt_record column and fails the field asserts
    val meta = spark.read.option("multiLine", "true").json(path.toString)
    val row = meta.head()
    assert(meta.columns.contains("format-version"))
    assert(row.getAs[Long]("format-version") == 2L)
    assert(row.getAs[Long]("current-snapshot-id") == 2L)
    assert(row.getAs[Long]("last-sequence-number") == 2L)
    assert(row.getAs[Long]("last-column-id") == 3L)

    val snaps = meta.select(explode(col("snapshots")).as("s"))
      .select(col("s.snapshot-id"), col("s.manifest-list"))
    assert(snaps.count() == 2)
    assert(snaps.filter(col("manifest-list").contains("snap-")).count() == 2)

    val fields = meta.select(explode(col("schemas")).as("sc"))
      .select(explode(col("sc.fields")).as("f"))
      .select(col("f.id"), col("f.name"), col("f.type"), col("f.required"))
      .collect()
    assert(fields.map(_.getAs[String]("name")).toSet == Set("id", "name", "price"))
    assert(fields.map(_.getAs[Long]("id")).toSet == Set(1L, 2L, 3L))
    assert(fields.find(_.getAs[String]("name") == "price")
      .get.getAs[String]("type") == "decimal(18, 6)")
    assert(fields.find(_.getAs[String]("name") == "id")
      .get.getAs[Boolean]("required"))
  }

  test("nested and id-less fields get unique synthetic ids covered by last-column-id") {
    val root = Files.createTempDirectory("graft-meta3").toString
    val cat = new GraftCatalog(root)
    // top-level ids are real (catalog requires them); the nested list/map
    // slots have no tracked ids — they must come out unique, not 0
    val schema = FieldIds.stamp(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType)),
      StructField("attrs", MapType(StringType, ArrayType(LongType))),
      StructField("point", StructType(Seq(
        StructField("x", DoubleType), StructField("y", DoubleType)))))))
    cat.createTable("t", Seq(DataFileTask("/a.parquet", 1)), Some(schema))
    val text = Files.readString(IcebergMetadataJson.export(cat, root, "t"))

    // collect every field id in the document: "id":N, element-id, key-id, value-id
    val idPattern = """"(?:id|element-id|key-id|value-id)":(-?\d+)""".r
    val ids = idPattern.findAllMatchIn(text).map(_.group(1).toLong).toSeq
    assert(ids.nonEmpty)
    assert(!ids.contains(0L), s"id 0 emitted: $text")
    assert(ids.distinct.length == ids.length, s"duplicate field ids in: $ids")
    // last-column-id covers the synthetic allocations
    val lastColumnId = """"last-column-id":(\d+)""".r
      .findFirstMatchIn(text).get.group(1).toLong
    assert(lastColumnId == ids.max,
      s"last-column-id $lastColumnId does not cover max id ${ids.max}")

    // a second export is deterministic: same ids for the same schema
    val text2 = Files.readString(IcebergMetadataJson.export(cat, root, "t"))
    assert(idPattern.findAllMatchIn(text2).map(_.group(1).toLong).toSeq == ids)
  }

  test("timestamptz bounds encode through the session time zone") {
    // The catalog's timestamp stats strings come from cast-to-string,
    // which renders TIMESTAMPTZ in spark.sql.session.timeZone. On a
    // non-UTC session the binary bound must still be the true UTC-instant
    // micros — a zone-shifted bound would make a stock engine silently
    // prune files containing matching rows.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // the instant 2017-11-16T22:31:08Z renders as 17:31:08 in New York
      val rendered = spark.sql(
        "SELECT cast(cast('2017-11-16 22:31:08Z' as timestamp) as string)")
        .first().getString(0)
      assert(rendered == "2017-11-16 17:31:08", rendered)
      val bytes = IcebergSingleValue.encode(TimestampType, rendered).get
      // spec vector: that instant is 1510871468000000 micros
      assert(IcebergSingleValue.decode(LongType, bytes)
        .contains("1510871468000000"))
      // decode re-renders symmetrically in the session zone
      assert(IcebergSingleValue.decode(TimestampType, bytes).contains(rendered))
      // NTZ wall-clocks are zone-free: the same string encodes to the
      // SAME bytes whatever the session zone
      val ntz = IcebergSingleValue.encode(
        TimestampNTZType, "2017-11-16 22:31:08").get
      assert(IcebergSingleValue.decode(LongType, ntz)
        .contains("1510871468000000"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("export reflects schema evolution: current-schema-id tracks HEAD") {
    val root = Files.createTempDirectory("graft-meta2").toString
    val cat = new GraftCatalog(root)
    val s1 = FieldIds.stamp(StructType(Seq(StructField("id", LongType))))
    cat.createTable("t", Seq(DataFileTask("/a.parquet", 1)), Some(s1))
    val s2 = StructType(s1.fields :+
      StructField("extra", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build()))
    cat.evolveSchema("t", s2)
    val meta = spark.read.option("multiLine", "true")
      .json(IcebergMetadataJson.export(cat, root, "t").toString)
    val row = meta.head()
    assert(row.getAs[Long]("current-schema-id") == cat.currentSnapshotId("t"))
    assert(meta.select(explode(col("schemas")).as("s")).count() == 2)
  }

  test("declared partition spec exports with source-ids bound to schema field ids") {
    val root = Files.createTempDirectory("graft-meta4").toString
    val cat = new GraftCatalog(root)
    val schema = FieldIds.stamp(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType))))
    cat.createTable("t", Seq(DataFileTask("/a.parquet", 1)), Some(schema))
    cat.setPartitionSpec("t", Seq(
      GraftCatalog.PartitionFieldDef("id_t", "truncate[10]", "id"),
      GraftCatalog.PartitionFieldDef("name_b", "bucket[4]", "name")))
    val path = IcebergMetadataJson.export(cat, root, "t")
    val meta = spark.read.option("multiLine", "true").json(path.toString)
    val pf = meta.select(explode(col("partition-specs")).as("ps"))
      .select(explode(col("ps.fields")).as("f"))
      .select(col("f.name"), col("f.transform"), col("f.source-id"), col("f.field-id"))
      .collect()
    assert(pf.map(r => (r.getAs[String]("name"), r.getAs[String]("transform"),
      r.getAs[Long]("source-id"), r.getAs[Long]("field-id"))).toSeq ==
      Seq(("id_t", "truncate[10]", 1L, 1000L), ("name_b", "bucket[4]", 2L, 1001L)))
    assert(meta.head().getAs[Long]("last-partition-id") == 1001L)
  }
}
