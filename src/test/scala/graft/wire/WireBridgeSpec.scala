package graft.wire

import graft.SparkSpec
import graft.sources.FieldIds
import graft.wire.CompactorProto._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Wire → Spark semantics: schema descriptors carry field ids into Spark
  * metadata, literals decode to Spark values (decimal-beyond-long via
  * Int128 included), task routing mirrors the reference's decoder, and the
  * full RewriteFiles body runs a real compaction over the framed TCP
  * server.
  */
class WireBridgeSpec extends SparkSpec {

  import WireLiteral._
  import WirePrimitiveKind._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def parquetsIn(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq

  test("schema descriptor maps to Spark types with field-id metadata") {
    val schema = WireBridge.toSparkSchema(WireSchema(1L, Seq(
      WireField(1, "id", required = true, WirePrimitive(KLong)),
      WireField(2, "price", required = false, WirePrimitive(KDecimal(38, 10))),
      WireField(3, "ts", required = false, WirePrimitive(KTimestamptz)),
      WireField(4, "ts_local", required = false, WirePrimitive(KTimestamp)),
      WireField(5, "ts_ns", required = false, WirePrimitive(KTimestampNs)),
      WireField(6, "d", required = false, WirePrimitive(KDate)),
      WireField(7, "u", required = false, WirePrimitive(KUuid)),
      WireField(8, "fx", required = false, WirePrimitive(KFixed(16L))),
      WireField(9, "tags", required = false,
        WireListType(WireField(10, "element", required = true, WirePrimitive(KString)))),
      WireField(11, "attrs", required = false, WireMapType(
        WireField(12, "key", required = true, WirePrimitive(KString)),
        WireField(13, "value", required = false, WirePrimitive(KInt)))),
      WireField(14, "addr", required = false, WireStructType(Seq(
        WireField(15, "zip", required = false, WirePrimitive(KInt))))))))
    assert(schema("id").dataType == LongType && !schema("id").nullable)
    assert(schema("price").dataType == DecimalType(38, 10))
    assert(schema("ts").dataType == TimestampType)
    assert(schema("ts_local").dataType == TimestampNTZType)
    assert(schema("ts_ns").dataType == LongType) // nanosAsLong convention
    assert(schema("d").dataType == DateType)
    assert(schema("u").dataType == StringType)
    assert(schema("fx").dataType == BinaryType)
    assert(schema("tags").dataType == ArrayType(StringType, containsNull = false))
    assert(schema("attrs").dataType ==
      MapType(StringType, IntegerType, valueContainsNull = true))
    assert(schema("addr").dataType.asInstanceOf[StructType]("zip").dataType == IntegerType)
    // every top-level field carries its wire id
    assert(schema.fields.flatMap(FieldIds.idOf).toSeq ==
      Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 14))
    // nested struct fields carry ids too
    assert(FieldIds.idOf(schema("addr").dataType.asInstanceOf[StructType]("zip"))
      .contains(15))
  }

  test("literals decode to Spark values; int128 carries decimals beyond long") {
    val dec = DecimalType(38, 5)
    // an unscaled value that cannot fit in int64
    val wide = BigInt("12345678901234567890123")
    assert(WireBridge.literalValue(PInt128(wide), dec) ==
      new java.math.BigDecimal(wide.underlying, 5))
    assert(WireBridge.literalValue(PInt128(-wide), dec) ==
      new java.math.BigDecimal((-wide).underlying, 5))
    assert(WireBridge.literalValue(PLong(1420L), DecimalType(4, 2)) ==
      java.math.BigDecimal.valueOf(1420L, 2)) // 14.20
    assert(WireBridge.literalValue(PInt(17486), DateType) ==
      java.sql.Date.valueOf("2017-11-16"))
    assert(WireBridge.literalValue(
      LStruct(Seq(Some(PInt(1)), None)),
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
      == Row(1, null))
    assert(WireBridge.literalValue(
      LMap(Seq(PString("k") -> Some(PLong(9L)), PString("n") -> None)),
      MapType(StringType, LongType)) == Map("k" -> 9L, "n" -> null))
    assert(WireBridge.literalValue(
      LList(Seq(Some(PString("x")), None)), ArrayType(StringType))
      == Seq("x", null))
  }

  test("bounds: sentinels render to the engine's pruning convention") {
    assert(WireBridge.boundString(AboveMax, LongType) == "above_max")
    assert(WireBridge.boundString(BelowMin, LongType) == "below_min")
    assert(WireBridge.boundString(PLong(42L), LongType) == "42")
    // sentinels must never decode as data values
    intercept[IllegalArgumentException](WireBridge.literalValue(AboveMax, LongType))
  }

  test("boundBytes follows Iceberg single-value LE serialization") {
    assert(WireBridge.boundBytes(IntegerType, "5").get.toSeq ==
      Seq[Byte](5, 0, 0, 0))
    assert(WireBridge.boundBytes(LongType, "-1").get.toSeq == Seq.fill(8)((-1).toByte))
    assert(WireBridge.boundBytes(StringType, "ab").get.toSeq ==
      "ab".getBytes.toSeq)
    assert(WireBridge.boundBytes(DateType, "2017-11-16").get.toSeq ==
      Seq[Byte](0x4e, 0x44, 0, 0)) // 17486 days LE
    assert(WireBridge.boundBytes(LongType, "not a number").isEmpty)
  }

  test("task routing mirrors the reference: pos-deletes drop projection, eq-deletes project their ids") {
    val schema = WireSchema(1L, Seq(
      WireField(1, "id", required = true, WirePrimitive(KLong)),
      WireField(2, "k", required = false, WirePrimitive(KInt)),
      WireField(3, "name", required = false, WirePrimitive(KString))))
    val req = WireRewriteRequest(
      tasks = Seq(
        WireScanTask(0, 0, 0, "/d1.parquet", ContentData, FormatParquet, Seq(1, 2, 3), 5L, Nil),
        WireScanTask(0, 0, 0, "/pd.parquet", ContentPositionDeletes, FormatParquet, Seq(1), 6L, Nil),
        WireScanTask(0, 0, 0, "/ed.parquet", ContentEqualityDeletes, FormatParquet, Nil, 9L, Seq(2, 1)),
        WireScanTask(0, 0, 0, "/d2.orc", ContentData, FormatOrc, Nil, 4L, Nil)),
      config = Map("target_partitions" -> "8", "cluster_by" -> "id,k",
        "z_order_by" -> "id,k", "stats_cols" -> "id"),
      dirPath = "/out", fileIo = None, schema = Some(schema), partitionSpec = None)
    val d = WireBridge.decodeRequest(req)
    assert(d.dataTasks.map(t => (t.path, t.seqNum, t.format)) ==
      Seq(("/d1.parquet", 5L, "parquet"), ("/d2.orc", 4L, "orc")))
    assert(d.posDeletes.map(_.path) == Seq("/pd.parquet"))
    // equality column NAMES resolved by field id, preserving id order
    assert(d.eqDeletes.head.equalityCols == Seq("k", "id"))
    assert(d.eqDeletes.head.equalityIds == Seq(2, 1))
    assert(d.config.targetPartitions == 8)
    assert(d.config.clusterBy == Seq("id", "k"))
    assert(d.config.zOrderBy == Seq("id", "k"))
    assert(d.config.statsCols == Seq("id"))
    assert(d.outDir == "/out")
    assert(d.canonicalSchema.get.fieldNames.toSeq == Seq("id", "k", "name"))
    // unknown equality id fails loudly
    intercept[IllegalArgumentException] {
      WireBridge.decodeRequest(req.copy(tasks = Seq(
        WireScanTask(0, 0, 0, "/ed.parquet", ContentEqualityDeletes, FormatParquet,
          Nil, 9L, Seq(77)))))
    }
  }

  test("partition spec resolves source columns by field id into transforms") {
    val schema = WireSchema(1L, Seq(
      WireField(1, "id", required = true, WirePrimitive(KLong)),
      WireField(2, "d", required = false, WirePrimitive(KDate))))
    val req = WireRewriteRequest(Nil, Map.empty, "/out", None, Some(schema),
      Some(WirePartitionSpec(0, Seq(
        WirePartitionField(2, None, "p_year", WireTransform.Year),
        WirePartitionField(1, None, "p_b", WireTransform.Bucket(8))))))
    val d = WireBridge.decodeRequest(req)
    assert(d.config.partitionTransforms.map(_._1) == Seq("p_year", "p_b"))
    import spark.implicits._
    val df = Seq((47L, java.sql.Date.valueOf("2024-06-15"))).toDF("id", "d")
    val r = df.select(
      d.config.partitionTransforms(0)._2.as("py"),
      d.config.partitionTransforms(1)._2.as("pb")).head
    assert(r.getInt(0) == 54) // years since 1970
    assert(r.getInt(1) >= 0 && r.getInt(1) < 8)
  }

  test("FileIO props thread into the session's Hadoop conf under s3a keys") {
    WireBridge.applyFileIo(spark, Map(
      "s3.endpoint" -> "http://minio:9000",
      "s3.access-key-id" -> "AKIA-TEST",
      "s3.secret-access-key" -> "sekret",
      "s3.region" -> "eu-west-1",
      "s3.path-style-access" -> "true",
      "fs.s3a.connection.maximum" -> "64")) // already-hadoop-spelled passthrough
    val conf = spark.sparkContext.hadoopConfiguration
    assert(conf.get("fs.s3a.endpoint") == "http://minio:9000")
    assert(conf.get("fs.s3a.access.key") == "AKIA-TEST")
    assert(conf.get("fs.s3a.secret.key") == "sekret")
    assert(conf.get("fs.s3a.endpoint.region") == "eu-west-1")
    assert(conf.get("fs.s3a.path.style.access") == "true")
    assert(conf.get("fs.s3a.connection.maximum") == "64")
  }

  test("RewriteFiles over the framed TCP server: full compaction round-trip") {
    import spark.implicits._
    val table = tmpDir("graft-wire")
    val delDir = tmpDir("graft-wire-del")
    val out = tmpDir("graft-wire-out")
    (1L to 100L).map(i => (i, (i % 10).toInt, s"name-$i"))
      .toDF("id", "k", "name")
      .repartition(2).write.mode("overwrite").parquet(table)
    Seq(3).toDF("k").write.mode("overwrite").parquet(delDir)

    val schema = WireSchema(0L, Seq(
      WireField(1, "id", required = true, WirePrimitive(KLong)),
      WireField(2, "k", required = false, WirePrimitive(KInt)),
      WireField(3, "name", required = false, WirePrimitive(KString))))
    val tasks =
      parquetsIn(table).map(p =>
        WireScanTask(0, 0, 0, p, ContentData, FormatParquet, Seq(1, 2, 3), 1L, Nil)) ++
        parquetsIn(delDir).map(p =>
          WireScanTask(0, 0, 0, p, ContentEqualityDeletes, FormatParquet, Nil, 9L, Seq(2)))
    val reqBytes = encodeRewriteRequest(WireRewriteRequest(
      tasks, Map("target_partitions" -> "2", "stats_cols" -> "id"), out,
      Some(WireFileIo("file://", Map.empty)), Some(schema), None))

    val server = new WireCompactionServer(spark)
    server.start()
    try {
      // Echo proves the framing + codec layers independently of Spark
      val echoed = WireCompactionServer.call("127.0.0.1", server.boundPort,
        server.MethodEcho, CompactorProto.encodeEcho("ping"))
      assert(CompactorProto.decodeEcho(echoed) == "ping")

      val respBytes = WireCompactionServer.call("127.0.0.1", server.boundPort,
        server.MethodRewriteFiles, reqBytes)
      val resp = decodeRewriteResponse(respBytes)
      // k=3 rows (ids 3,13,...,93) are equality-deleted: 90 survivors
      assert(resp.dataFiles.map(_.recordCount).sum == 90L)
      assert(resp.dataFiles.forall(_.format == FormatParquet))
      assert(resp.stat.get.rewrittenFilesCount == 3L) // 2 data + 1 delete input
      assert(resp.stat.get.addedFilesCount == resp.dataFiles.length.toLong)
      // bounds key by FIELD ID with Iceberg LE bytes: id (field 1) min ≥ 1
      val lower = resp.dataFiles.flatMap(_.lowerBounds.get(1))
      assert(lower.nonEmpty)
      val mins = lower.map(b => b.zipWithIndex.map {
        case (x, i) => (x & 0xffL) << (8 * i)
      }.sum)
      assert(mins.min >= 1L && mins.min <= 100L)
      // the written data really lost the deleted keys
      assert(spark.read.parquet(s"$out/data").filter(col("k") === 3).count() == 0L)
      assert(spark.read.parquet(s"$out/data").count() == 90L)

      // an UNSORTED rewrite reports no sort order (Iceberg order-id 0
      // semantics); a z-ordered one stamps sort_order_id = 1
      // (`iceberg.proto:200`) so the consuming catalog records the layout
      assert(resp.dataFiles.forall(_.sortOrderId.isEmpty))
      val outZ = tmpDir("graft-wire-zout")
      val zResp = decodeRewriteResponse(WireCompactionServer.call(
        "127.0.0.1", server.boundPort, server.MethodRewriteFiles,
        encodeRewriteRequest(WireRewriteRequest(
          tasks, Map("target_partitions" -> "2", "stats_cols" -> "id",
            "z_order_by" -> "id,k"), outZ,
          Some(WireFileIo("file://", Map.empty)), Some(schema), None))))
      assert(zResp.dataFiles.nonEmpty &&
        zResp.dataFiles.forall(_.sortOrderId.contains(1)))
      assert(spark.read.parquet(s"$outZ/data").count() == 90L)

      // a malformed request surfaces as a framed error, not a hang
      val err = intercept[RuntimeException] {
        WireCompactionServer.call("127.0.0.1", server.boundPort,
          server.MethodRewriteFiles, encodeRewriteRequest(
            WireRewriteRequest(Nil, Map.empty, "", None, None, None)))
      }
      assert(err.getMessage.contains("server error"))
    } finally server.close()
  }
}
