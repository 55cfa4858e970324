package graft.wire

import java.nio.file.Files

import graft.SparkSpec
import graft.wire.CompactorProto._
import org.apache.spark.sql.functions._

/** Real-gRPC round trip: an HTTP/2-cleartext client (netty codec — the same
  * frames, HPACK, and flow control a stock gRPC client emits) calls the h2c
  * server's `compactor.CompactorService` methods end-to-end, proving the
  * wire surface no longer needs the framed-TCP stand-in.
  */
class GrpcH2cSpec extends SparkSpec {

  import WirePrimitiveKind._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def parquetsIn(dir: String): Seq[String] =
    graft.sources.CompactionRunner.listParquet(dir)

  test("Echo over h2c gRPC: HTTP/2 + HPACK + gRPC framing round-trip") {
    val server = new GrpcCompactionServer(spark)
    val client = new GrpcCompactionClient("127.0.0.1", server.boundPort)
    try {
      val resp = client.call(GrpcCompactionServer.PathEcho,
        CompactorProto.encodeEcho("h2c ping"))
      assert(CompactorProto.decodeEcho(resp) == "h2c ping")
      // repeated calls on the SAME connection: new stream per RPC
      (1 to 3).foreach { i =>
        val r = client.call(GrpcCompactionServer.PathEcho,
          CompactorProto.encodeEcho(s"again-$i"))
        assert(CompactorProto.decodeEcho(r) == s"again-$i")
      }
    } finally { client.close(); server.close() }
  }

  test("RewriteFiles over h2c gRPC: full compaction, byte-identical payloads") {
    import spark.implicits._
    val table = tmpDir("graft-grpc")
    val out = tmpDir("graft-grpc-out")
    (1L to 100L).map(i => (i, (i % 10).toInt, s"name-$i"))
      .toDF("id", "k", "name")
      .repartition(2).write.mode("overwrite").parquet(table)

    val schema = WireSchema(0L, Seq(
      WireField(1, "id", required = true, WirePrimitive(KLong)),
      WireField(2, "k", required = false, WirePrimitive(KInt)),
      WireField(3, "name", required = false, WirePrimitive(KString))))
    val tasks = parquetsIn(table).map(p =>
      WireScanTask(0, 0, 0, p, ContentData, FormatParquet, Seq(1, 2, 3), 1L, Nil))
    val reqBytes = encodeRewriteRequest(WireRewriteRequest(
      tasks, Map("target_partitions" -> "2", "stats_cols" -> "id"), out,
      Some(WireFileIo("file://", Map.empty)), Some(schema), None))

    val server = new GrpcCompactionServer(spark)
    val client = new GrpcCompactionClient("127.0.0.1", server.boundPort)
    try {
      val respBytes = client.call(GrpcCompactionServer.PathRewriteFiles, reqBytes)
      val resp = decodeRewriteResponse(respBytes)
      assert(resp.dataFiles.map(_.recordCount).sum == 100L)
      assert(resp.stat.get.rewrittenFilesCount == 2L)
      assert(spark.read.parquet(s"$out/data").count() == 100L)
      // transport independence: for the SAME RewriteFiles request, both
      // transports must produce byte-identical response payloads. A real
      // rewrite's response embeds nondeterministic part-file names, so
      // both servers run a deterministic executor whose manifest is a pure
      // function of the request — any divergence left is transport-layer
      // encode/decode, exactly what this assertion polices.
      object FixedExecutor extends graft.sources.CompactionExecutor {
        override def rewriteFiles(
            s: org.apache.spark.sql.SparkSession,
            dataTasks: Seq[graft.sources.CompactionRunner.DataFileTask],
            posDeletes: Seq[graft.sources.CompactionRunner.PosDeleteTask],
            eqDeletes: Seq[graft.sources.CompactionRunner.EqDeleteTask],
            outDir: String,
            config: graft.sources.CompactionRunner.CompactionConfig,
            schema: Option[org.apache.spark.sql.types.StructType]) =
          graft.sources.CompactionRunner.CommitManifest(
            addedFiles = Seq(graft.sources.CompactionRunner.DataFileStats(
              s"$outDir/data/part-0.parquet", 4096L, 100L,
              Map("id" -> "1"), Map("id" -> "100"), Map("id" -> 0L))),
            removedDataFiles = dataTasks.map(_.path).sorted,
            removedDeleteFiles = Nil,
            outputRecordCount = 100L,
            rewrittenFilesCount = dataTasks.size.toLong,
            rewrittenBytes = 8192L,
            addedFilesCount = 1L)
      }
      val grpcFixed = new GrpcCompactionServer(spark, executor = FixedExecutor)
      val legacy = new WireCompactionServer(spark, executor = FixedExecutor)
      legacy.start()
      val fixedClient = new GrpcCompactionClient("127.0.0.1", grpcFixed.boundPort)
      try {
        val legacyBytes = WireCompactionServer.call("127.0.0.1",
          legacy.boundPort, legacy.MethodRewriteFiles, reqBytes)
        val grpcBytes = fixedClient.call(
          GrpcCompactionServer.PathRewriteFiles, reqBytes)
        assert(legacyBytes.toSeq == grpcBytes.toSeq,
          "RewriteFiles response bytes diverge between gRPC and framed-TCP")
        // ...and the shared Echo path agrees too
        val legacyEcho = WireCompactionServer.call("127.0.0.1",
          legacy.boundPort, legacy.MethodEcho, CompactorProto.encodeEcho("x"))
        val grpcEcho = client.call(GrpcCompactionServer.PathEcho,
          CompactorProto.encodeEcho("x"))
        assert(legacyEcho.toSeq == grpcEcho.toSeq)
      } finally { fixedClient.close(); grpcFixed.close(); legacy.close() }
    } finally { client.close(); server.close() }
  }

  test("gRPC errors map to grpc-status trailers, not broken streams") {
    val server = new GrpcCompactionServer(spark)
    val client = new GrpcCompactionClient("127.0.0.1", server.boundPort)
    try {
      // unknown method → UNIMPLEMENTED (12)
      val unimpl = intercept[GrpcCompactionClient.StatusException] {
        client.call("/compactor.CompactorService/NoSuchMethod", Array[Byte]())
      }
      assert(unimpl.grpcStatus == 12, unimpl.getMessage)
      // malformed request body → classified internal error (2), message intact
      val internal = intercept[GrpcCompactionClient.StatusException] {
        client.call(GrpcCompactionServer.PathRewriteFiles,
          encodeRewriteRequest(WireRewriteRequest(Nil, Map.empty, "", None, None, None)))
      }
      assert(internal.grpcStatus == 2, internal.getMessage)
      assert(internal.grpcMessage.contains("Internal error"))
      // the connection SURVIVES an errored RPC — next call succeeds
      val ok = client.call(GrpcCompactionServer.PathEcho,
        CompactorProto.encodeEcho("still alive"))
      assert(CompactorProto.decodeEcho(ok) == "still alive")
    } finally { client.close(); server.close() }
  }
}
