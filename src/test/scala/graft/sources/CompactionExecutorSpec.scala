package graft.sources

import graft.SparkSpec
import graft.wire.CompactorProto._
import graft.wire.WireBridge

class CompactionExecutorSpec extends SparkSpec {

  test("mock executor swaps in behind the wire body like the reference's MockExecutor") {
    val schema = WireSchema(0L, Seq(
      WireField(1, "id", required = true, WirePrimitive(WirePrimitiveKind.KLong))))
    val reqBytes = encodeRewriteRequest(WireRewriteRequest(
      Seq(WireScanTask(0, 0, 0, "/nonexistent/never-read.parquet",
        ContentData, FormatParquet, Seq(1), 1L, Nil)),
      Map.empty, "/nonexistent/out", None, Some(schema), None))
    val mock = new MockCompactionExecutor
    // the mock never touches the (nonexistent) files; the decode, routing,
    // and response encode still run for real
    val respBytes = WireBridge.rewriteFiles(spark, reqBytes, mock)
    val resp = decodeRewriteResponse(respBytes)
    assert(resp.dataFiles.isEmpty)
    assert(resp.stat.exists(_.addedFilesCount == 0L))
    val (dataTasks, pos, eq, outDir) = mock.lastRequest.get
    assert(dataTasks.map(_.path) == Seq("/nonexistent/never-read.parquet"))
    assert(pos.isEmpty && eq.isEmpty)
    assert(outDir == "/nonexistent/out")
  }

  test("the default executor is the Spark engine (same object, not a copy)") {
    assert(SparkCompactionExecutor.isInstanceOf[CompactionExecutor])
  }
}
