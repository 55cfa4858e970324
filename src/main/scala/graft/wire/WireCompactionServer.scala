package graft.wire

import org.apache.spark.sql.SparkSession
import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

/** MINIMAL network entry point for the wire surface: the reference runs a
  * tonic (gRPC) server on :7777 serving `CompactorService` (RewriteFiles +
  * Echo, `services/compactor/src/rpc.rs`). The REAL gRPC (HTTP/2 cleartext)
  * doorway is [[GrpcCompactionServer]]; this class remains as the
  * zero-netty fallback transport — a length-prefixed frame over TCP
  * carrying the SAME payload bytes:
  *
  * {{{
  * request  frame: [1 byte method][4-byte big-endian payload length][payload]
  *                 method 0 = Echo(EchoRequest), 1 = RewriteFiles(RewriteFilesRequest)
  * response frame: [1 byte status][4-byte big-endian payload length][payload]
  *                 status 0 = OK (payload = response message bytes)
  *                 status 1 = error (payload = UTF-8 message)
  * }}}
  *
  * Swapping this framing for real gRPC is a transport-only change — the
  * payload codec, request decode, compaction call, and response encode are
  * all in [[WireBridge]] and stay byte-identical.
  *
  * One request executes one distributed compaction; requests from multiple
  * connections run sequentially per server (the reference's handler equally
  * runs one rewrite per RPC; concurrency belongs to the cluster scheduler,
  * not the doorway).
  */
final class WireCompactionServer(
    spark: SparkSession, port: Int = 0,
    executor: graft.sources.CompactionExecutor =
      graft.sources.SparkCompactionExecutor) {

  final val MethodEcho: Byte = 0
  final val MethodRewriteFiles: Byte = 1

  private val server = new ServerSocket(port, 16, InetAddress.getLoopbackAddress)
  @volatile private var running = true

  /** The bound port (useful when constructed with port 0 for tests). */
  def boundPort: Int = server.getLocalPort

  private val maxFrame = 64 << 20 // 64 MiB: a scan-task list is metadata-sized

  def serveLoop(): Unit = {
    while (running) {
      val sock =
        try server.accept()
        catch { case _: java.net.SocketException if !running => return }
      try handleConnection(sock)
      catch { case _: java.io.IOException => () } // connection-level failure: keep serving
      finally sock.close()
    }
  }

  /** Serve in a daemon thread (tests / embedded use). */
  def start(): Thread = {
    val t = new Thread(() => serveLoop(), s"graft-wire-server-$boundPort")
    t.setDaemon(true)
    t.start()
    t
  }

  def close(): Unit = {
    running = false
    server.close()
  }

  private def handleConnection(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    var open = true
    while (open) {
      val method =
        try in.readByte()
        catch { case _: java.io.EOFException => open = false; 0.toByte }
      if (open) {
        val len = in.readInt()
        require(len >= 0 && len <= maxFrame, s"frame length $len out of range")
        val payload = new Array[Byte](len)
        in.readFully(payload)
        val (status, body) =
          try {
            method match {
              case MethodEcho =>
                (0.toByte, CompactorProto.encodeEcho(CompactorProto.decodeEcho(payload)))
              case MethodRewriteFiles =>
                (0.toByte, WireBridge.rewriteFiles(spark, payload, executor))
              case m =>
                (1.toByte, s"unknown method $m".getBytes(StandardCharsets.UTF_8))
            }
          } catch {
            // mirror the reference's tonic handler (rpc.rs:41): every
            // failure classifies to its CompactionError domain and renders
            // as "Internal error: <domain prefix>: <detail>"
            case e: Exception =>
              (1.toByte, s"Internal error: ${graft.sources.GraftError.classify(e).getMessage}"
                .getBytes(StandardCharsets.UTF_8))
          }
        out.writeByte(status.toInt)
        out.writeInt(body.length)
        out.write(body)
        out.flush()
      }
    }
  }
}

object WireCompactionServer {

  /** Client-side call helper (tests and in-process callers). */
  def call(host: String, port: Int, method: Byte, payload: Array[Byte]): Array[Byte] = {
    val sock = new Socket(host, port)
    try {
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      out.writeByte(method.toInt)
      out.writeInt(payload.length)
      out.write(payload)
      out.flush()
      val status = in.readByte()
      val len = in.readInt()
      val body = new Array[Byte](len)
      in.readFully(body)
      if (status != 0)
        throw new RuntimeException(
          s"server error: ${new String(body, StandardCharsets.UTF_8)}")
      body
    } finally sock.close()
  }
}
