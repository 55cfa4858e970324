package graft.wire

import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2._
import io.netty.util.ReferenceCountUtil
import org.apache.spark.sql.SparkSession

/** REAL gRPC (HTTP/2 cleartext) doorway for the wire surface — the
  * transport the reference actually serves: tonic on :7777 exposing
  * `compactor.CompactorService` (`services/compactor/src/server.rs:24-34`,
  * `rpc.rs:31-47`). A stock gRPC client speaking h2c prior-knowledge can
  * call `/compactor.CompactorService/RewriteFiles` and `/…/Echo` here:
  *
  *   - HTTP/2 framing + HPACK come from netty-codec-http2 (already on the
  *     Spark runtime classpath — grpc-java itself builds on this codec), so
  *     connection preface, SETTINGS, flow control, and header compression
  *     are the real protocol, not a stand-in;
  *   - the gRPC layer on top is implemented here: length-prefixed message
  *     framing (1-byte compressed flag + 4-byte big-endian length),
  *     `content-type: application/grpc`, and `grpc-status`/`grpc-message`
  *     trailers (status 0 OK / 2 UNKNOWN-internal / 12 UNIMPLEMENTED);
  *   - payloads are the byte-identical proto3 messages of
  *     [[CompactorProto]]; request decode → compaction → response encode
  *     all stay in [[WireBridge]], shared with the legacy framed-TCP
  *     [[WireCompactionServer]].
  *
  * One RPC executes one distributed compaction; RPCs serialize on a single
  * worker thread (the reference's handler equally runs one rewrite per RPC
  * — concurrency belongs to the cluster scheduler, not the doorway), and
  * the netty event loop stays free to answer PING/SETTINGS while a rewrite
  * runs.
  */
final class GrpcCompactionServer(
    spark: SparkSession, port: Int = 0,
    executor: graft.sources.CompactionExecutor =
      graft.sources.SparkCompactionExecutor) {

  import GrpcCompactionServer._

  private val group = new NioEventLoopGroup(1, (r: Runnable) => {
    val t = new Thread(r, "graft-grpc-eventloop"); t.setDaemon(true); t
  })

  /** Rewrites serialize here, off the event loop. */
  private val worker = java.util.concurrent.Executors.newSingleThreadExecutor(
    (r: Runnable) => {
      val t = new Thread(r, "graft-grpc-worker"); t.setDaemon(true); t
    })

  private val channel: Channel = new ServerBootstrap()
    .group(group)
    .channel(classOf[NioServerSocketChannel])
    .childHandler(new ChannelInitializer[SocketChannel] {
      override def initChannel(ch: SocketChannel): Unit =
        ch.pipeline().addLast(
          Http2FrameCodecBuilder.forServer().build(),
          new Http2MultiplexHandler(new ChannelInitializer[Channel] {
            override def initChannel(stream: Channel): Unit =
              stream.pipeline().addLast(new StreamHandler(spark, worker, executor))
          }))
    })
    .bind(InetAddress.getLoopbackAddress, port).sync().channel()

  /** The bound port (useful when constructed with port 0 for tests). */
  def boundPort: Int =
    channel.localAddress().asInstanceOf[InetSocketAddress].getPort

  def close(): Unit = {
    channel.close().sync()
    worker.shutdown()
    group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS)
  }
}

object GrpcCompactionServer {

  /** Full method paths, exactly as tonic serves them for
    * `package compactor; service CompactorService`
    * (`core/proto/iceberg.proto:224-226`).
    */
  val PathEcho = "/compactor.CompactorService/Echo"
  val PathRewriteFiles = "/compactor.CompactorService/RewriteFiles"

  private val maxMessage = 64 << 20 // 64 MiB: a scan-task list is metadata-sized

  /** One gRPC unary exchange on one HTTP/2 stream: accumulate DATA until
    * END_STREAM, unwrap the gRPC message frame, dispatch, answer with
    * HEADERS + DATA + trailers.
    */
  private final class StreamHandler(
      spark: SparkSession,
      worker: java.util.concurrent.ExecutorService,
      executor: graft.sources.CompactionExecutor)
      extends ChannelInboundHandlerAdapter {

    private var path: String = ""
    private var rejected = false
    private val body = Unpooled.buffer()

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
      msg match {
        case h: Http2HeadersFrame =>
          path = Option(h.headers.path).map(_.toString).getOrElse("")
          if (h.isEndStream) dispatch(ctx)
        case d: Http2DataFrame =>
          val consumed = d.initialFlowControlledBytes
          // enforce the message cap AS FRAMES ARRIVE: waiting for
          // END_STREAM would let a client that never ends the stream grow
          // the heap buffer without bound (and the eager window updates
          // mean nothing backpressures it)
          if (rejected) d.release() // already errored; drop further frames
          else if (body.readableBytes.toLong + d.content.readableBytes > maxMessage + 5L) {
            d.release()
            rejected = true
            body.clear()
            respondTrailersOnly(ctx, 8, // RESOURCE_EXHAUSTED
              s"gRPC message exceeds $maxMessage bytes")
          } else {
            body.writeBytes(d.content)
            d.release()
            if (consumed > 0) // return the inbound flow-control window
              ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(consumed))
            if (d.isEndStream) dispatch(ctx)
          }
        case other => ReferenceCountUtil.release(other)
      }

    override def channelInactive(ctx: ChannelHandlerContext): Unit = {
      body.release()
      super.channelInactive(ctx)
    }

    private def dispatch(ctx: ChannelHandlerContext): Unit = {
      // gRPC length-prefixed message: [compressed flag][4-byte BE length]
      val parsed: Either[(Int, String), Array[Byte]] =
        if (body.readableBytes < 5)
          Left(13 -> s"malformed gRPC frame: ${body.readableBytes} bytes")
        else {
          val compressed = body.readByte()
          val len = body.readInt()
          if (compressed != 0)
            Left(12 -> "compressed gRPC messages are not supported")
          else if (len < 0 || len > maxMessage || len != body.readableBytes)
            Left(13 -> s"gRPC frame length $len != body ${body.readableBytes}")
          else {
            val payload = new Array[Byte](len)
            body.readBytes(payload)
            Right(payload)
          }
        }
      parsed match {
        case Left((status, message)) => respondTrailersOnly(ctx, status, message)
        case Right(payload) =>
          val reqPath = path
          // run the (possibly long) compaction OFF the event loop; netty
          // channels accept writes from any thread
          worker.execute(() => {
            val result: Either[(Int, String), Array[Byte]] =
              try reqPath match {
                case PathEcho =>
                  Right(CompactorProto.encodeEcho(CompactorProto.decodeEcho(payload)))
                case PathRewriteFiles =>
                  Right(WireBridge.rewriteFiles(spark, payload, executor))
                case p =>
                  Left(12 -> s"unknown method $p")
              } catch {
                // mirror the reference's tonic handler (rpc.rs:41): every
                // failure classifies to its CompactionError domain
                case e: Exception =>
                  Left(2 -> ("Internal error: " +
                    graft.sources.GraftError.classify(e).getMessage))
              }
            result match {
              case Right(resp) => respondOk(ctx, resp)
              case Left((status, message)) => respondTrailersOnly(ctx, status, message)
            }
          })
      }
    }

    private def respondOk(ctx: ChannelHandlerContext, resp: Array[Byte]): Unit = {
      val headers = new DefaultHttp2Headers()
      headers.status("200")
      headers.set("content-type", "application/grpc")
      ctx.write(new DefaultHttp2HeadersFrame(headers))
      val framed = Unpooled.buffer(5 + resp.length)
      framed.writeByte(0)
      framed.writeInt(resp.length)
      framed.writeBytes(resp)
      ctx.write(new DefaultHttp2DataFrame(framed))
      val trailers = new DefaultHttp2Headers()
      trailers.set("grpc-status", "0")
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers, true))
    }

    /** gRPC trailers-only error response (spec-permitted: HEADERS carrying
      * both :status and grpc-status with END_STREAM).
      */
    private def respondTrailersOnly(
        ctx: ChannelHandlerContext, grpcStatus: Int, message: String): Unit = {
      val headers = new DefaultHttp2Headers()
      headers.status("200")
      headers.set("content-type", "application/grpc")
      headers.set("grpc-status", grpcStatus.toString)
      headers.set("grpc-message", percentEncode(message))
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(headers, true))
    }
  }

  /** gRPC `grpc-message` percent-encoding: %, non-ASCII, and control bytes
    * encode as %XX over UTF-8 (the gRPC HTTP/2 transport mapping).
    */
  def percentEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = b & 0xff
      if (c >= 0x20 && c <= 0x7e && c != '%') sb.append(c.toChar)
      else sb.append(f"%%$c%02X")
    }
    sb.toString
  }

  def percentDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toInt); i += 1 }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }
}
