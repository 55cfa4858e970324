package graft.wire

import java.net.InetSocketAddress
import java.util.concurrent.{CompletableFuture, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2._
import io.netty.util.ReferenceCountUtil

/** Stock-shaped gRPC h2c client for [[GrpcCompactionServer]] — the
  * grpcurl-equivalent round-trip proof: it speaks the REAL protocol
  * (HTTP/2 prior-knowledge preface, SETTINGS, HPACK headers, flow control
  * — all from netty-codec-http2, the codec grpc-java itself runs on) and
  * the standard gRPC layer (`POST /compactor.CompactorService/<Method>`,
  * `content-type: application/grpc`, `te: trailers`, length-prefixed
  * messages, `grpc-status` trailers). Any server this client can call, a
  * stock gRPC client can call, and vice versa.
  */
final class GrpcCompactionClient(host: String, port: Int) {

  private val group = new NioEventLoopGroup(1, (r: Runnable) => {
    val t = new Thread(r, "graft-grpc-client"); t.setDaemon(true); t
  })

  private val channel: Channel = new Bootstrap()
    .group(group)
    .channel(classOf[NioSocketChannel])
    .handler(new ChannelInitializer[SocketChannel] {
      override def initChannel(ch: SocketChannel): Unit =
        ch.pipeline().addLast(
          Http2FrameCodecBuilder.forClient().build(),
          // inbound server-initiated streams: none in gRPC; drop politely
          new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
    })
    .connect(new InetSocketAddress(host, port)).sync().channel()

  /** One unary RPC: returns the response message bytes, or throws
    * `GrpcCompactionClient.StatusException` carrying grpc-status/-message.
    */
  def call(path: String, payload: Array[Byte], timeoutSec: Long = 300L): Array[Byte] = {
    val done = new CompletableFuture[Array[Byte]]()
    val stream = new Http2StreamChannelBootstrap(channel)
      .handler(new GrpcCompactionClient.ResponseHandler(done))
      .open().sync().getNow
    val headers = new DefaultHttp2Headers()
    headers.method("POST")
    headers.scheme("http")
    headers.path(path)
    headers.authority(s"$host:$port")
    headers.set("content-type", "application/grpc")
    headers.set("te", "trailers")
    stream.write(new DefaultHttp2HeadersFrame(headers))
    val framed = Unpooled.buffer(5 + payload.length)
    framed.writeByte(0)
    framed.writeInt(payload.length)
    framed.writeBytes(payload)
    stream.writeAndFlush(new DefaultHttp2DataFrame(framed, true))
    try done.get(timeoutSec, TimeUnit.SECONDS)
    catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
      case e: java.util.concurrent.TimeoutException =>
        // cancel the stream (RST_STREAM) so a hung server call doesn't leak
        // the open stream + its buffered response bytes on this long-lived
        // connection; channelInactive releases the handler's buffer
        stream.close()
        throw e
    }
  }

  def close(): Unit = {
    channel.close().sync()
    group.shutdownGracefully(0, 1, TimeUnit.SECONDS)
  }
}

object GrpcCompactionClient {

  final class StatusException(val grpcStatus: Int, val grpcMessage: String)
      extends RuntimeException(s"grpc-status $grpcStatus: $grpcMessage")

  /** Collects HEADERS/DATA/trailers of one response stream and completes
    * the future on END_STREAM with either the unwrapped message or a
    * status error.
    */
  private final class ResponseHandler(done: CompletableFuture[Array[Byte]])
      extends ChannelInboundHandlerAdapter {

    private val body = Unpooled.buffer()
    private var status: Option[Int] = None
    private var message = ""

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
      msg match {
        case h: Http2HeadersFrame =>
          Option(h.headers.get("grpc-status")).foreach { s =>
            status = Some(s.toString.toInt)
            message = Option(h.headers.get("grpc-message"))
              .map(m => GrpcCompactionServer.percentDecode(m.toString))
              .getOrElse("")
          }
          if (h.isEndStream) finish(ctx)
        case d: Http2DataFrame =>
          val consumed = d.initialFlowControlledBytes
          body.writeBytes(d.content)
          d.release()
          if (consumed > 0)
            ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(consumed))
          if (d.isEndStream) finish(ctx)
        case other => ReferenceCountUtil.release(other)
      }

    private def finish(ctx: ChannelHandlerContext): Unit = {
      status match {
        case Some(0) =>
          if (body.readableBytes < 5)
            done.completeExceptionally(new StatusException(13,
              s"OK trailer but malformed body (${body.readableBytes} bytes)"))
          else {
            body.readByte() // compressed flag
            val len = body.readInt()
            val out = new Array[Byte](len)
            body.readBytes(out)
            done.complete(out)
          }
        case Some(s) =>
          done.completeExceptionally(new StatusException(s, message))
        case None =>
          done.completeExceptionally(new StatusException(13,
            "stream ended without grpc-status"))
      }
      ctx.close()
    }

    override def channelInactive(ctx: ChannelHandlerContext): Unit = {
      body.release()
      if (!done.isDone)
        done.completeExceptionally(new StatusException(14, "stream closed early"))
      super.channelInactive(ctx)
    }

    override def exceptionCaught(ctx: ChannelHandlerContext, cause: Throwable): Unit = {
      done.completeExceptionally(cause)
      ctx.close()
    }
  }
}
