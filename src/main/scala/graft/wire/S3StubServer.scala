package graft.wire

import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInitializer, SimpleChannelInboundHandler}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http._

import scala.jdk.CollectionConverters._

/** Minimal in-process S3-compatible object store over HTTP — the sandbox
  * stand-in for the object store the reference's FileIO props point at
  * (`core/proto/iceberg.proto:134-141` ships `s3.endpoint` /
  * `s3.access-key-id` / … to the compactor; without a real store in the
  * container, this stub lets the FileIO seam be exercised END-TO-END:
  * parquet scans and compaction writes flow through genuine S3 REST
  * requests).
  *
  * Implemented protocol subset (path-style addressing, the shape
  * `s3.path-style-access=true` selects):
  *
  *   - `PUT /bucket/key` — store object; with `x-amz-copy-source` header,
  *     server-side copy (the primitive S3 renames are built from)
  *   - `GET /bucket/key` — fetch; honors `Range: bytes=a-b` with 206
  *     (parquet footers and column chunks read this way)
  *   - `HEAD /bucket/key` — length probe, 404 when absent
  *   - `DELETE /bucket/key` — remove, 204 (idempotent like S3)
  *   - `GET /bucket?list-type=2&prefix=…[&delimiter=/]` — ListObjectsV2
  *     XML with `Contents` and `CommonPrefixes`, PAGED like the real
  *     service: at most `pageSize` items (keys + rolled-up prefixes
  *     combined, further capped by a `max-keys` query param) per response,
  *     `IsTruncated=true` + `NextContinuationToken` when more remain, and
  *     a `continuation-token` request param resuming strictly after the
  *     token. Real S3 pages at 1000 — a client that reads only the first
  *     page silently truncates large prefixes, so tests construct the stub
  *     with a tiny `pageSize` to force the loop.
  *
  * Auth headers are accepted and ignored — the stub validates protocol
  * shape, not signatures. Objects live in one in-JVM map keyed
  * `bucket/key`.
  */
final class S3StubServer(port: Int = 0, pageSize: Int = 1000) {

  private val objects = new ConcurrentHashMap[String, Array[Byte]]()

  private val group = new NioEventLoopGroup(1, (r: Runnable) => {
    val t = new Thread(r, "graft-s3stub-eventloop"); t.setDaemon(true); t
  })

  private val channel: Channel = new ServerBootstrap()
    .group(group)
    .channel(classOf[NioServerSocketChannel])
    .childHandler(new ChannelInitializer[SocketChannel] {
      override def initChannel(ch: SocketChannel): Unit =
        ch.pipeline().addLast(
          new HttpServerCodec(),
          new HttpObjectAggregator(1 << 28), // 256 MiB objects
          new Handler)
    })
    .bind(InetAddress.getLoopbackAddress, port).sync().channel()

  def boundPort: Int =
    channel.localAddress().asInstanceOf[InetSocketAddress].getPort

  def endpoint: String = s"http://127.0.0.1:$boundPort"

  /** Test visibility: all stored keys, sorted. */
  def keys: Seq[String] = objects.keySet().asScala.toSeq.sorted

  def close(): Unit = {
    channel.close().sync()
    group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS)
  }

  private final class Handler extends SimpleChannelInboundHandler[FullHttpRequest] {

    override def channelRead0(ctx: ChannelHandlerContext, req: FullHttpRequest): Unit = {
      val resp = route(req)
      if (HttpUtil.isKeepAlive(req)) {
        resp.headers().set(HttpHeaderNames.CONNECTION, HttpHeaderValues.KEEP_ALIVE)
        ctx.writeAndFlush(resp)
      } else ctx.writeAndFlush(resp)
        .addListener(io.netty.channel.ChannelFutureListener.CLOSE)
    }

    override def exceptionCaught(ctx: ChannelHandlerContext, cause: Throwable): Unit =
      ctx.close()

    private def response(
        status: HttpResponseStatus,
        body: Array[Byte],
        contentType: String = "application/octet-stream",
        extraHeaders: Seq[(String, String)] = Nil): FullHttpResponse = {
      val r = new DefaultFullHttpResponse(
        HttpVersion.HTTP_1_1, status, Unpooled.wrappedBuffer(body))
      r.headers()
        .set(HttpHeaderNames.CONTENT_TYPE, contentType)
        .setInt(HttpHeaderNames.CONTENT_LENGTH, body.length)
      extraHeaders.foreach { case (k, v) => r.headers().set(k, v) }
      r
    }

    private def notFound(key: String): FullHttpResponse = response(
      HttpResponseStatus.NOT_FOUND,
      (s"""<?xml version="1.0"?><Error><Code>NoSuchKey</Code>""" +
        s"<Key>${xml(key)}</Key></Error>").getBytes(StandardCharsets.UTF_8),
      "application/xml")

    private def xml(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    private def route(req: FullHttpRequest): FullHttpResponse = {
      val uri = req.uri()
      val path = uri.takeWhile(_ != '?')
      val query = uri.dropWhile(_ != '?').drop(1)
        .split('&').filter(_.nonEmpty).map { p =>
          p.split("=", 2) match {
            case Array(k, v) =>
              k -> java.net.URLDecoder.decode(v.replace("+", "%2B"), "UTF-8")
            case Array(k) => k -> ""
          }
        }.toMap
      val segs = path.split("/").filter(_.nonEmpty)
        .map(s => java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8"))
      if (segs.isEmpty)
        return response(HttpResponseStatus.BAD_REQUEST,
          "missing bucket".getBytes(StandardCharsets.UTF_8))
      val bucket = segs.head
      // a trailing slash is SIGNIFICANT in S3 keys (`dir/` markers denote
      // empty directories) — segment splitting must not swallow it
      val key = segs.tail.mkString("/") +
        (if (path.endsWith("/") && segs.length > 1) "/" else "")
      val stored = s"$bucket/$key"

      (req.method(), key.isEmpty) match {
        case (HttpMethod.GET, true) => list(bucket, query)
        case (HttpMethod.PUT, false) =>
          Option(req.headers().get("x-amz-copy-source")) match {
            case Some(src) =>
              val srcKey = java.net.URLDecoder.decode(
                src.stripPrefix("/"), "UTF-8")
              Option(objects.get(srcKey)) match {
                case None => notFound(srcKey)
                case Some(bytes) =>
                  objects.put(stored, bytes)
                  response(HttpResponseStatus.OK,
                    """<?xml version="1.0"?><CopyObjectResult/>"""
                      .getBytes(StandardCharsets.UTF_8), "application/xml")
              }
            case None =>
              val body = new Array[Byte](req.content().readableBytes())
              req.content().readBytes(body)
              objects.put(stored, body)
              response(HttpResponseStatus.OK, Array.emptyByteArray)
          }
        case (HttpMethod.GET, false) =>
          Option(objects.get(stored)) match {
            case None => notFound(stored)
            case Some(bytes) =>
              Option(req.headers().get(HttpHeaderNames.RANGE)) match {
                case Some(r) if r.startsWith("bytes=") =>
                  val Array(a, b) = r.stripPrefix("bytes=").split("-", 2)
                  val from = a.toLong.toInt
                  val to = math.min(
                    if (b.isEmpty) bytes.length - 1L else b.toLong,
                    bytes.length - 1L).toInt
                  if (from > to) response(
                    HttpResponseStatus.REQUESTED_RANGE_NOT_SATISFIABLE,
                    Array.emptyByteArray)
                  else response(HttpResponseStatus.PARTIAL_CONTENT,
                    java.util.Arrays.copyOfRange(bytes, from, to + 1),
                    extraHeaders = Seq("Content-Range" ->
                      s"bytes $from-$to/${bytes.length}"))
                case _ => response(HttpResponseStatus.OK, bytes)
              }
          }
        case (HttpMethod.HEAD, false) =>
          Option(objects.get(stored)) match {
            case None =>
              // HEAD responses carry no body by protocol
              response(HttpResponseStatus.NOT_FOUND, Array.emptyByteArray)
            case Some(bytes) =>
              val r = response(HttpResponseStatus.OK, Array.emptyByteArray)
              r.headers().setInt(HttpHeaderNames.CONTENT_LENGTH, bytes.length)
              r
          }
        case (HttpMethod.DELETE, false) =>
          objects.remove(stored)
          response(HttpResponseStatus.NO_CONTENT, Array.emptyByteArray)
        case _ =>
          response(HttpResponseStatus.BAD_REQUEST,
            s"no route: ${req.method()} $uri".getBytes(StandardCharsets.UTF_8))
      }
    }

    /** ListObjectsV2 with real paging semantics (see class doc). */
    private def list(bucket: String, query: Map[String, String]): FullHttpResponse = {
      val prefix = query.getOrElse("prefix", "")
      val delimiter = query.get("delimiter").filter(_.nonEmpty)
      val all = objects.keySet().asScala.toSeq.sorted
        .filter(_.startsWith(s"$bucket/"))
        .map(_.drop(bucket.length + 1))
        .filter(_.startsWith(prefix))
      val (direct, rolled) = delimiter match {
        case None => (all, Nil)
        case Some(d) =>
          val (files, dirs) = all.partition(k => !k.drop(prefix.length).contains(d))
          (files, dirs.map(k =>
            k.take(prefix.length + k.drop(prefix.length).indexOf(d) + 1))
            .distinct)
      }
      // keys and rolled-up prefixes share one lexicographic item stream
      // (the real service interleaves them); the continuation token is the
      // last item of the previous page, resumed strictly-after
      val items: Seq[(String, Boolean)] =
        (direct.map(_ -> false) ++ rolled.map(_ -> true)).sortBy(_._1)
      val after = query.get("continuation-token").filter(_.nonEmpty)
      val remaining = after.fold(items)(t => items.dropWhile(_._1 <= t))
      val cap = math.min(pageSize,
        query.get("max-keys").flatMap(_.toIntOption).getOrElse(Int.MaxValue))
      val page = remaining.take(math.max(cap, 1))
      val truncated = remaining.lengthCompare(page.length) > 0
      val contents = page.collect { case (k, false) =>
        val size = Option(objects.get(s"$bucket/$k")).fold(0)(_.length)
        s"<Contents><Key>${xml(k)}</Key><Size>$size</Size>" +
          "<LastModified>2026-01-01T00:00:00.000Z</LastModified></Contents>"
      }.mkString
      val prefixes = page.collect { case (p, true) =>
        s"<CommonPrefixes><Prefix>${xml(p)}</Prefix></CommonPrefixes>"
      }.mkString
      val nextToken =
        if (truncated)
          s"<NextContinuationToken>${xml(page.last._1)}</NextContinuationToken>"
        else ""
      val body =
        s"""<?xml version="1.0" encoding="UTF-8"?>""" +
          s"<ListBucketResult><Name>${xml(bucket)}</Name>" +
          s"<Prefix>${xml(prefix)}</Prefix><IsTruncated>$truncated</IsTruncated>" +
          nextToken +
          s"<KeyCount>${page.size}</KeyCount>" +
          contents + prefixes + "</ListBucketResult>"
      response(HttpResponseStatus.OK,
        body.getBytes(StandardCharsets.UTF_8), "application/xml")
    }
  }
}
