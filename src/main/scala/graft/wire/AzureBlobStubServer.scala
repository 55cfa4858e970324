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

/** Minimal in-process Azure-Blob-compatible store over HTTP — the sandbox
  * stand-in that lets the Azure FileIO seam be exercised END-TO-END
  * (parquet scans and committer writes flow through genuine Blob REST
  * requests; the container ships no `hadoop-azure`). Implements exactly
  * the published operations [[AzureBlobFileSystem]] issues:
  *
  *   - `PUT /container/blob` (Put Blob) → 201; with `x-ms-copy-source`,
  *     a synchronous server-side copy → 202 + `x-ms-copy-status: success`
  *   - `GET /container/blob` — honors `x-ms-range`/`Range` with 206
  *   - `HEAD /container/blob` (Get Blob Properties) → 200 / 404
  *   - `DELETE /container/blob` (Delete Blob) → 202; 404 when absent
  *   - `GET /container?restype=container&comp=list&prefix=…[&delimiter=/]`
  *     (List Blobs) → `EnumerationResults` XML, `Blob` + `BlobPrefix`,
  *     PAGED like the real service: at most `pageSize` items (further
  *     capped by a `maxresults` query param) per response, a non-empty
  *     `NextMarker` when more remain, and a `marker` request param
  *     resuming at the marked item. Real Azure pages at 5,000 — a client
  *     that reads only the first page silently truncates large prefixes,
  *     so tests construct the stub with a tiny `pageSize` to force the
  *     loop.
  *
  * Auth headers are accepted and ignored — the stub validates protocol
  * shape, not signatures. Blobs live in one in-JVM map keyed
  * `container/blob`.
  */
final class AzureBlobStubServer(port: Int = 0, pageSize: Int = 5000) {

  private val blobs = new ConcurrentHashMap[String, Array[Byte]]()

  private val group = new NioEventLoopGroup(1, (r: Runnable) => {
    val t = new Thread(r, "graft-azstub-eventloop"); t.setDaemon(true); t
  })

  private val channel: Channel = new ServerBootstrap()
    .group(group)
    .channel(classOf[NioServerSocketChannel])
    .childHandler(new ChannelInitializer[SocketChannel] {
      override def initChannel(ch: SocketChannel): Unit =
        ch.pipeline().addLast(
          new HttpServerCodec(),
          new HttpObjectAggregator(1 << 28), // 256 MiB blobs
          new Handler)
    })
    .bind(InetAddress.getLoopbackAddress, port).sync().channel()

  def boundPort: Int =
    channel.localAddress().asInstanceOf[InetSocketAddress].getPort

  def endpoint: String = s"http://127.0.0.1:$boundPort"

  /** Test visibility: all stored container/blob keys, sorted. */
  def keys: Seq[String] = blobs.keySet().asScala.toSeq.sorted

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

    private def xml(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    private def notFound(): FullHttpResponse = response(
      HttpResponseStatus.NOT_FOUND,
      ("""<?xml version="1.0"?><Error><Code>BlobNotFound</Code></Error>""")
        .getBytes(StandardCharsets.UTF_8),
      "application/xml")

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
          "missing container".getBytes(StandardCharsets.UTF_8))
      val cont = segs.head
      // trailing slashes are SIGNIFICANT (`dir/` markers denote empty dirs)
      val key = segs.tail.mkString("/") +
        (if (path.endsWith("/") && segs.length > 1) "/" else "")
      val stored = s"$cont/$key"

      (req.method(), key.isEmpty) match {
        case (HttpMethod.GET, true)
            if query.get("restype").contains("container") &&
              query.get("comp").contains("list") =>
          list(cont, query)
        case (HttpMethod.PUT, false) =>
          Option(req.headers().get("x-ms-copy-source")) match {
            case Some(srcUrl) =>
              // the copy source is an absolute URL; URI.getPath already
              // percent-DECODES it exactly once — a second decode would
              // corrupt keys containing '+' or literal '%'
              val srcPath =
                java.net.URI.create(srcUrl).getPath.stripPrefix("/")
              Option(blobs.get(srcPath)) match {
                case None => notFound()
                case Some(bytes) =>
                  blobs.put(stored, bytes)
                  response(HttpResponseStatus.ACCEPTED, Array.emptyByteArray,
                    extraHeaders = Seq("x-ms-copy-status" -> "success"))
              }
            case None =>
              val body = new Array[Byte](req.content().readableBytes())
              req.content().readBytes(body)
              blobs.put(stored, body)
              response(HttpResponseStatus.CREATED, Array.emptyByteArray)
          }
        case (HttpMethod.GET, false) =>
          Option(blobs.get(stored)) match {
            case None => notFound()
            case Some(bytes) =>
              val range = Option(req.headers().get("x-ms-range"))
                .orElse(Option(req.headers().get(HttpHeaderNames.RANGE)))
              range match {
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
          Option(blobs.get(stored)) match {
            case None =>
              response(HttpResponseStatus.NOT_FOUND, Array.emptyByteArray)
            case Some(bytes) =>
              val r = response(HttpResponseStatus.OK, Array.emptyByteArray)
              r.headers().setInt(HttpHeaderNames.CONTENT_LENGTH, bytes.length)
              r
          }
        case (HttpMethod.DELETE, false) =>
          if (blobs.remove(stored) != null)
            response(HttpResponseStatus.ACCEPTED, Array.emptyByteArray)
          else notFound()
        case _ =>
          response(HttpResponseStatus.BAD_REQUEST,
            s"no route: ${req.method()} $uri".getBytes(StandardCharsets.UTF_8))
      }
    }

    /** List Blobs with real paging semantics (see class doc). */
    private def list(cont: String, query: Map[String, String]): FullHttpResponse = {
      val prefix = query.getOrElse("prefix", "")
      val delimiter = query.get("delimiter").filter(_.nonEmpty)
      val all = blobs.keySet().asScala.toSeq.sorted
        .filter(_.startsWith(s"$cont/"))
        .map(_.drop(cont.length + 1))
        .filter(_.startsWith(prefix))
      val (direct, rolled) = delimiter match {
        case None => (all, Nil)
        case Some(d) =>
          val (files, dirs) = all.partition(k => !k.drop(prefix.length).contains(d))
          (files, dirs.map(k =>
            k.take(prefix.length + k.drop(prefix.length).indexOf(d) + 1))
            .distinct)
      }
      // blobs and prefixes share one lexicographic item stream (the real
      // service interleaves them); the marker names the item the next
      // page STARTS at (Azure's resume-at semantics)
      val items: Seq[(String, Boolean)] =
        (direct.map(_ -> false) ++ rolled.map(_ -> true)).sortBy(_._1)
      val marker = query.get("marker").filter(_.nonEmpty)
      val remaining = marker.fold(items)(m => items.dropWhile(_._1 < m))
      val cap = math.min(pageSize,
        query.get("maxresults").flatMap(_.toIntOption).getOrElse(Int.MaxValue))
      val page = remaining.take(math.max(cap, 1))
      val next = remaining.drop(page.length).headOption.map(_._1)
      val entries = page.collect { case (k, false) =>
        val size = Option(blobs.get(s"$cont/$k")).fold(0)(_.length)
        s"<Blob><Name>${xml(k)}</Name><Properties>" +
          s"<Content-Length>$size</Content-Length>" +
          "<BlobType>BlockBlob</BlobType></Properties></Blob>"
      }.mkString
      val prefixes = page.collect { case (p, true) =>
        s"<BlobPrefix><Name>${xml(p)}</Name></BlobPrefix>"
      }.mkString
      val nextMarker =
        next.fold("<NextMarker/>")(m => s"<NextMarker>${xml(m)}</NextMarker>")
      val body =
        s"""<?xml version="1.0" encoding="utf-8"?>""" +
          s"""<EnumerationResults ContainerName="${xml(cont)}">""" +
          s"<Prefix>${xml(prefix)}</Prefix><Blobs>" +
          entries + prefixes +
          s"</Blobs>$nextMarker</EnumerationResults>"
      response(HttpResponseStatus.OK,
        body.getBytes(StandardCharsets.UTF_8), "application/xml")
    }
  }
}
