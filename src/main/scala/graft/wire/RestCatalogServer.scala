package graft.wire

import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInitializer, SimpleChannelInboundHandler}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http._

import graft.sources.GraftCatalog

/** Iceberg-REST-catalog-shaped JSON doorway over [[GraftCatalog]] — the
  * reference ecosystem's OTHER deployment shape (an Iceberg compactor is
  * normally pointed at a REST catalog endpoint; the reference reaches its
  * catalog through `SqlCatalog`, `core/src/compaction/mod.rs:183-202`).
  * Serving the same head/snapshot surface REST-shaped means a stock
  * ecosystem client can browse this catalog with zero graft imports.
  *
  * Routes (the read surface of the Iceberg REST spec, single flat
  * namespace `default` — [[GraftCatalog]] is flat):
  *
  *   - `GET /v1/config` → `{"defaults":{},"overrides":{}}`
  *   - `GET /v1/namespaces` → `{"namespaces":[["default"]]}`
  *   - `GET /v1/namespaces/default/tables` → table identifier list
  *   - `GET /v1/namespaces/default/tables/{t}` → table metadata:
  *     format-version, current-snapshot-id, the snapshot log (ids +
  *     sequence numbers + commit file mtimes), and `refs` (main branch +
  *     every tag) — the HEAD/snapshot surface a catalog browser reads.
  *   - errors use the spec's envelope
  *     (`{"error":{"message":…,"type":…,"code":…}}`), 404 for a missing
  *     table with `NoSuchTableException`.
  *
  * Transport is HTTP/1.1 (netty-codec-http, already on the Spark runtime
  * classpath) rather than the gRPC doorway's h2c: REST catalog clients —
  * curl, `HttpURLConnection`, the Iceberg REST client itself — speak
  * plain HTTP/1.1, and prior-knowledge h2 would shut all of them out.
  * Same scaffolding shape as [[GrpcCompactionServer]]: one daemon event
  * loop, loopback bind, port 0 for tests. Requests are served from
  * catalog METADATA only (snapshot documents + refs — no SparkSession,
  * no data IO), so the doorway stays cheap no matter the table size: the
  * same O(metadata) contract the reference's catalog layer has.
  */
final class RestCatalogServer(catalog: GraftCatalog, port: Int = 0) {

  import RestCatalogServer._

  private val group = new NioEventLoopGroup(1, (r: Runnable) => {
    val t = new Thread(r, "graft-rest-eventloop"); t.setDaemon(true); t
  })

  private val channel: Channel = new ServerBootstrap()
    .group(group)
    .channel(classOf[NioServerSocketChannel])
    .childHandler(new ChannelInitializer[SocketChannel] {
      override def initChannel(ch: SocketChannel): Unit =
        ch.pipeline().addLast(
          new HttpServerCodec(),
          new HttpObjectAggregator(1 << 20),
          new Handler(catalog))
    })
    .bind(InetAddress.getLoopbackAddress, port).sync().channel()

  def boundPort: Int =
    channel.localAddress().asInstanceOf[InetSocketAddress].getPort

  def close(): Unit = {
    channel.close().sync()
    group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS)
  }
}

object RestCatalogServer {

  private final class Handler(catalog: GraftCatalog)
      extends SimpleChannelInboundHandler[FullHttpRequest] {

    override def channelRead0(ctx: ChannelHandlerContext, req: FullHttpRequest): Unit = {
      val (status, body) =
        try route(catalog, req.method(), req.uri())
        catch { case e: Exception =>
          // e.getMessage may be null (bare NPEs): the envelope must still
          // render or the client sees a reset instead of the 500
          HttpResponseStatus.INTERNAL_SERVER_ERROR ->
            errorJson(Option(e.getMessage).getOrElse(e.getClass.getName),
              "InternalServerError", 500)
        }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      val resp = new DefaultFullHttpResponse(
        HttpVersion.HTTP_1_1, status, Unpooled.wrappedBuffer(bytes))
      resp.headers()
        .set(HttpHeaderNames.CONTENT_TYPE, "application/json")
        .setInt(HttpHeaderNames.CONTENT_LENGTH, bytes.length)
      if (HttpUtil.isKeepAlive(req)) {
        resp.headers().set(HttpHeaderNames.CONNECTION, HttpHeaderValues.KEEP_ALIVE)
        ctx.writeAndFlush(resp)
      } else {
        // HTTP/1.0 or Connection: close — the peer reads to EOF; leaving
        // the socket open hangs it and leaks the connection on our loop
        ctx.writeAndFlush(resp)
          .addListener(io.netty.channel.ChannelFutureListener.CLOSE)
      }
    }

    override def exceptionCaught(ctx: ChannelHandlerContext, cause: Throwable): Unit =
      ctx.close()
  }

  private[wire] def route(
      catalog: GraftCatalog,
      method: HttpMethod,
      uri: String): (HttpResponseStatus, String) = {
    val path = uri.takeWhile(_ != '?')
    // percent-decode ONLY: URLDecoder is form decoding, where '+' means
    // space — but '+' is a legal literal path character (RFC 3986), so a
    // table named a+b would decode to "a b" and 404 right after being
    // listed. Escaping '+' first makes URLDecoder a pure percent-decoder.
    val segs = path.split('/').filter(_.nonEmpty).toSeq
      .map(s => java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8"))
    (method, segs) match {
      case (HttpMethod.GET, Seq("v1", "config")) =>
        HttpResponseStatus.OK -> """{"defaults":{},"overrides":{}}"""
      case (HttpMethod.GET, Seq("v1", "namespaces")) =>
        HttpResponseStatus.OK -> """{"namespaces":[["default"]]}"""
      case (HttpMethod.GET, Seq("v1", "namespaces", "default")) =>
        HttpResponseStatus.OK -> """{"namespace":["default"],"properties":{}}"""
      case (HttpMethod.GET, Seq("v1", "namespaces", "default", "tables")) =>
        val ids = catalog.tables().sorted.map(t =>
          s"""{"namespace":["default"],"name":${q(t)}}""")
        HttpResponseStatus.OK -> s"""{"identifiers":[${ids.mkString(",")}]}"""
      case (HttpMethod.GET, Seq("v1", "namespaces", "default", "tables", t)) =>
        if (!catalog.tables().contains(t))
          HttpResponseStatus.NOT_FOUND ->
            errorJson(s"Table does not exist: default.$t", "NoSuchTableException", 404)
        else HttpResponseStatus.OK -> tableJson(catalog, t)
      case (HttpMethod.GET, Seq("v1", "namespaces", ns, _*)) =>
        HttpResponseStatus.NOT_FOUND ->
          errorJson(s"Namespace does not exist: $ns", "NoSuchNamespaceException", 404)
      case _ =>
        HttpResponseStatus.NOT_FOUND ->
          errorJson(s"No route for ${method.name} $path", "NotFoundException", 404)
    }
  }

  /** The Iceberg REST `LoadTableResult` surface this catalog can answer
    * from metadata: snapshot log, HEAD, refs, and the canonical schema
    * (when recorded) as an Iceberg-spec struct schema with the REAL field
    * ids the catalog already persists. Sequence number == snapshot id
    * (the catalog's commit counter is its sequence domain) and timestamps
    * are the snapshot documents' mtimes — the catalog does not persist
    * commit wall-clocks separately.
    */
  private def tableJson(catalog: GraftCatalog, table: String): String = {
    val head = catalog.currentSnapshotId(table)
    val snaps = catalog.snapshotIds(table).map { id =>
      s"""{"snapshot-id":$id,"sequence-number":$id,"timestamp-ms":${snapMtime(catalog, table, id)}}"""
    }
    val refs =
      (s""""main":{"snapshot-id":$head,"type":"branch"}""" +:
        catalog.tags(table).toSeq.sortBy(_._1).map { case (tag, id) =>
          s"""${q(tag)}:{"snapshot-id":$id,"type":"tag"}"""
        }).mkString(",")
    val schemaPart = catalog.currentSchema(table).map { sch =>
      val fields = sch.fields.flatMap { f =>
        for {
          id <- graft.sources.FieldIds.idOf(f)
          t <- icebergTypeName(f.dataType)
        } yield s"""{"id":$id,"name":${q(f.name)},"required":${!f.nullable},"type":${q(t)}}"""
      }
      s""""current-schema-id":0,"schemas":[{"type":"struct","schema-id":0,""" +
        s""""fields":[${fields.mkString(",")}]}],"""
    }.getOrElse("")
    s"""{"metadata":{"format-version":2,"table-uuid":${q(uuidOf(table))},""" +
      schemaPart +
      s""""current-snapshot-id":$head,"snapshots":[${snaps.mkString(",")}],""" +
      s""""refs":{$refs}}}"""
  }

  /** Iceberg spec primitive type names for the Spark types the catalog's
    * canonical schemas use; fields of unmapped types are omitted from the
    * rendered schema rather than guessed (the rest of the metadata still
    * serves).
    */
  private def icebergTypeName(
      dt: org.apache.spark.sql.types.DataType): Option[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType => Some("boolean")
      case IntegerType => Some("int")
      case LongType => Some("long")
      case FloatType => Some("float")
      case DoubleType => Some("double")
      case StringType => Some("string")
      case BinaryType => Some("binary")
      case DateType => Some("date")
      case TimestampType => Some("timestamptz")
      case TimestampNTZType => Some("timestamp")
      case d: DecimalType => Some(s"decimal(${d.precision}, ${d.scale})")
      case _ => None
    }
  }

  private def snapMtime(catalog: GraftCatalog, table: String, id: Long): Long =
    try java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(catalog.rootDir, table, s"snap-$id.tsv")).toMillis
    catch { case _: Exception => 0L }

  /** Deterministic UUID from the table name (the catalog has no stored
    * uuid; type-3 keeps repeat loads stable, which is all clients check).
    */
  private def uuidOf(table: String): String =
    java.util.UUID.nameUUIDFromBytes(
      s"graft:$table".getBytes(StandardCharsets.UTF_8)).toString

  private def errorJson(message: String, errType: String, code: Int): String =
    s"""{"error":{"message":${q(message)},"type":${q(errType)},"code":$code}}"""

  /** JSON string literal (same escape set as Verify's dump writer). */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
