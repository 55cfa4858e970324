package graft.wire

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal PostgreSQL frontend (wire protocol v3, the public
  * "Frontend/Backend Protocol" documentation) — just enough client to run
  * the catalog-pointer SQL a production `SqlCatalog` deployment issues
  * (the reference deploys its pointer in postgres,
  * `core/src/compaction/mod.rs:183-202`). Hand-rolled for the same reason
  * the S3 and proto3 codecs are: the sandbox ships a real postgres server
  * but no JDBC driver jar, and the wire shape is small and public.
  *
  * Scope (deliberately narrow):
  *  - `trust` authentication only — any other `AuthenticationXxx` request
  *    fails loudly (the test server is started with `-A trust`; a
  *    production pointer would front this with a real driver);
  *  - the SIMPLE QUERY flow only (`Q` → `T`/`D`/`C`/`Z`), text-format
  *    result columns;
  *  - one socket, synchronous, caller-synchronized (the HeadStore wraps
  *    every call in `synchronized`, mirroring the Derby store).
  *
  * Errors surface as [[PgWireClient.PgError]] carrying the server's
  * SQLSTATE (`C` field) and message (`M` field); the stream is drained to
  * `ReadyForQuery` first so the connection stays usable — the same
  * per-statement recovery contract JDBC gives.
  */
final class PgWireClient(
    host: String,
    port: Int,
    user: String,
    database: String) extends AutoCloseable {

  import PgWireClient._

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(
    new BufferedInputStream(socket.getInputStream))
  private val out = new DataOutputStream(
    new BufferedOutputStream(socket.getOutputStream))

  startup()

  /** StartupMessage (no type byte): length, protocol 3.0, k\0v\0 pairs,
    * trailing NUL — then read until ReadyForQuery, accepting only
    * AuthenticationOk.
    */
  private def startup(): Unit = {
    val params = Array("user", user, "database", database)
    val body = params.map(p => p.getBytes(UTF_8) :+ 0.toByte)
      .foldLeft(Array.empty[Byte])(_ ++ _) :+ 0.toByte
    out.writeInt(4 + 4 + body.length)
    out.writeInt(196608) // protocol 3.0
    out.write(body)
    out.flush()
    var ready = false
    while (!ready) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'R' =>
          val code = java.nio.ByteBuffer.wrap(payload).getInt
          if (code != 0)
            throw new IllegalStateException(
              s"postgres requested authentication type $code; this client " +
                "supports trust auth only (start the server with -A trust)")
        case 'S' | 'K' | 'N' => () // ParameterStatus / BackendKeyData / Notice
        case 'Z' => ready = true
        case 'E' => throw parseError(payload)
        case other =>
          throw new IllegalStateException(
            s"unexpected message '${other.toChar}' during postgres startup")
      }
    }
  }

  /** Run one simple-query round trip. Returns the LAST statement's command
    * tag and every text-format row seen (multi-statement strings compose
    * like a JDBC `execute` loop would).
    */
  def query(sql: String): PgResult = {
    val sqlBytes = sql.getBytes(UTF_8)
    out.writeByte('Q')
    out.writeInt(4 + sqlBytes.length + 1)
    out.write(sqlBytes)
    out.writeByte(0)
    out.flush()
    var tag = ""
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Option[String]]]
    var error: PgError = null
    var ready = false
    while (!ready) {
      val (tpe, payload) = readMessage()
      tpe match {
        case 'T' | 'S' | 'N' | 'I' => () // RowDescription / status / notice / empty
        case 'D' =>
          val bb = java.nio.ByteBuffer.wrap(payload)
          val n = bb.getShort.toInt
          rows += (0 until n).map { _ =>
            val len = bb.getInt
            if (len < 0) None
            else {
              val b = new Array[Byte](len)
              bb.get(b)
              Some(new String(b, UTF_8))
            }
          }
        case 'C' =>
          val end = payload.indexOf(0.toByte)
          tag = new String(payload, 0, if (end < 0) payload.length else end, UTF_8)
        case 'E' => error = parseError(payload) // drain to Z, then throw
        case 'Z' => ready = true
        case other =>
          throw new IllegalStateException(
            s"unexpected message '${other.toChar}' in query flow")
      }
    }
    if (error != null) throw error
    PgResult(tag, rows.toSeq)
  }

  override def close(): Unit = {
    try {
      out.writeByte('X') // Terminate
      out.writeInt(4)
      out.flush()
    } catch { case _: Exception => () }
    socket.close()
  }

  /** One backend message: type byte + i32 length (self-inclusive). */
  private def readMessage(): (Char, Array[Byte]) = {
    val tpe = in.readByte().toChar
    val len = in.readInt()
    require(len >= 4 && len <= MaxMessageBytes,
      s"postgres message '$tpe' has implausible length $len")
    val payload = new Array[Byte](len - 4)
    in.readFully(payload)
    (tpe, payload)
  }

  /** ErrorResponse fields: (code byte, NUL-terminated value)*, NUL. */
  private def parseError(payload: Array[Byte]): PgError = {
    var i = 0
    var sqlState = ""
    var message = ""
    while (i < payload.length && payload(i) != 0) {
      val code = payload(i).toChar
      i += 1
      val start = i
      while (i < payload.length && payload(i) != 0) i += 1
      val value = new String(payload, start, i - start, UTF_8)
      i += 1
      code match {
        case 'C' => sqlState = value
        case 'M' => message = value
        case _ => ()
      }
    }
    PgError(sqlState, message)
  }
}

object PgWireClient {

  /** Pointer-catalog rows are tiny; anything near this is a framing bug. */
  private val MaxMessageBytes = 64 << 20

  final case class PgResult(commandTag: String, rows: Seq[Seq[Option[String]]])

  final case class PgError(sqlState: String, message: String)
      extends RuntimeException(s"postgres error [$sqlState]: $message")
}
