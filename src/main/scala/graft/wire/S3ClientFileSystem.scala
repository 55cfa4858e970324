package graft.wire

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException, OutputStream}
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import scala.util.matching.Regex

/** Hadoop `FileSystem` mechanics shared by every object-store protocol
  * this library speaks (S3, GCS-XML, Azure Blob — the container ships no
  * connector jars, so the protocols are implemented directly; each store's
  * in-process stub exercises them end-to-end in tests). Subclasses supply
  * only the PROTOCOL layer (HEAD/PUT/ranged-GET/DELETE/server-side
  * copy/LIST); the FileSystem contract mapping lives here once:
  *
  *   - objects are files; directories are key prefixes. `mkdirs` writes a
  *     zero-byte `key/` marker so EMPTY directories are visible (the
  *     committer's `_temporary` tree needs this).
  *   - `open` reads via ranged GETs ([[RangeInput]]) — parquet footer +
  *     column-chunk access patterns map to exactly the ranges requested.
  *   - `create` buffers and PUTs on close (objects are immutable).
  *   - `rename` is LIST + server-side COPY + DELETE per object — object
  *     stores have no rename; this is the same client-side emulation the
  *     stock connectors perform, and it makes the classic
  *     `FileOutputCommitter` work unchanged.
  */
abstract class ObjectStoreFileSystem extends FileSystem {

  /** URI scheme this filesystem serves (`s3`, `gs`, `wasb`). */
  protected def schemeName: String

  /** Conf keys resolved (first hit wins) to the HTTP endpoint. */
  protected def endpointKeys: Seq[String]

  // ---- protocol layer (one subclass per wire dialect) ----------------------

  protected def headLength(bucket: String, key: String): Option[Long]
  protected def putBytes(bucket: String, key: String, bytes: Array[Byte]): Unit
  protected def readRange(
      bucket: String, key: String, pos: Long, buf: Array[Byte],
      off: Int, n: Int): Int
  protected def deleteKey(bucket: String, key: String): Unit
  protected def copyKey(bucket: String, from: String, to: String): Unit

  /** (objects as key→size, common prefixes). */
  protected def listRaw(
      bucket: String, prefix: String,
      delimited: Boolean): (Seq[(String, Long)], Seq[String])

  // ---- shared plumbing ------------------------------------------------------

  private var fsUri: URI = _
  protected var endpoint: String = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    endpoint = endpointKeys.iterator.flatMap(k => Option(conf.get(k)))
      .nextOption()
      .getOrElse(throw new IOException(
        s"$schemeName filesystem requires one of " +
          endpointKeys.mkString(" / ") + " — the FileIO endpoint property " +
          "maps onto it"))
  }

  override def getScheme: String = schemeName
  override def getUri: URI = fsUri

  private var workingDir: Path = _
  override def getWorkingDirectory: Path = {
    if (workingDir == null) workingDir = new Path(fsUri.toString + "/")
    workingDir
  }
  override def setWorkingDirectory(dir: Path): Unit = workingDir = dir

  /** (bucket/container, key) of a store path; key has no leading slash. */
  protected def split(f: Path): (String, String) = {
    val u = f.toUri
    val bucket = Option(u.getAuthority).getOrElse(fsUri.getAuthority)
    (bucket, Option(u.getPath).getOrElse("").stripPrefix("/"))
  }

  protected def enc(s: String): String =
    s.split("/", -1).map(java.net.URLEncoder.encode(_, "UTF-8")
      .replace("+", "%20")).mkString("/")

  protected def conn(method: String, url: URL): HttpURLConnection = {
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c
  }

  protected def drain(c: HttpURLConnection): Unit = {
    val in = if (c.getResponseCode < 400) c.getInputStream else c.getErrorStream
    if (in != null) { in.readAllBytes(); in.close() }
  }

  private def pathOf(bucket: String, key: String): Path =
    new Path(s"$schemeName://$bucket/$key")

  private def fileStatus(bucket: String, key: String, len: Long): FileStatus =
    new FileStatus(len, false, 1, 32 * 1024 * 1024, 0L, pathOf(bucket, key))

  private def dirStatus(bucket: String, key: String): FileStatus =
    new FileStatus(0, true, 1, 0, 0L,
      if (key.isEmpty) new Path(s"$schemeName://$bucket/")
      else pathOf(bucket, key))

  // ---- FileSystem contract ----------------------------------------------

  override def getFileStatus(f: Path): FileStatus = {
    val (bucket, key) = split(f)
    if (key.isEmpty) return dirStatus(bucket, key)
    headLength(bucket, key) match {
      case Some(len) => fileStatus(bucket, key, len)
      case None =>
        val (objs, prefixes) = listRaw(bucket, key + "/", delimited = true)
        if (objs.nonEmpty || prefixes.nonEmpty) dirStatus(bucket, key)
        else throw new FileNotFoundException(f.toString)
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val (bucket, key) = split(f)
    if (key.nonEmpty && headLength(bucket, key).isDefined)
      return Array(getFileStatus(f))
    val prefix = if (key.isEmpty) "" else key + "/"
    val (objs, prefixes) = listRaw(bucket, prefix, delimited = true)
    if (key.nonEmpty && objs.isEmpty && prefixes.isEmpty)
      throw new FileNotFoundException(f.toString)
    val files = objs
      .filter(_._1 != prefix) // the empty-dir marker is not a child
      .map { case (k, len) =>
        if (k.endsWith("/")) dirStatus(bucket, k.stripSuffix("/"))
        else fileStatus(bucket, k, len)
      }
    val dirs = prefixes.map(p => dirStatus(bucket, p.stripSuffix("/")))
    (files ++ dirs).toArray
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val (bucket, key) = split(f)
    val len = headLength(bucket, key)
      .getOrElse(throw new FileNotFoundException(f.toString))
    new FSDataInputStream(new RangeInput(bucket, key, len))
  }

  override def create(
      f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val (bucket, key) = split(f)
    if (!overwrite && headLength(bucket, key).isDefined)
      throw new IOException(s"$f already exists")
    new FSDataOutputStream(new BufferedPut(bucket, key), statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      s"$schemeName objects are immutable — no append")

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val (bucket, key) = split(f)
    if (key.isEmpty) return true
    // zero-byte `key/` marker: makes the EMPTY directory visible to
    // getFileStatus/listStatus (committers probe _temporary before writing)
    putBytes(bucket, key + "/", Array.emptyByteArray)
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val (bucket, key) = split(f)
    if (headLength(bucket, key).isDefined) { deleteKey(bucket, key); true }
    else {
      val (objs, _) = listRaw(bucket, key + "/", delimited = false)
      if (objs.isEmpty) false
      else if (!recursive && objs.exists(_._1 != key + "/"))
        throw new IOException(s"$f is a non-empty directory (recursive=false)")
      else { objs.foreach { case (k, _) => deleteKey(bucket, k) }; true }
    }
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val (bucket, srcKey) = split(src)
    val (dstBucket, dstKey0) = split(dst)
    require(bucket == dstBucket, "cross-bucket rename unsupported")
    // Hadoop semantics: renaming ONTO an existing directory moves src
    // INTO it (FileOutputCommitter's merge relies on this)
    val dstKey =
      if (headLength(bucket, dstKey0).isEmpty && {
        val (o, p) = listRaw(bucket, dstKey0 + "/", delimited = true)
        o.nonEmpty || p.nonEmpty
      }) s"$dstKey0/${src.getName}"
      else dstKey0
    if (headLength(bucket, srcKey).isDefined) {
      copyKey(bucket, srcKey, dstKey)
      deleteKey(bucket, srcKey)
      true
    } else {
      val (objs, _) = listRaw(bucket, srcKey + "/", delimited = false)
      if (objs.isEmpty) false
      else {
        objs.foreach { case (k, _) =>
          copyKey(bucket, k, dstKey + k.stripPrefix(srcKey))
          deleteKey(bucket, k)
        }
        true
      }
    }
  }

  // ---- streams -----------------------------------------------------------

  /** Seekable ranged-GET reader. Each read issues one ranged request for
    * exactly the bytes asked — parquet's own IO planning already batches
    * column chunks, so no extra readahead layer is needed here.
    */
  private final class RangeInput(bucket: String, key: String, len: Long)
      extends FSInputStream {

    private var pos = 0L

    override def seek(newPos: Long): Unit = {
      if (newPos < 0 || newPos > len)
        throw new IOException(s"seek $newPos out of [0, $len]")
      pos = newPos
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n <= 0) -1 else one(0) & 0xff
    }

    override def read(buf: Array[Byte], off: Int, wanted: Int): Int = {
      if (pos >= len) return -1
      val n = math.min(wanted.toLong, len - pos).toInt
      if (n <= 0) return 0
      val read = readRange(bucket, key, pos, buf, off, n)
      pos += read
      read
    }
  }

  /** Buffer-then-PUT writer (objects are immutable; size is test-bounded). */
  private final class BufferedPut(bucket: String, key: String) extends OutputStream {
    private val buf = new ByteArrayOutputStream()
    override def write(b: Int): Unit = buf.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      buf.write(b, off, len)
    override def close(): Unit = putBytes(bucket, key, buf.toByteArray)
  }
}

/** Hadoop `FileSystem` for the `s3://` scheme speaking the S3 REST
  * protocol over plain HTTP — the client half of the FileIO seam (the
  * container has no `hadoop-aws`, so the protocol is implemented here
  * directly; the server half is [[S3StubServer]] in tests, but any
  * path-style S3-compatible endpoint serves). Resolution is the standard
  * Hadoop contract: `fs.s3.impl = graft.wire.S3ClientFileSystem` plus the
  * endpoint under the Iceberg-mapped key `fs.s3a.endpoint` (exactly what
  * [[WireBridge.applyFileIo]] sets from a wire request's `s3.endpoint`
  * FileIO prop) or `fs.s3.endpoint`.
  */
class S3ClientFileSystem extends ObjectStoreFileSystem {

  override protected def schemeName: String = "s3"
  override protected def endpointKeys: Seq[String] =
    Seq("fs.s3a.endpoint", "fs.s3.endpoint")

  protected def objectUrl(bucket: String, key: String): URL =
    new URL(s"$endpoint/$bucket/${enc(key)}")

  /** HEAD → object length, None when absent. */
  override protected def headLength(bucket: String, key: String): Option[Long] = {
    val c = conn("HEAD", objectUrl(bucket, key))
    try {
      if (c.getResponseCode == 200) Some(c.getContentLengthLong)
      else None
    } finally c.disconnect()
  }

  override protected def putBytes(
      bucket: String, key: String, bytes: Array[Byte]): Unit = {
    val c = conn("PUT", objectUrl(bucket, key))
    c.setDoOutput(true)
    c.setFixedLengthStreamingMode(bytes.length)
    val out = c.getOutputStream
    out.write(bytes)
    out.close()
    try {
      if (c.getResponseCode != 200)
        throw new IOException(s"PUT $bucket/$key: HTTP ${c.getResponseCode}")
      drain(c)
    } finally c.disconnect()
  }

  override protected def readRange(
      bucket: String, key: String, pos: Long, buf: Array[Byte],
      off: Int, n: Int): Int = {
    val c = conn("GET", objectUrl(bucket, key))
    c.setRequestProperty("Range", s"bytes=$pos-${pos + n - 1}")
    try {
      val code = c.getResponseCode
      if (code != 206 && code != 200)
        throw new IOException(s"GET $bucket/$key range $pos+$n: HTTP $code")
      val in = c.getInputStream
      // HTTP 200 on a ranged GET = the endpoint ignored the Range header
      // and is serving the WHOLE object from offset 0; treating that body
      // as bytes-at-pos would hand parquet silently shifted data. Skip to
      // `pos` first (the stream is still correct, just unpruned IO).
      if (code == 200) {
        var toSkip = pos
        while (toSkip > 0) {
          val s = in.skip(toSkip)
          if (s <= 0) {
            if (in.read() < 0) throw new IOException(
              s"GET $bucket/$key: HTTP 200 full-object response ended " +
                s"before offset $pos (object shorter than expected)")
            toSkip -= 1
          } else toSkip -= s
        }
      }
      var read = 0
      var r = 0
      while (read < n && { r = in.read(buf, off + read, n - read); r > 0 })
        read += r
      in.close()
      read
    } finally c.disconnect()
  }

  override protected def deleteKey(bucket: String, key: String): Unit = {
    val c = conn("DELETE", objectUrl(bucket, key))
    try {
      // 204/200 = deleted, 404 = already gone (idempotent); a swallowed
      // failure (403, 500, 503) would leave the source of a rename behind
      // and double-count committer output on the next list
      val code = c.getResponseCode
      if (code != 204 && code != 200 && code != 202 && code != 404)
        throw new IOException(s"DELETE $bucket/$key: HTTP $code")
      drain(c)
    } finally c.disconnect()
  }

  override protected def copyKey(bucket: String, from: String, to: String): Unit = {
    val c = conn("PUT", objectUrl(bucket, to))
    // the copy source is URL-encoded per the S3 API (the server decodes
    // it once) — a raw '+'/'%' in the key would otherwise decode wrong
    c.setRequestProperty("x-amz-copy-source", s"/$bucket/${enc(from)}")
    c.setDoOutput(true)
    c.getOutputStream.close()
    try {
      if (c.getResponseCode != 200)
        throw new IOException(s"copy $from -> $to: HTTP ${c.getResponseCode}")
      drain(c)
    } finally c.disconnect()
  }

  private val keyRe: Regex = "<Key>(.*?)</Key><Size>(\\d+)</Size>".r
  // anchored on the wrapper element: the result header carries its own
  // top-level <Prefix> that must not match
  private val prefixRe: Regex = "<CommonPrefixes><Prefix>(.*?)</Prefix>".r

  private def unxml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  private val tokenRe: Regex =
    "<NextContinuationToken>(.*?)</NextContinuationToken>".r

  /** ListObjectsV2: (objects as key→size, common prefixes). PAGED — the
    * real service returns at most 1,000 items per response; reading only
    * the first page would silently truncate large prefixes, and rename()
    * (LIST+COPY+DELETE, the committer's primitive) would then move only
    * part of a directory, losing committed output. The loop follows
    * `NextContinuationToken` while `IsTruncated` and fails loudly on a
    * truncated response that carries no token.
    */
  override protected def listRaw(
      bucket: String, prefix: String,
      delimited: Boolean): (Seq[(String, Long)], Seq[String]) = {
    val d = if (delimited) "&delimiter=%2F" else ""
    // %20 for spaces, never '+': query-string '+' is ambiguous and the
    // object-key encoder (enc) already made the same choice for paths
    def q(s: String) =
      java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
    val base = s"$endpoint/$bucket?list-type=2&prefix=${q(prefix)}$d"
    val objs = Seq.newBuilder[(String, Long)]
    val prefixes = Seq.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val url = new URL(base + token.fold("")(t => s"&continuation-token=${q(t)}"))
      val c = conn("GET", url)
      val body =
        try {
          if (c.getResponseCode != 200)
            throw new IOException(
              s"LIST $bucket?prefix=$prefix: HTTP ${c.getResponseCode}")
          new String(c.getInputStream.readAllBytes(), "UTF-8")
        } finally c.disconnect()
      objs ++= keyRe.findAllMatchIn(body)
        .map(m => unxml(m.group(1)) -> m.group(2).toLong)
      prefixes ++= prefixRe.findAllMatchIn(body).map(m => unxml(m.group(1)))
      more = body.contains("<IsTruncated>true</IsTruncated>")
      token =
        if (!more) None
        else Some(tokenRe.findFirstMatchIn(body).map(m => unxml(m.group(1)))
          .filter(_.nonEmpty)
          .getOrElse(throw new IOException(
            s"LIST $bucket?prefix=$prefix: truncated response without " +
              "NextContinuationToken — cannot enumerate completely")))
    }
    (objs.result(), prefixes.result().distinct)
  }
}

/** Hadoop `FileSystem` for the `gs://` scheme. Google Cloud Storage's XML
  * API is DELIBERATELY S3-interoperable (public GCS documentation, "XML
  * API overview" — same path-style object verbs, ranged GETs, and
  * ListObjectsV2-shaped listing), so the protocol layer IS the S3 one;
  * only the scheme and endpoint keys differ. Mount with
  * `fs.gs.impl = graft.wire.GcsClientFileSystem` +
  * `fs.gs.endpoint = https://storage.googleapis.com` (or any
  * XML-API-compatible endpoint; tests use [[S3StubServer]], which speaks
  * exactly this subset).
  */
final class GcsClientFileSystem extends S3ClientFileSystem {
  override protected def schemeName: String = "gs"
  override protected def endpointKeys: Seq[String] =
    Seq("fs.gs.endpoint", "fs.gcs.endpoint")
}
