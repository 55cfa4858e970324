package graft.wire

import java.io.IOException
import java.net.URL

import scala.util.matching.Regex

/** Hadoop `FileSystem` for the `wasb://` scheme speaking the Azure Blob
  * Storage REST protocol over plain HTTP — the Azure half of the FileIO
  * seam (the container ships no `hadoop-azure`, so the protocol is
  * implemented directly against the public "Blob Service REST API" docs;
  * the server half is [[AzureBlobStubServer]] in tests, but any Blob-API
  * endpoint serves). Path shape is the stock WASB one,
  * `wasb://container@account/key`; mount with
  * `fs.wasb.impl = graft.wire.AzureBlobFileSystem` +
  * `fs.azure.endpoint = http://...` (or `fs.wasb.endpoint`).
  *
  * Protocol subset, mapped from the published operations:
  *   - Put Blob (`PUT`, `x-ms-blob-type: BlockBlob`) → 201
  *   - Get Blob (`GET`, `x-ms-range: bytes=a-b`) → 206 / 200
  *   - Get Blob Properties (`HEAD`) → 200 + Content-Length / 404
  *   - Delete Blob (`DELETE`) → 202
  *   - Copy Blob (`PUT` + `x-ms-copy-source`) → 202, same-account copies
  *     complete synchronously (`x-ms-copy-status: success`)
  *   - List Blobs (`GET ?restype=container&comp=list&prefix=…
  *     [&delimiter=/]`) → `EnumerationResults` XML with `Blob` and
  *     `BlobPrefix` entries
  */
final class AzureBlobFileSystem extends ObjectStoreFileSystem {

  override protected def schemeName: String = "wasb"
  override protected def endpointKeys: Seq[String] =
    Seq("fs.azure.endpoint", "fs.wasb.endpoint")

  /** `wasb://container@account/key`: the CONTAINER is the authority up to
    * `@` (the account rides the endpoint). A bare authority is the
    * container itself.
    */
  private def container(bucket: String): String = bucket.takeWhile(_ != '@')

  private def blobUrl(bucket: String, key: String): URL =
    new URL(s"$endpoint/${container(bucket)}/${enc(key)}")

  private val Version = "2021-08-06"

  override protected def headLength(bucket: String, key: String): Option[Long] = {
    val c = conn("HEAD", blobUrl(bucket, key))
    c.setRequestProperty("x-ms-version", Version)
    try {
      if (c.getResponseCode == 200) Some(c.getContentLengthLong)
      else None
    } finally c.disconnect()
  }

  override protected def putBytes(
      bucket: String, key: String, bytes: Array[Byte]): Unit = {
    val c = conn("PUT", blobUrl(bucket, key))
    c.setRequestProperty("x-ms-version", Version)
    c.setRequestProperty("x-ms-blob-type", "BlockBlob")
    c.setDoOutput(true)
    c.setFixedLengthStreamingMode(bytes.length)
    val out = c.getOutputStream
    out.write(bytes)
    out.close()
    try {
      if (c.getResponseCode != 201) // Put Blob: 201 Created
        throw new IOException(
          s"PUT $bucket/$key: HTTP ${c.getResponseCode}")
      drain(c)
    } finally c.disconnect()
  }

  override protected def readRange(
      bucket: String, key: String, pos: Long, buf: Array[Byte],
      off: Int, n: Int): Int = {
    val c = conn("GET", blobUrl(bucket, key))
    c.setRequestProperty("x-ms-version", Version)
    c.setRequestProperty("x-ms-range", s"bytes=$pos-${pos + n - 1}")
    try {
      val code = c.getResponseCode
      if (code != 206 && code != 200)
        throw new IOException(s"GET $bucket/$key range $pos+$n: HTTP $code")
      val in = c.getInputStream
      // a 200 means the endpoint ignored the range and is serving the
      // whole blob — skip to `pos` (same defensive contract as the S3
      // client; silently shifted bytes would corrupt parquet reads)
      if (code == 200) {
        var toSkip = pos
        while (toSkip > 0) {
          val s = in.skip(toSkip)
          if (s <= 0) {
            if (in.read() < 0) throw new IOException(
              s"GET $bucket/$key: HTTP 200 response ended before offset $pos")
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
    val c = conn("DELETE", blobUrl(bucket, key))
    c.setRequestProperty("x-ms-version", Version)
    try {
      // 202 = deleted, 404 = already gone (idempotent); anything else
      // (403, 500, 503 throttling) must FAIL — rename() is LIST + COPY +
      // DELETE, and a swallowed delete failure leaves BOTH objects behind,
      // double-counting the committer's output on the next list
      val code = c.getResponseCode
      if (code != 202 && code != 404 && code != 200 && code != 204)
        throw new IOException(s"DELETE $bucket/$key: HTTP $code")
      drain(c)
    } finally c.disconnect()
  }

  override protected def copyKey(bucket: String, from: String, to: String): Unit = {
    val c = conn("PUT", blobUrl(bucket, to))
    c.setRequestProperty("x-ms-version", Version)
    c.setRequestProperty("x-ms-copy-source",
      blobUrl(bucket, from).toString)
    c.setDoOutput(true)
    c.getOutputStream.close()
    try {
      // Copy Blob: 202 Accepted; same-account copies complete
      // synchronously and stamp x-ms-copy-status: success — anything else
      // would need polling, which this client deliberately refuses
      if (c.getResponseCode != 202)
        throw new IOException(s"copy $from -> $to: HTTP ${c.getResponseCode}")
      val status = Option(c.getHeaderField("x-ms-copy-status"))
      if (!status.forall(_ == "success"))
        throw new IOException(s"copy $from -> $to: async copy status $status")
      drain(c)
    } finally c.disconnect()
  }

  // (?s): the Properties element carries more fields than Content-Length
  private val blobRe: Regex =
    "(?s)<Blob><Name>(.*?)</Name>.*?<Content-Length>(\\d+)</Content-Length>".r
  private val blobPrefixRe: Regex = "<BlobPrefix><Name>(.*?)</Name>".r

  private def unxml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  private val nextMarkerRe: Regex = "<NextMarker>(.+?)</NextMarker>".r

  /** List Blobs: (blobs as name→size, blob prefixes). PAGED — the real
    * service returns at most 5,000 results per response; reading only the
    * first page would silently truncate large prefixes, and rename()
    * (LIST+COPY+DELETE, the committer's primitive) would then move only
    * part of a directory, losing committed output. The loop follows a
    * non-empty `NextMarker` until the service stops returning one.
    */
  override protected def listRaw(
      bucket: String, prefix: String,
      delimited: Boolean): (Seq[(String, Long)], Seq[String]) = {
    val d = if (delimited) "&delimiter=%2F" else ""
    // %20 for spaces, never '+': query-string '+' is ambiguous and the
    // object-key encoder (enc) already made the same choice for paths
    def q(s: String) =
      java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
    val base = s"$endpoint/${container(bucket)}" +
      s"?restype=container&comp=list&prefix=${q(prefix)}$d"
    val objs = Seq.newBuilder[(String, Long)]
    val prefixes = Seq.newBuilder[String]
    var marker: Option[String] = None
    var more = true
    while (more) {
      val url = new URL(base + marker.fold("")(m => s"&marker=${q(m)}"))
      val c = conn("GET", url)
      c.setRequestProperty("x-ms-version", Version)
      val body =
        try {
          if (c.getResponseCode != 200)
            throw new IOException(
              s"LIST $bucket?prefix=$prefix: HTTP ${c.getResponseCode}")
          new String(c.getInputStream.readAllBytes(), "UTF-8")
        } finally c.disconnect()
      // the regex is non-greedy per Blob element; split on </Blob> so one
      // blob's Name can never pair with a LATER blob's Content-Length
      objs ++= body.split("</Blob>").toSeq.flatMap(seg =>
        blobRe.findFirstMatchIn(seg).map(m =>
          unxml(m.group(1)) -> m.group(2).toLong))
      prefixes ++= blobPrefixRe.findAllMatchIn(body).map(m => unxml(m.group(1)))
      marker = nextMarkerRe.findFirstMatchIn(body).map(m => unxml(m.group(1)))
        .filter(_.nonEmpty)
      more = marker.isDefined
    }
    (objs.result(), prefixes.result().distinct)
  }
}
