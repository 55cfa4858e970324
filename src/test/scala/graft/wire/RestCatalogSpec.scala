package graft.wire

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.GraftCatalog

/** The REST catalog façade round-tripped through a PLAIN http client
  * (`HttpURLConnection` — zero graft, zero netty on the client side): the
  * doorway an ecosystem catalog browser actually uses.
  */
class RestCatalogSpec extends SparkSpec {

  import spark.implicits._

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val body = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    (code, body)
  }

  test("config, namespace, table list, table metadata, and 404 round-trip") {
    val root = Files.createTempDirectory("graft-rest-cat").toString
    val out = Files.createTempDirectory("graft-rest-out").toString
    val cat = new GraftCatalog(root)
    cat.createTable("alpha", Nil)
    cat.createTable("beta", Nil)
    cat.appendFiles(spark, "alpha", Seq((1L, "x"), (2L, "y")).toDF("k", "v"), out)
    cat.appendFiles(spark, "alpha", Seq((3L, "z")).toDF("k", "v"), out)
    val head = cat.currentSnapshotId("alpha")
    cat.tagSnapshot("alpha", "v1", head)

    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort

      val (c1, config) = get(port, "/v1/config")
      assert(c1 == 200 && config.contains("\"defaults\""), config)

      val (c2, ns) = get(port, "/v1/namespaces")
      assert(c2 == 200 && ns.contains("[[\"default\"]]"), ns)

      // namespace load — the first call many REST clients make
      val (c2b, nsLoad) = get(port, "/v1/namespaces/default")
      assert(c2b == 200 && nsLoad.contains("\"namespace\":[\"default\"]"), nsLoad)

      val (c3, tables) = get(port, "/v1/namespaces/default/tables")
      assert(c3 == 200, tables)
      assert(tables.contains("\"name\":\"alpha\"") && tables.contains("\"name\":\"beta\""), tables)

      val (c4, meta) = get(port, "/v1/namespaces/default/tables/alpha")
      assert(c4 == 200, meta)
      assert(meta.contains(s""""current-snapshot-id":$head"""), meta)
      // full snapshot log: create + two appends
      cat.snapshotIds("alpha").foreach(id =>
        assert(meta.contains(s""""snapshot-id":$id"""), s"missing snap $id in $meta"))
      assert(meta.contains(""""main":{"snapshot-id":"""), meta)
      assert(meta.contains(s""""v1":{"snapshot-id":$head,"type":"tag"}"""), meta)
      assert(meta.contains(""""format-version":2"""), meta)

      // repeat load: stable uuid (deterministic identity across loads)
      val (_, meta2) = get(port, "/v1/namespaces/default/tables/alpha")
      def uuid(s: String) = s.split("\"table-uuid\":\"")(1).takeWhile(_ != '"')
      assert(uuid(meta) == uuid(meta2))

      val (c5, err) = get(port, "/v1/namespaces/default/tables/nope")
      assert(c5 == 404, err)
      assert(err.contains("NoSuchTableException") && err.contains("\"code\":404"), err)

      val (c6, err2) = get(port, "/v1/namespaces/other/tables")
      assert(c6 == 404 && err2.contains("NoSuchNamespaceException"), err2)

      val (c7, err3) = get(port, "/v1/bogus")
      assert(c7 == 404, err3)

      // a table WITH a recorded canonical schema renders it Iceberg-spec
      // shaped, carrying the catalog's real field ids
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = true,
          metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .putLong(graft.sources.FieldIds.MetaKey, 7L).build())))
      cat.createTable("typed", Nil, Some(sch))
      val (c9, typedMeta) = get(port, "/v1/namespaces/default/tables/typed")
      assert(c9 == 200, typedMeta)
      assert(typedMeta.contains(
        """"fields":[{"id":7,"name":"k","required":false,"type":"long"}]"""), typedMeta)
      assert(typedMeta.contains(""""current-schema-id":0"""), typedMeta)

      // '+' is a legal literal path character (RFC 3986) — a table listed
      // with '+' in its name must be loadable at the same spelling
      cat.createTable("a+b", Nil)
      val (c8, plusMeta) = get(port, "/v1/namespaces/default/tables/a+b")
      assert(c8 == 200, plusMeta)
      assert(plusMeta.contains("\"current-snapshot-id\""), plusMeta)

      // HTTP/1.0 client (reads to EOF): the server must close after the
      // response, or the client hangs until its own timeout
      val sock = new java.net.Socket("127.0.0.1", port)
      try {
        sock.setSoTimeout(10000)
        sock.getOutputStream.write(
          "GET /v1/config HTTP/1.0\r\n\r\n".getBytes("UTF-8"))
        sock.getOutputStream.flush()
        val raw = new String(sock.getInputStream.readAllBytes(), "UTF-8")
        assert(raw.startsWith("HTTP/1.1 200"), raw.take(100))
        assert(raw.contains("\"defaults\""), raw)
      } finally sock.close()
    } finally server.close()
  }
}
