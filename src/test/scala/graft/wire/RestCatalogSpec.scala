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

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    val out = conn.getOutputStream
    out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val resp = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    (code, resp)
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

      // malformed percent-encoding is the CLIENT's error — 400, not 500.
      // HttpURLConnection refuses to even send it, so use a raw socket.
      val sock2 = new java.net.Socket("127.0.0.1", port)
      try {
        sock2.setSoTimeout(10000)
        sock2.getOutputStream.write(
          "GET /v1/namespaces/default/tables/a%zz HTTP/1.0\r\n\r\n".getBytes("UTF-8"))
        sock2.getOutputStream.flush()
        val raw2 = new String(sock2.getInputStream.readAllBytes(), "UTF-8")
        assert(raw2.startsWith("HTTP/1.1 400"), raw2.take(100))
        assert(raw2.contains("BadRequestException"), raw2)
      } finally sock2.close()
    } finally server.close()
  }

  test("spec-required TableMetadata fields render on every load") {
    val root = Files.createTempDirectory("graft-rest-meta").toString
    val out = Files.createTempDirectory("graft-rest-meta-out").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", Nil)
    cat.appendFiles(spark, "t", Seq((1L, "x")).toDF("k", "v"), out)
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val (code, meta) = get(server.boundPort, "/v1/namespaces/default/tables/t")
      assert(code == 200, meta)
      // the fields a stock TableMetadata parser requires — present even on
      // a schema-less table (schemas renders the empty struct)
      for (k <- Seq("\"metadata-location\"", "\"location\"",
          "\"last-sequence-number\"", "\"last-updated-ms\"",
          "\"last-column-id\"", "\"current-schema-id\"", "\"schemas\"",
          "\"default-spec-id\"", "\"partition-specs\"", "\"last-partition-id\"",
          "\"default-sort-order-id\"", "\"sort-orders\""))
        assert(meta.contains(k), s"missing $k in $meta")
      // commit summaries in the snapshot log: the append diff is derivable
      // from the entries, so the log carries operation + file deltas
      assert(meta.contains("\"operation\":\"append\""), meta)
      assert(meta.contains("\"added-data-files\":\"1\""), meta)
    } finally server.close()
  }

  test("create + commit write-side round-trip with CAS 409 on a stale base") {
    val root = Files.createTempDirectory("graft-rest-w").toString
    val out = Files.createTempDirectory("graft-rest-w-out").toString
    // parquet the "external engine" wrote before talking to the catalog
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .coalesce(1).write.parquet(s"$out/batch1")
    Seq((4L, "d")).toDF("k", "v").coalesce(1).write.parquet(s"$out/batch2")
    def parquetIn(d: String): String =
      new java.io.File(d).listFiles().map(_.getAbsolutePath)
        .filter(p => p.endsWith(".parquet") && !p.contains("crc")).head
    val cat = new GraftCatalog(root)
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort

      // CREATE with an Iceberg struct schema; the request's field ids land
      // in the catalog's canonical schema
      val createBody =
        """{"name":"ext","schema":{"type":"struct","fields":[
          |{"id":11,"name":"k","required":false,"type":"long"},
          |{"id":12,"name":"v","required":false,"type":"string"}]}}""".stripMargin
      val (c1, created) = post(port, "/v1/namespaces/default/tables", createBody)
      assert(c1 == 200, created)
      assert(created.contains(""""current-snapshot-id":1"""), created)
      assert(created.contains(""""id":11"""), created)
      assert(created.contains(""""last-column-id":12"""), created)
      assert(cat.currentSchema("ext").exists(s =>
        graft.sources.FieldIds.idOf(s.fields.head).contains(11)))

      // duplicate create → the spec's 409 AlreadyExists
      val (cDup, dup) = post(port, "/v1/namespaces/default/tables", createBody)
      assert(cDup == 409 && dup.contains("AlreadyExistsException"), s"$cDup $dup")

      // COMMIT at the asserted base
      def commitBody(base: Long, file: String, rc: Long) =
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":$base}],
           |"updates":[{"action":"add-data-files","data-files":[
           |{"file-path":"$file","file-format":"parquet","record-count":$rc}]}]}""".stripMargin
      val (c2, committed) =
        post(port, "/v1/namespaces/default/tables/ext",
          commitBody(1L, parquetIn(s"$out/batch1"), 3L))
      assert(c2 == 200, committed)
      assert(committed.contains(""""current-snapshot-id":2"""), committed)
      assert(committed.contains("\"operation\":\"append\""), committed)

      // the committed table reads through the normal engine path
      val rows = cat.scanTable(spark, "ext").orderBy("k").collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))

      // STALE base (still asserting snapshot 1 after the table moved to 2)
      // → the spec's retryable CommitFailedException envelope
      val (c3, stale) =
        post(port, "/v1/namespaces/default/tables/ext",
          commitBody(1L, parquetIn(s"$out/batch2"), 1L))
      assert(c3 == 409, stale)
      assert(stale.contains("CommitFailedException") && stale.contains("\"code\":409"), stale)
      assert(cat.currentSnapshotId("ext") == 2L, "stale commit must not advance")

      // re-read, retry at the TRUE base → lands
      val (c4, retried) =
        post(port, "/v1/namespaces/default/tables/ext",
          commitBody(2L, parquetIn(s"$out/batch2"), 1L))
      assert(c4 == 200, retried)
      assert(cat.scanTable(spark, "ext").count() == 4L)

      // commit to a missing table → 404; malformed body → 400; unknown
      // update action → 400 (never silently ignored)
      val (c5, _) = post(port, "/v1/namespaces/default/tables/nope",
        commitBody(1L, parquetIn(s"$out/batch2"), 1L))
      assert(c5 == 404)
      val (c6, badJson) = post(port, "/v1/namespaces/default/tables/ext", "{nope")
      assert(c6 == 400 && badJson.contains("BadRequestException"), badJson)
      val (c7, badAction) = post(port, "/v1/namespaces/default/tables/ext",
        """{"updates":[{"action":"set-location","location":"/x"}]}""")
      assert(c7 == 400 && badAction.contains("unsupported update action"), badAction)
    } finally server.close()
  }

  test("commit add-schema evolves the canonical schema; illegal evolution is 400") {
    val root = Files.createTempDirectory("graft-rest-evo").toString
    val cat = new GraftCatalog(root)
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort
      val createBody =
        """{"name":"evo","schema":{"type":"struct","fields":[
          |{"id":1,"name":"k","required":false,"type":"int"},
          |{"id":2,"name":"v","required":false,"type":"string"}]}}""".stripMargin
      assert(post(port, "/v1/namespaces/default/tables", createBody)._1 == 200)

      // the spec's evolution pair: widen k int->long, add a new column.
      // set-current-schema-id -1 = "the schema added by this commit"
      def evoBody(kType: String) =
        s"""{"updates":[
           |{"action":"add-schema","schema":{"type":"struct","fields":[
           |{"id":1,"name":"k","required":false,"type":"$kType"},
           |{"id":2,"name":"v","required":false,"type":"string"},
           |{"id":3,"name":"w","required":false,"type":"double"}]}},
           |{"action":"set-current-schema-id","schema-id":-1}]}""".stripMargin
      val (c1, evolved) =
        post(port, "/v1/namespaces/default/tables/evo", evoBody("long"))
      assert(c1 == 200, evolved)
      assert(evolved.contains(""""last-column-id":3"""), evolved)
      assert(evolved.contains(""""type":"long""""), evolved)
      assert(cat.currentSchema("evo").exists(s =>
        s.fields.map(_.name).toSeq == Seq("k", "v", "w") &&
          s.fields.head.dataType ==
            org.apache.spark.sql.types.LongType))

      // illegal narrowing (long -> int on a surviving id) → the client's
      // 400, not a retryable 409
      val (c2, bad) =
        post(port, "/v1/namespaces/default/tables/evo", evoBody("int"))
      assert(c2 == 400 && bad.contains("illegal type change"), s"$c2 $bad")

      // a base assertion still guards schema commits
      val (c3, stale) = post(port, "/v1/namespaces/default/tables/evo",
        """{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":1}],
          |"updates":[
          |{"action":"add-schema","schema":{"type":"struct","fields":[
          |{"id":1,"name":"k","required":false,"type":"long"},
          |{"id":2,"name":"v","required":false,"type":"string"},
          |{"id":3,"name":"w","required":false,"type":"double"},
          |{"id":4,"name":"x","required":false,"type":"long"}]}},
          |{"action":"set-current-schema-id","schema-id":-1}]}""".stripMargin)
      assert(c3 == 409 && stale.contains("CommitFailedException"), s"$c3 $stale")

      // the pair is required in BOTH directions: add without activate and
      // activate without add are each the client's 400
      val (c4, noAct) = post(port, "/v1/namespaces/default/tables/evo",
        """{"updates":[
          |{"action":"add-schema","schema":{"type":"struct","fields":[
          |{"id":1,"name":"k","required":false,"type":"long"},
          |{"id":2,"name":"v","required":false,"type":"string"},
          |{"id":3,"name":"w","required":false,"type":"double"}]}}]}""".stripMargin)
      assert(c4 == 400 && noAct.contains("set-current-schema-id"), s"$c4 $noAct")
      val (c5, noAdd) = post(port, "/v1/namespaces/default/tables/evo",
        """{"updates":[{"action":"set-current-schema-id","schema-id":-1}]}""")
      assert(c5 == 400 && noAdd.contains("companion add-schema"), s"$c5 $noAdd")
    } finally server.close()
  }

  test("DELETE drops a table: 204, gone from the listing; fork conflicts are 409") {
    val root = Files.createTempDirectory("graft-rest-drop").toString
    val cat = new GraftCatalog(root)
    cat.createTable("a", Nil)
    cat.createTable("b", Nil)
    cat.forkTable("b", "audit")
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort
      def del(path: String): (Int, String) = {
        val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("DELETE")
        val code = conn.getResponseCode
        val in = if (code < 400) conn.getInputStream else conn.getErrorStream
        val body = if (in == null) ""
          else new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        if (in != null) in.close()
        (code, body)
      }
      val (c1, _) = del("/v1/namespaces/default/tables/a")
      assert(c1 == 204)
      val (_, listing) = get(port, "/v1/namespaces/default/tables")
      assert(!listing.contains("\"a\"") && listing.contains("\"b\""), listing)
      val (c2, gone) = del("/v1/namespaces/default/tables/a")
      assert(c2 == 404 && gone.contains("NoSuchTableException"), gone)
      // a live fork blocks the drop with the spec's conflict envelope
      val (c3, blocked) = del("/v1/namespaces/default/tables/b")
      assert(c3 == 409 && blocked.contains("b@audit"), blocked)
    } finally server.close()
  }

  test("a declared sort order renders as the default sort-orders entry") {
    val root = Files.createTempDirectory("graft-rest-so").toString
    val cat = new GraftCatalog(root)
    import org.apache.spark.sql.types._
    def f(name: String, dt: DataType, id: Int) = StructField(name, dt,
      metadata = new MetadataBuilder()
        .putLong(graft.sources.FieldIds.MetaKey, id.toLong).build())
    val schema = StructType(Seq(f("k", LongType, 1), f("v", StringType, 2)))
    cat.createTable("t", Nil, Some(schema))
    cat.setSortOrder("t", Seq("k"))
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val (code, meta) = get(server.boundPort, "/v1/namespaces/default/tables/t")
      assert(code == 200, meta)
      assert(meta.contains("\"default-sort-order-id\":1"), meta)
      assert(meta.contains(
        """{"transform":"identity","source-id":1,"direction":"asc","null-order":"nulls-first"}"""),
        meta)
    } finally server.close()
  }

  test("commit set-properties/remove-properties round-trips; stale base still 409s") {
    val root = Files.createTempDirectory("graft-rest-props").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", Nil)
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort
      val (c1, meta1) = post(port, "/v1/namespaces/default/tables/t",
        """{"updates":[{"action":"set-properties",
          |"updates":{"owner":"curation","write.target-file-size":"134217728"}}]}"""
          .stripMargin)
      assert(c1 == 200 && meta1.contains("\"owner\":\"curation\""), meta1)
      assert(cat.tableProperties("t")("owner") == "curation")
      val (c2, meta2) = post(port, "/v1/namespaces/default/tables/t",
        """{"updates":[{"action":"remove-properties","removals":["owner"]}]}""")
      assert(c2 == 200 && !meta2.contains("\"owner\""), meta2)
      // a metadata-only commit with a stale base assertion is the spec 409
      val head = cat.currentSnapshotId("t")
      val (c3, stale) = post(port, "/v1/namespaces/default/tables/t",
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main",
           |"snapshot-id":${head + 7}}],
           |"updates":[{"action":"set-properties","updates":{"x":"1"}}]}"""
          .stripMargin)
      assert(c3 == 409 && stale.contains("CommitFailedException"), stale)
      assert(!cat.tableProperties("t").contains("x"))
      // empty update list is the client's error
      val (c4, _) = post(port, "/v1/namespaces/default/tables/t",
        """{"updates":[]}""")
      assert(c4 == 400)
    } finally server.close()
  }

  test("commit set-snapshot-ref rolls main back as a new head") {
    val root = Files.createTempDirectory("graft-rest-rb").toString
    val out = Files.createTempDirectory("graft-rest-rb-out").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", Nil)
    cat.appendFiles(spark, "t", Seq((1L, "a")).toDF("k", "v"), out)
    val good = cat.currentSnapshotId("t")
    cat.appendFiles(spark, "t", Seq((2L, "b")).toDF("k", "v"), out)
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort
      val (c1, meta) = post(port, "/v1/namespaces/default/tables/t",
        s"""{"updates":[{"action":"set-snapshot-ref","ref-name":"main",
           |"snapshot-id":$good}]}""".stripMargin)
      assert(c1 == 200, meta)
      // rollback is a NEW head pointing at the old state (append-only log)
      assert(cat.currentSnapshotId("t") > good)
      assert(cat.scanTable(spark, "t").count() == 1L)
      // unknown snapshot / non-main ref are the client's errors
      val (c2, _) = post(port, "/v1/namespaces/default/tables/t",
        """{"updates":[{"action":"set-snapshot-ref","snapshot-id":999}]}""")
      assert(c2 == 400)
      val (c3, _) = post(port, "/v1/namespaces/default/tables/t",
        s"""{"updates":[{"action":"set-snapshot-ref","ref-name":"dev",
           |"snapshot-id":$good}]}""".stripMargin)
      assert(c3 == 400)
    } finally server.close()
  }

  test("POST /v1/tables/rename: 204 moves the name; 404/409 envelopes") {
    val root = Files.createTempDirectory("graft-rest-ren").toString
    val cat = new GraftCatalog(root)
    cat.createTable("a", Nil)
    cat.createTable("c", Nil)
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort
      def ren(src: String, dst: String) = post(port, "/v1/tables/rename",
        s"""{"source":{"namespace":["default"],"name":"$src"},""" +
          s""""destination":{"namespace":["default"],"name":"$dst"}}""")
      val (c1, _) = ren("a", "b")
      assert(c1 == 204)
      val (_, listing) = get(port, "/v1/namespaces/default/tables")
      assert(listing.contains("\"b\"") && !listing.contains("\"a\""), listing)
      val (c2, miss) = ren("a", "z")
      assert(c2 == 404 && miss.contains("NoSuchTableException"), miss)
      val (c3, clash) = ren("b", "c")
      assert(c3 == 409 && clash.contains("AlreadyExistsException"), clash)
      // an unknown namespace on either side is the spec's 404 (rename is
      // namespaced now; it used to be a 400 under the default-only facade)
      val (c4, badNs) = post(port, "/v1/tables/rename",
        """{"source":{"namespace":["other"],"name":"b"},""" +
          """"destination":{"namespace":["default"],"name":"d"}}""")
      assert(c4 == 404 && badNs.contains("NoSuchNamespaceException"), badNs)
    } finally server.close()
  }

  test("table listing paginates: cursor walk covers every table exactly once") {
    val root = Files.createTempDirectory("graft-rest-page").toString
    val cat = new GraftCatalog(root)
    val names = (1 to 5).map(i => s"t$i")
    names.foreach(cat.createTable(_, Nil))
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort
      def nameSeq(body: String): Seq[String] =
        "\"name\":\"([^\"]+)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
      def token(body: String): Option[String] =
        "\"next-page-token\":\"([^\"]+)\"".r.findFirstMatchIn(body).map(_.group(1))

      // no pageSize = the whole listing, no token
      val (cAll, all) = get(port, "/v1/namespaces/default/tables")
      assert(cAll == 200 && nameSeq(all) == names && token(all).isEmpty, all)

      // cursor walk at pageSize=2: 2 + 2 + 1, token only on truncated pages
      var walked = Seq.empty[String]
      var tok = Option.empty[String]
      var pages = 0
      while ({
        val qs = "?pageSize=2" + tok.fold("")(t => s"&pageToken=$t")
        val (c, body) = get(port, s"/v1/namespaces/default/tables$qs")
        assert(c == 200, body)
        walked ++= nameSeq(body)
        tok = token(body)
        pages += 1
        tok.isDefined
      }) ()
      assert(walked == names, s"cursor walk returned $walked")
      assert(pages == 3)

      // a table created MID-WALK after the cursor still shows up
      val (_, p1) = get(port, "/v1/namespaces/default/tables?pageSize=2")
      cat.createTable("t9", Nil)
      val (_, p2) = get(port,
        s"/v1/namespaces/default/tables?pageSize=9&pageToken=${token(p1).get}")
      assert(nameSeq(p2) == Seq("t3", "t4", "t5", "t9"), p2)

      // malformed pageSize is the client's error
      val (cBad, bad) = get(port, "/v1/namespaces/default/tables?pageSize=zero")
      assert(cBad == 400 && bad.contains("BadRequestException"), bad)
      val (cZero, _) = get(port, "/v1/namespaces/default/tables?pageSize=0")
      assert(cZero == 400)
    } finally server.close()
  }

  test("namespace CRUD: create-ns -> create-table -> commit -> list -> drop") {
    val root = Files.createTempDirectory("graft-rest-ns").toString
    val out = Files.createTempDirectory("graft-rest-ns-out").toString
    val cat = new GraftCatalog(root)
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort
      def del(path: String): (Int, String) = {
        val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("DELETE")
        val code = conn.getResponseCode
        val in = if (code < 400) conn.getInputStream else conn.getErrorStream
        val body = if (in == null) ""
          else new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        if (in != null) in.close()
        (code, body)
      }
      // create a namespace with properties; duplicates 409, bad names 400
      val (c1, created) = post(port, "/v1/namespaces",
        """{"namespace":["demo_db"],"properties":{"owner":"pipeline"}}""")
      assert(c1 == 200 && created.contains("\"demo_db\""), created)
      val (cDup, dup) = post(port, "/v1/namespaces",
        """{"namespace":["demo_db"]}""")
      assert(cDup == 409 && dup.contains("AlreadyExistsException"), dup)
      val (cRes, _) = post(port, "/v1/namespaces", """{"namespace":["default"]}""")
      assert(cRes == 400)
      val (cOrphan, orphan) = post(port, "/v1/namespaces",
        """{"namespace":["nope","child"]}""")
      assert(cOrphan == 404 && orphan.contains("NoSuchNamespaceException"), orphan)
      // listing shows default + the new namespace; GET returns properties
      val (_, listing) = get(port, "/v1/namespaces")
      assert(listing.contains("[\"default\"]") && listing.contains("[\"demo_db\"]"), listing)
      val (cNs, nsBody) = get(port, "/v1/namespaces/demo_db")
      assert(cNs == 200 && nsBody.contains("\"owner\":\"pipeline\""), nsBody)
      // nested namespace + parent listing
      val (cKid, _) = post(port, "/v1/namespaces",
        """{"namespace":["demo_db","curated"]}""")
      assert(cKid == 200)
      val (_, kids) = get(port, "/v1/namespaces?parent=demo_db")
      assert(kids.contains("[\"demo_db\",\"curated\"]"), kids)
      // table inside the namespace: create, commit files, load, list
      val (cT, _) = post(port, "/v1/namespaces/demo_db/tables",
        """{"name":"events","schema":{"type":"struct","fields":[
          |{"id":1,"name":"k","required":false,"type":"long"},
          |{"id":2,"name":"v","required":false,"type":"string"}]}}""".stripMargin)
      assert(cT == 200)
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1).write.parquet(s"$out/f1")
      val file = graft.sources.CompactionRunner.listParquet(s"$out/f1").head
      val (cC, _) = post(port, "/v1/namespaces/demo_db/tables/events",
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":1}],
           |"updates":[{"action":"add-data-files","data-files":[
           |{"file-path":"$file","file-format":"parquet"}]}]}""".stripMargin)
      assert(cC == 200)
      val (cL, loaded) = get(port, "/v1/namespaces/demo_db/tables/events")
      assert(cL == 200, loaded)
      assert(cat.scanTable(spark, "demo_db/events").count() == 2)
      val (_, tList) = get(port, "/v1/namespaces/demo_db/tables")
      assert(tList.contains("\"events\"") &&
        tList.contains("\"namespace\":[\"demo_db\"]"), tList)
      // the default listing does NOT leak namespaced tables
      val (_, defList) = get(port, "/v1/namespaces/default/tables")
      assert(!defList.contains("events"), defList)
      // namespace properties update with the spec's report
      val (cP, report) = post(port, "/v1/namespaces/demo_db/properties",
        """{"updates":{"retention":"30d"},"removals":["owner","ghost"]}""")
      assert(cP == 200 && report.contains("\"updated\":[\"retention\"]") &&
        report.contains("\"removed\":[\"owner\"]") &&
        report.contains("\"missing\":[\"ghost\"]"), report)
      // drop rules: non-empty 409, then bottom-up drops succeed; default undroppable
      val (cNE, ne) = del("/v1/namespaces/demo_db")
      assert(cNE == 409 && ne.contains("NamespaceNotEmptyException"), ne)
      assert(del("/v1/namespaces/demo_db/tables/events")._1 == 204)
      assert(del(s"/v1/namespaces/demo_db%1Fcurated")._1 == 204)
      assert(del("/v1/namespaces/demo_db")._1 == 204)
      assert(del("/v1/namespaces/default")._1 == 400)
      val (cGone, _) = get(port, "/v1/namespaces/demo_db")
      assert(cGone == 404)
    } finally server.close()
  }

  test("POST register mounts a foreign table by metadata-location") {
    // the spec's RegisterTable: a stock client hands the catalog an
    // existing table's metadata.json and gets a served table back
    val rootA = Files.createTempDirectory("graft-rest-rega").toString
    val g = s"greg_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", rootA)
    spark.sql(
      s"""CREATE TABLE $g.src (k BIGINT, v STRING)
         |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $g.src SELECT id, concat('v', id) FROM range(0, 250)")
    spark.sql(s"DELETE FROM $g.src WHERE k % 9 = 4")
    val catA = new GraftCatalog(rootA)
    val metaPath =
      graft.sources.IcebergMetadataJson.export(catA, rootA, "src").toString
    val rootB = Files.createTempDirectory("graft-rest-regb").toString
    val catB = new GraftCatalog(rootB)
    val server = new RestCatalogServer(catB, port = 0)
    try {
      val port = server.boundPort
      val (c1, loaded) = post(port, "/v1/namespaces/default/register",
        s"""{"name":"mounted","metadata-location":"$metaPath"}""")
      assert(c1 == 200, loaded)
      assert(loaded.contains("\"current-snapshot-id\""), loaded)
      // the registered table serves the foreign content, deletes applied
      assert(catB.scanTable(spark, "mounted").count() ==
        catA.scanTable(spark, "src").count())
      // duplicate name: the spec's 409 envelope
      val (c2, dup) = post(port, "/v1/namespaces/default/register",
        s"""{"name":"mounted","metadata-location":"$metaPath"}""")
      assert(c2 == 409 && dup.contains("AlreadyExistsException"), dup)
      // malformed requests and unwalkable chains are the client's 400
      val (c3, _) = post(port, "/v1/namespaces/default/register",
        """{"name":"x"}""")
      assert(c3 == 400)
      val (c4, bad) = post(port, "/v1/namespaces/default/register",
        s"""{"name":"x","metadata-location":"$rootB/nope.metadata.json"}""")
      assert(c4 == 400, bad)
      assert(!catB.tableExists("x"))
      // the history-depth extension caps the imported lineage (head +
      // nearest ancestors), same contract as import_table's parameter
      val (c5, shallow) = post(port, "/v1/namespaces/default/register",
        s"""{"name":"shallow","metadata-location":"$metaPath",
           |"history-depth":1}""".stripMargin.replace("\n", ""))
      assert(c5 == 200, shallow)
      assert(catB.snapshotIds("shallow") == Seq(1L))
      assert(catB.scanTable(spark, "shallow").count() ==
        catA.scanTable(spark, "src").count())
    } finally server.close()
  }

  test("exportOnLoad serves a metadata-location a stock client can mount") {
    // the full interop story stitched: REST loadTable -> a REAL exported
    // metadata.json -> manifest chain -> import into a FRESH catalog root
    // reproduces the table, MoR deletes included, with zero shared state
    val root = Files.createTempDirectory("graft-rest-exp").toString
    val g = s"grest_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    spark.sql(
      s"""CREATE TABLE $g.t (k BIGINT, v STRING)
         |TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 300)")
    spark.sql(s"DELETE FROM $g.t WHERE k % 7 = 3")
    val cat = new GraftCatalog(root)
    val server = new RestCatalogServer(cat, port = 0, exportOnLoad = true)
    try {
      val port = server.boundPort
      val (c1, loaded) = get(port, "/v1/namespaces/default/tables/t")
      assert(c1 == 200, loaded)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      val loc = mapper.readTree(loaded).get("metadata-location").asText
      assert(loc.endsWith(".metadata.json"), loc)
      assert(Files.exists(java.nio.file.Paths.get(loc)), loc)
      // a second load at the same head reuses the document (no re-export)
      val mtime = Files.getLastModifiedTime(java.nio.file.Paths.get(loc))
      val (_, again) = get(port, "/v1/namespaces/default/tables/t")
      assert(mapper.readTree(again).get("metadata-location").asText == loc)
      assert(Files.getLastModifiedTime(java.nio.file.Paths.get(loc)) == mtime)
      // the location mounts: import into a fresh root and match the scan
      val fresh = Files.createTempDirectory("graft-rest-exp-b").toString
      val catB = new GraftCatalog(fresh)
      catB.importTable("t", loc)
      assert(catB.loadEntries("t").exists(_.kind != "data"),
        "the mounted chain must carry the pending MoR deletes")
      assert(catB.scanTable(spark, "t").as[(Long, String)].collect().toSet ==
        cat.scanTable(spark, "t").as[(Long, String)].collect().toSet)
    } finally server.close()
  }
}
