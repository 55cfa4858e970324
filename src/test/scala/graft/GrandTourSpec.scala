package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.GraftCatalog
import graft.wire.RestCatalogServer

/** The grand tour: ONE table driven through EVERY public doorway in a
  * single lifecycle — REST create (external engine shape), SQL INSERT
  * (temp view over the data source), SQL row-level DML (injected rule),
  * tag + TVF time travel, SQL maintenance (compact + expire), REST schema
  * evolution, the REST read surface reflecting all of it, and finally the
  * DSv2 doorway (round 11) mounting the SAME root for engine-native
  * SELECT, row-level DML, and CALL maintenance. This is the switch-over
  * story in one spec: a reference user can reach this catalog through
  * whichever doorway their stack already speaks, and the doorways compose
  * on the same table.
  */
class GrandTourSpec extends SparkSpec {

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

  test("one table through every doorway: REST create -> SQL INSERT/DML -> tag travel -> SQL maintenance -> REST evolution") {
    val root = Files.createTempDirectory("graft-tour").toString
    val cat = new GraftCatalog(root)
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort

      // 1. CREATE over REST, Iceberg-struct schema with field ids — the
      //    doorway an external engine uses
      val (cCreate, _) = post(port, "/v1/namespaces/default/tables",
        """{"name":"tour","schema":{"type":"struct","fields":[
          |{"id":1,"name":"k","required":false,"type":"long"},
          |{"id":2,"name":"v","required":false,"type":"string"}]}}""".stripMargin)
      assert(cCreate == 200)

      // 2. SQL INSERT through a temp view over the data source. DML on the
      //    still-empty table first: zero-row no-ops, never an error
      spark.read.format("graft").option("root", root).option("table", "tour")
        .load().createOrReplaceTempView("tour")
      spark.sql("DELETE FROM tour WHERE k = 1")
      spark.sql("UPDATE tour SET v = 'x' WHERE k = 1")
      assert(spark.sql("SELECT count(*) FROM tour").head().getLong(0) == 0)
      spark.sql(
        "INSERT INTO tour SELECT id AS k, concat('v', id) AS v FROM range(1, 101)")
      assert(spark.sql("SELECT count(*) FROM tour").head().getLong(0) == 100)

      // 3. tag the audit point, then SQL row-level DML (injected rule) —
      //    including MERGE, whose SET/inserted columns must keep their
      //    field ids on this id-resolved table
      cat.tagSnapshot("tour", "audited", cat.currentSnapshotId("tour"))
      spark.sql("DELETE FROM tour WHERE k % 10 = 0")
      spark.sql("UPDATE tour SET v = 'patched' WHERE k = 1")
      assert(spark.sql("SELECT count(*) FROM tour").head().getLong(0) == 90)
      assert(spark.sql("SELECT v FROM tour WHERE k = 1").head().getString(0)
        == "patched")
      spark.sql("SELECT 2L AS k, 'merged' AS v")
        .createOrReplaceTempView("tour_src")
      spark.sql(
        """MERGE INTO tour t USING tour_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      assert(spark.sql("SELECT v FROM tour WHERE k = 2").head().getString(0)
        == "merged", "MERGE SET columns must survive the id-resolved read")

      // 4. TVF time travel: the tagged state is still the pre-DML one
      assert(spark.sql(
        s"SELECT count(*) FROM graft_table('$root', 'tour', 'audited')")
        .head().getLong(0) == 100)

      // 5. SQL maintenance: full compact retires the MoR deletes, expiry
      //    drops the pre-compaction history (the tag survives by contract)
      spark.sql(s"SELECT * FROM graft_compact('$root','tour','full')").collect()
      assert(spark.sql(
        s"""SELECT count(*) FROM graft_meta('$root','tour','files')
           |WHERE content <> 'data'""".stripMargin).head().getLong(0) == 0)
      spark.sql(s"SELECT * FROM graft_expire('$root','tour', 1)").collect()
      assert(cat.snapshotIds("tour")
        .contains(cat.snapshotIdOfTag("tour", "audited")),
        "tagged snapshot must survive expiry")

      // 6. schema evolution over REST: widen nothing, add a column
      val (cEvo, _) = post(port, "/v1/namespaces/default/tables/tour",
        """{"updates":[
          |{"action":"add-schema","schema":{"type":"struct","fields":[
          |{"id":1,"name":"k","required":false,"type":"long"},
          |{"id":2,"name":"v","required":false,"type":"string"},
          |{"id":3,"name":"score","required":false,"type":"double"}]}},
          |{"action":"set-current-schema-id","schema-id":-1}]}""".stripMargin)
      assert(cEvo == 200)

      // 7. the evolved column serves as nulls over pre-evolution files,
      //    through a FRESH view (the old view pinned the old schema)
      spark.read.format("graft").option("root", root).option("table", "tour")
        .load().createOrReplaceTempView("tour2")
      val row = spark.sql(
        "SELECT count(*) AS n, count(score) AS s FROM tour2").head()
      assert(row.getLong(0) == 90 && row.getLong(1) == 0)

      // 8. the REST read surface reflects the whole story: evolved schema,
      //    compaction snapshot summary, surviving tag
      val (cLoad, loaded) = get(port, "/v1/namespaces/default/tables/tour")
      assert(cLoad == 200)
      assert(loaded.contains(""""name":"score""""), loaded.take(400))
      assert(loaded.contains(""""audited""""), "tag missing from refs")
      assert(loaded.contains(""""operation""""), "commit summaries missing")
      // and the SQL catalog listing sees the same head as the REST one
      val sqlHead = spark.sql(
        s"SELECT current_snapshot_id FROM graft_tables('$root') WHERE table_name = 'tour'")
        .head().getLong(0)
      assert(sqlHead == cat.currentSnapshotId("tour"))

      // 9. the DSv2 doorway mounts the SAME root: engine-native SELECT,
      //    row-level DML through Spark's own planning, a CALL procedure —
      //    and the REST surface sees the doorway's commits
      val g = s"gtour_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$g",
        "graft.sources.dsv2.GraftSparkCatalog")
      spark.conf.set(s"spark.sql.catalog.$g.root", root)
      assert(spark.sql(s"SELECT count(*) FROM $g.tour").head().getLong(0) == 90)
      val expectAfter = 90 - spark.sql(
        s"SELECT count(*) FROM $g.tour WHERE k % 10 = 1").head().getLong(0)
      spark.sql(s"DELETE FROM $g.tour WHERE k % 10 = 1") // native row-level COW
      val afterDml = spark.sql(s"SELECT count(*) FROM $g.tour").head().getLong(0)
      assert(afterDml == expectAfter, s"doorway DELETE must land: $afterDml")
      spark.sql(s"CALL $g.system.rewrite_data_files('tour', 'full')").collect()
      assert(cat.loadEntries("tour").count(_.kind != "data") == 0)
      assert(spark.sql(s"SELECT count(*) FROM $g.tour").head().getLong(0) == expectAfter)
      // the REST listing reflects the doorway's commits (one shared head)
      val (cFinal, finalLoad) = get(port, "/v1/namespaces/default/tables/tour")
      assert(cFinal == 200)
      assert(finalLoad.contains(s""""current-snapshot-id":${cat.currentSnapshotId("tour")}"""),
        finalLoad.take(300))

      // 9. the interop exit (round 16): export the toured table's
      //    metadata.json chain and REGISTER it over REST into a SECOND,
      //    completely fresh catalog — the re-mounted table answers the
      //    same content with zero shared state
      val metaPath =
        graft.sources.IcebergMetadataJson.export(cat, root, "tour").toString
      val root2 = Files.createTempDirectory("graft-tour2").toString
      val cat2 = new GraftCatalog(root2)
      val server2 = new RestCatalogServer(cat2, port = 0)
      try {
        val (cReg, regLoad) = post(server2.boundPort,
          "/v1/namespaces/default/register",
          s"""{"name":"tour","metadata-location":"$metaPath"}""")
        assert(cReg == 200, regLoad)
        assert(cat2.scanTable(spark, "tour").count() == expectAfter)
        assert(cat2.tableProperties("tour")
          .get("import.metadata-location").contains(metaPath))
      } finally server2.close()
    } finally server.close()
  }
}
