package graft.wire

import graft.wire.CompactorProto._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gate-visible wire-surface queries (EP2): a golden `RewriteFilesRequest`
  * is encoded to protobuf bytes and decoded back through the full stack —
  * codec ([[CompactorProto]]) plus semantic routing ([[WireBridge]]) — and
  * the decoded result is emitted as rows. The DuckDB oracles are literal
  * VALUES of what the proto spec says those bytes mean, so the gate pins
  * the codec against an implementation-independent expectation (the bytes
  * are deterministic: same request, same encoder, every run).
  */
object WireQueries {

  import WireLiteral._
  import WirePrimitiveKind._

  /** Golden request: every content type, a schema with ids, eq-delete ids
    * that resolve by field id, and a config map.
    */
  private def goldenRequest: WireRewriteRequest = WireRewriteRequest(
    tasks = Seq(
      WireScanTask(0L, 4096L, 1000L, "s3://warehouse/data-00001.parquet",
        ContentData, FormatParquet, Seq(1, 2, 3), 41L, Nil),
      WireScanTask(0L, 1024L, 64L, "s3://warehouse/data-00002.avro",
        ContentData, FormatAvro, Seq(1, 2), 40L, Nil),
      WireScanTask(0L, 512L, 10L, "s3://warehouse/posdel-00001.parquet",
        ContentPositionDeletes, FormatParquet, Seq(1), 42L, Nil),
      WireScanTask(0L, 256L, 7L, "s3://warehouse/eqdel-00001.parquet",
        ContentEqualityDeletes, FormatParquet, Nil, 43L, Seq(2, 1))),
    config = Map("target_partitions" -> "8", "stats_cols" -> "id",
      "cluster_by" -> "id"),
    dirPath = "s3://warehouse/out",
    fileIo = Some(WireFileIo("s3://warehouse",
      Map("s3.region" -> "us-east-1"))),
    schema = Some(WireSchema(5L, Seq(
      WireField(1, "id", required = true, WirePrimitive(KLong)),
      WireField(2, "k", required = false, WirePrimitive(KInt)),
      WireField(3, "price", required = false, WirePrimitive(KDecimal(38, 5)))))),
    partitionSpec = None)

  /** Q73: encode → decode → route. One row per input scan task with its
    * routed role, exactly the reference decoder's routing rules.
    */
  private def q73(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val decoded = WireBridge.decodeRequest(
      decodeRewriteRequest(encodeRewriteRequest(goldenRequest)))
    val rows =
      decoded.dataTasks.map(t => (t.path, "data", t.format, t.seqNum, "")) ++
        decoded.posDeletes.map(t => (t.path, "posdel", "parquet", -1L, "")) ++
        decoded.eqDeletes.map(t =>
          (t.path, "eqdel", "parquet", t.seqNum, t.equalityCols.mkString(",")))
    rows.toDF("task_path", "role", "format", "seq_num", "eq_cols")
  }

  private val q73Sql =
    """SELECT * FROM (VALUES
      |  ('s3://warehouse/data-00001.parquet', 'data', 'parquet', CAST(41 AS BIGINT), ''),
      |  ('s3://warehouse/data-00002.avro', 'data', 'avro', CAST(40 AS BIGINT), ''),
      |  ('s3://warehouse/posdel-00001.parquet', 'posdel', 'parquet', CAST(-1 AS BIGINT), ''),
      |  ('s3://warehouse/eqdel-00001.parquet', 'eqdel', 'parquet', CAST(43 AS BIGINT), 'k,id')
      |) t(task_path, role, format, seq_num, eq_cols)""".stripMargin

  /** Q74: the wire literal tree decoded to values — decimals backed by
    * int64 AND by int128 (unscaled value beyond long), date day-ordinals,
    * and the AboveMax/BelowMin bound sentinels in the engine's rendering.
    * Values travel through encode→decode before rendering.
    */
  private def q74(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val cases: Seq[(String, WireLiteral, DataType)] = Seq(
      ("bool_true", PBool(true), BooleanType),
      ("int_neg", PInt(-7), IntegerType),
      ("long_max", PLong(Long.MaxValue), LongType),
      ("string_utf8", PString("héllo wörld"), StringType),
      ("date_epoch_days", PInt(17486), DateType),
      ("dec_long_backed", PLong(1420L), DecimalType(4, 2)),
      ("dec_int128_wide", PInt128(BigInt("12345678901234567890123")), DecimalType(38, 5)),
      ("dec_int128_neg", PInt128(BigInt("-98765432109876543210987")), DecimalType(38, 5)),
      ("dec_uint128", PUInt128(BigInt(2).pow(70)), DecimalType(38, 0)),
      ("bound_above_max", AboveMax, LongType),
      ("bound_below_min", BelowMin, LongType))
    val rows = cases.map { case (name, lit, tpe) =>
      val w = new ProtoWire.Writer
      encodeLiteral(w, lit)
      val back = decodeLiteral(new ProtoWire.Reader(w.toBytes))
      name -> WireBridge.boundString(back, tpe)
    }
    rows.toDF("lit_name", "rendered")
  }

  private val q74Sql =
    """SELECT * FROM (VALUES
      |  ('bool_true', 'true'),
      |  ('int_neg', '-7'),
      |  ('long_max', '9223372036854775807'),
      |  ('string_utf8', 'héllo wörld'),
      |  ('date_epoch_days', '2017-11-16'),
      |  ('dec_long_backed', '14.20'),
      |  ('dec_int128_wide', '123456789012345678.90123'),
      |  ('dec_int128_neg', '-987654321098765432.10987'),
      |  ('dec_uint128', '1180591620717411303424'),
      |  ('bound_above_max', 'above_max'),
      |  ('bound_below_min', 'below_min')
      |) t(lit_name, rendered)""".stripMargin

  /** Q129: the Iceberg-REST WRITE doorway end-to-end — a table created and
    * committed ENTIRELY over plain HTTP (zero graft imports on the client
    * side: `HttpURLConnection` POSTs an Iceberg struct schema, then a
    * commit with the spec's `assert-ref-snapshot-id` requirement adding
    * the scale-factor region parquet), then read back through the
    * catalog's normal MoR scan. This is the deployment shape the
    * reference ecosystem uses: an external engine writes files and the
    * catalog's REST commit swaps the pointer
    * (`core/src/compaction/mod.rs:183-202` reaches the same catalog
    * contract through `SqlCatalog`). SQL-reproducible because the
    * committed table IS region.
    */
  private def q129(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-q129").toString
    val cat = new graft.sources.GraftCatalog(s"$root/cat")
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort
      def post(path: String, body: String): Int = {
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
        in.readAllBytes(); in.close()
        code
      }
      val created = post("/v1/namespaces/default/tables",
        """{"name":"region_ext","schema":{"type":"struct","fields":[
          |{"id":1,"name":"r_regionkey","required":false,"type":"int"},
          |{"id":2,"name":"r_name","required":false,"type":"string"}]}}""".stripMargin)
      require(created == 200, s"REST create failed: HTTP $created")
      val committed = post("/v1/namespaces/default/tables/region_ext",
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":1}],
           |"updates":[{"action":"add-data-files","data-files":[
           |{"file-path":"$sfDir/region.parquet","file-format":"parquet"}]}]}""".stripMargin)
      require(committed == 200, s"REST commit failed: HTTP $committed")
      cat.scanTable(spark, "region_ext")
        .select(col("r_regionkey"), col("r_name"))
    } finally server.close()
  }

  private val q129Sql = "SELECT r_regionkey, r_name FROM region"

  /** Q142: the REST facade's NAMESPACE surface end-to-end — create a
    * namespace over HTTP, create a table inside it, commit data files into
    * it, verify the namespace listing carries the identifier, then read
    * the committed rows back through the namespaced catalog name
    * (`demo_db/nation` — the ecosystem deployment's `demo_db.table` shape,
    * `core/src/compaction/mod.rs:204-218` in the reference).
    */
  private def q142(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-q142").toString
    val cat = new graft.sources.GraftCatalog(s"$root/cat")
    val server = new RestCatalogServer(cat, port = 0)
    try {
      val port = server.boundPort
      def call(method: String, path: String, body: String): (Int, String) = {
        val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod(method)
        if (body.nonEmpty) {
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type", "application/json")
          val out = conn.getOutputStream
          out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.close()
        }
        val code = conn.getResponseCode
        val in = if (code < 400) conn.getInputStream else conn.getErrorStream
        val resp = if (in == null) ""
          else new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        if (in != null) in.close()
        (code, resp)
      }
      val (cNs, _) = call("POST", "/v1/namespaces",
        """{"namespace":["demo_db"],"properties":{"owner":"graft"}}""")
      require(cNs == 200, s"namespace create failed: HTTP $cNs")
      val (cT, _) = call("POST", "/v1/namespaces/demo_db/tables",
        """{"name":"nation","schema":{"type":"struct","fields":[
          |{"id":1,"name":"n_nationkey","required":false,"type":"int"},
          |{"id":2,"name":"n_name","required":false,"type":"string"},
          |{"id":3,"name":"n_regionkey","required":false,"type":"int"}]}}""".stripMargin)
      require(cT == 200, s"table create failed: HTTP $cT")
      val (cC, _) = call("POST", "/v1/namespaces/demo_db/tables/nation",
        s"""{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main","snapshot-id":1}],
           |"updates":[{"action":"add-data-files","data-files":[
           |{"file-path":"$sfDir/nation.parquet","file-format":"parquet"}]}]}""".stripMargin)
      require(cC == 200, s"commit failed: HTTP $cC")
      val (cL, listing) = call("GET", "/v1/namespaces/demo_db/tables", "")
      require(cL == 200 && listing.contains("\"nation\""),
        s"namespaced listing missing the table: $listing")
      cat.scanTable(spark, "demo_db/nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    } finally server.close()
  }

  private val q142Sql =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_wire_tasks" -> (q73 _),
    "q74_wire_literals" -> (q74 _),
    "q129_rest_commit" -> (q129 _),
    "q142_rest_namespace" -> (q142 _))

  def oracleSql: Map[String, String] = Map(
    "q73_wire_tasks" -> q73Sql,
    "q74_wire_literals" -> q74Sql,
    "q129_rest_commit" -> q129Sql,
    "q142_rest_namespace" -> q142Sql)
}
