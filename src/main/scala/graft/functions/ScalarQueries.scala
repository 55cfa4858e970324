package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Engine-surface scalar-function queries Q30–Q35 (SURVEY §2.6): string /
  * date / math / array / map / json, all built-in codegen'd Spark functions
  * (no UDFs), row-level over the fixture tables.
  *
  * Cross-engine conventions: Spark int-typed results are cast to long where
  * DuckDB returns BIGINT (length, year, datediff, ceil/floor, size); math
  * stays on IEEE-deterministic ops (sqrt, integral powers) or exact decimal
  * rounding — never `round` on raw doubles.
  */
object ScalarQueries {

  /** Q30 string functions over part. */
  private def q30(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    p.select(col("p_partkey"),
      upper(substring(col("p_name"), 1, 8)).as("name_u"),
      concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
      length(col("p_name")).cast("long").as("name_len"),
      col("p_name").like("%gre%").as("has_gre"),
      regexp_extract(col("p_type"), "([A-Z]+)", 1).as("type_head"),
      regexp_replace(col("p_brand"), "Brand#", "B").as("brand_short"),
      lower(trim(col("p_type"))).as("type_l"))
  }

  /** Q31 date functions over orders. */
  private def q31(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.select(col("o_orderkey"),
      // dates out as ISO strings (typed DATE dumps don't compare portably)
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mo"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
        .cast("long").as("days_since"))
  }

  /** Q32 math functions over lineitem. */
  private def q32(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.select(col("l_orderkey"), col("l_linenumber"),
      abs(col("l_discount") - lit(0.05)).as("abs_d"),
      ceil(col("l_extendedprice")).as("ceil_p"),
      floor(col("l_extendedprice")).as("floor_p"),
      (col("l_orderkey") % 7).as("mod7"),
      pow(col("l_quantity"), lit(2)).as("qty_sq"),
      sqrt(col("l_quantity")).as("qty_sqrt"),
      round(col("l_extendedprice").cast("decimal(18,2)"), 1)
        .cast("double").as("price_r"))
  }

  /** Q33 array functions over documents (whitespace tokens). */
  private def q33(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val toks = split(col("text"), " ")
    d.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      array_contains(toks, "spark").as("has_spark"),
      element_at(toks, 1).as("first_tok"),
      size(array_distinct(toks)).cast("long").as("n_uniq"),
      size(filter(toks, t => length(t) > lit(4))).cast("long").as("n_long"),
      array_join(slice(sort_array(array_distinct(toks)), 1, 5), ",").as("top5"))
  }

  /** Q34 map functions over events (map built from row values; outputs kept
    * scalar so the dump stays engine-portable).
    */
  private def q34(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val m = map(lit("t"), col("event_type"), lit("u"), col("user_id").cast("string"))
    ev.select(col("event_id"),
      element_at(m, "t").as("m_t"),
      element_at(m, "u").as("m_u"),
      size(m).cast("long").as("m_card"),
      array_join(sort_array(map_keys(m)), ",").as("keys_csv"),
      array_join(sort_array(map_values(m)), ",").as("vals_csv"))
  }

  /** Q35 JSON extraction over events.props — ONE `from_json` pass with an
    * explicit schema; every output derives from the parsed struct (the
    * earlier per-column `get_json_object` re-ran the JSON path parser per
    * extraction and was the q35 bench cost).
    */
  private def q35(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val schema = StructType.fromDDL("k BIGINT")
    val k = from_json(col("props"), schema).getField("k")
    ev.select(col("event_id"),
      k.cast("string").as("k_str"),
      k.as("k_num"),
      k.as("k_parsed"))
  }

  /** Q36 wire-type conventions (SURVEY §1.2; reference wire schema
    * `core/proto/iceberg.proto:63-89`, decode `parser/proto.rs:177-240`):
    * the reference types Spark has no native type for, exercised under the
    * documented conventions — Uuid as canonical 8-4-4-4-12 lowercase
    * string, Fixed(16) as length-checked binary (hex-rendered for the
    * portable dump), Time as µs-since-midnight long, TimestampNs truncated
    * to µs (events.ts normalized to a nanos long whatever the fixture's
    * physical type — [[Tables.eventsNanos]]), and a Decimal(18,6)
    * rendered at full scale.
    */
  private def q36(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsNanos(spark, sfDir)
    val h = md5(concat(lit("graft:"), col("event_id").cast("string")))
    ev.select(col("event_id"),
      concat_ws("-", substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
        substring(h, 17, 4), substring(h, 21, 12)).as("uuid_str"),
      (expr("ts div 1000") % 86400000000L).as("time_us"),
      expr("ts div 1000").as("ts_us"),
      h.as("fixed16_hex"),
      (length(unhex(h)) === 16).as("fixed16_ok"),
      col("user_id").cast("decimal(18,6)").cast("string").as("dec_str"))
  }

  /** Q99: the SQL doorway, gate-proven — the same codegen kernels the
    * DataFrame queries use, but invoked through their REGISTERED SQL names
    * (`GraftFunctions.registerAll`) from a `spark.sql` string. Proves that
    * a pure-SQL user of the library gets bit-identical kernel results, in
    * the driver's own oracle gate.
    */
  private def q99(spark: SparkSession, sfDir: String): DataFrame = {
    GraftFunctions.registerAll(spark) // idempotent: replaces same-name entries
    val view = "graft_docs_sql_surface"
    Tables.documents(spark, sfDir).createOrReplaceTempView(view)
    spark.sql(
      s"""SELECT doc_id,
         |       graft_portable_hash(lower(text)) AS phash,
         |       graft_fingerprint(lower(text)) AS fp,
         |       graft_shingle_count(lower(text), 3) AS n3
         |FROM $view""".stripMargin)
  }

  private val q99Sql = {
    // the single source of truth for the portable-hash SQL twin
    val th = graft.pipeline.PipelineQueries.StrHashSql
    s"""WITH toks AS (SELECT doc_id, lower(text) AS lt,
       |                     string_split(lower(text), ' ') AS t FROM documents),
       |sc AS (
       |  SELECT doc_id, count(DISTINCT s) AS n3 FROM toks,
       |  unnest(CASE WHEN len(t) >= 3
       |              THEN list_transform(range(1, len(t) - 1),
       |                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |              ELSE [] END) AS u(s)
       |  GROUP BY 1)
       |SELECT k.doc_id,
       |       ${th.format("k.lt")} AS phash,
       |       list_reduce(
       |         list_concat([CAST(0 AS BIGINT)],
       |           list_transform(k.t, x -> ${th.format("x")})),
       |         (a, b) -> (a * 131 + b) % 1000000007) AS fp,
       |       coalesce(sc.n3, 0) AS n3
       |FROM toks k LEFT JOIN sc ON sc.doc_id = k.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_string" -> (q30 _),
    "q31_date" -> (q31 _),
    "q32_math" -> (q32 _),
    "q33_array" -> (q33 _),
    "q34_map" -> (q34 _),
    "q35_json" -> (q35 _),
    "q36_wiretypes" -> (q36 _),
    "q99_sql_surface" -> (q99 _))

  val oracleSql: Map[String, String] = Map(
    "q30_string" ->
      """SELECT p_partkey,
        |       upper(substr(p_name, 1, 8)) AS name_u,
        |       concat_ws('#', p_brand, p_type) AS brand_type,
        |       length(p_name) AS name_len,
        |       p_name LIKE '%gre%' AS has_gre,
        |       regexp_extract(p_type, '([A-Z]+)', 1) AS type_head,
        |       replace(p_brand, 'Brand#', 'B') AS brand_short,
        |       lower(trim(p_type)) AS type_l
        |FROM part""".stripMargin,
    "q31_date" ->
      """SELECT o_orderkey,
        |       strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
        |       year(o_orderdate) AS yr,
        |       month(o_orderdate) AS mo,
        |       dayofmonth(o_orderdate) AS dom,
        |       quarter(o_orderdate) AS qtr,
        |       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
        |       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders""".stripMargin,
    "q32_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS abs_d,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
        |       l_orderkey % 7 AS mod7,
        |       power(l_quantity, 2) AS qty_sq,
        |       sqrt(l_quantity) AS qty_sqrt,
        |       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r
        |FROM lineitem""".stripMargin,
    "q33_array" ->
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS n_tokens,
        |       list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |       string_split(text, ' ')[1] AS first_tok,
        |       len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |       len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long,
        |       array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 5), ',') AS top5
        |FROM documents""".stripMargin,
    "q34_map" ->
      """SELECT event_id,
        |       m['t'][1] AS m_t,
        |       m['u'][1] AS m_u,
        |       CAST(cardinality(m) AS BIGINT) AS m_card,
        |       array_to_string(list_sort(map_keys(m)), ',') AS keys_csv,
        |       array_to_string(list_sort(map_values(m)), ',') AS vals_csv
        |FROM (SELECT event_id,
        |             map(['t', 'u'], [event_type, CAST(user_id AS VARCHAR)]) AS m
        |      FROM events) t""".stripMargin,
    "q35_json" ->
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed
        |FROM events""".stripMargin,
    "q36_wiretypes" ->
      """SELECT event_id,
        |       concat_ws('-', substr(h, 1, 8), substr(h, 9, 4), substr(h, 13, 4),
        |                 substr(h, 17, 4), substr(h, 21, 12)) AS uuid_str,
        |       (epoch_ns(ts) // 1000) % 86400000000 AS time_us,
        |       epoch_ns(ts) // 1000 AS ts_us,
        |       h AS fixed16_hex,
        |       octet_length(unhex(h)) = 16 AS fixed16_ok,
        |       CAST(CAST(user_id AS DECIMAL(18,6)) AS VARCHAR) AS dec_str
        |FROM (SELECT *, md5('graft:' || CAST(event_id AS VARCHAR)) AS h
        |      FROM events) t""".stripMargin,
    "q99_sql_surface" -> q99Sql)
}
