package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SaveMode, SQLContext}
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister, EqualTo,
  Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  PrunedFilteredScan, RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft")` — the catalog as a first-class Spark data
  * source, so a catalog table is addressable from vanilla DataFrame code
  * and (via `createOrReplaceTempView`) plain SQL, with no graft imports at
  * the call site:
  *
  * {{{
  * spark.read.format("graft")
  *   .option("root", "/path/to/catalog").option("table", "t").load()
  * }}}
  *
  * The relation implements `PrunedFilteredScan`: Catalyst pushes the
  * query's filters and required columns down, and the relation projects
  * the filters onto the catalog's METADATA pruning ([[GraftCatalog
  * .scanTableWhere]] — partition-transform + per-file-stats skipping)
  * before any data IO. All filters are declared unhandled, so Spark
  * re-applies them exactly on top — pruning can only skip files, never
  * change results (the same conservative contract as the catalog scan).
  *
  * Registered through the standard `DataSourceRegister` service loading,
  * mirroring how spark-avro / delta expose their short names.
  */
final class GraftDataSource extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with DataSourceRegister {

  /** Shared option lookup with the provider's one error shape (each entry
    * point aliases it locally as `required`).
    */
  private def requiredOption(parameters: Map[String, String], k: String): String =
    parameters.getOrElse(k,
      throw new IllegalArgumentException(
        s"graft data source requires option '$k'"))

  /** `spark.readStream.format("graft")` — see [[GraftStreamSource]]. */
  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    def required(k: String) = requiredOption(parameters, k)
    // the catalog table is the schema authority: honoring a user-supplied
    // .schema(...) here while createSource scans with the catalog schema
    // would declare one shape and deliver another (mid-query binding
    // failure at the first batch) — reject up front with the remedy
    require(schema.isEmpty,
      "the graft streaming source derives its schema from the catalog " +
        "table; drop .schema(...) from readStream (evolve the table's " +
        "schema instead)")
    val cat = new GraftCatalog(required("root"))
    val base = cat.scanTable(sqlContext.sparkSession, required("table")).schema
    (shortName(),
      // .option("readChangeFeed", "true"): the CHANGELOG stream — net
      // I/D rows per snapshot window instead of append deltas (see
      // GraftStreamSource.changelogBatch); the tag column joins the schema
      if (parameters.get("readChangeFeed").exists(_.toBoolean))
        base.add(GraftStreamSource.ChangeTypeCol,
          org.apache.spark.sql.types.StringType)
      else base)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    def required(k: String) = requiredOption(parameters, k)
    new GraftStreamSource(sqlContext, required("root"), required("table"),
      skipRewrites = parameters.get("skipRewrites").exists(_.toBoolean),
      changeFeed = parameters.get("readChangeFeed").exists(_.toBoolean))
  }

  override def shortName(): String = "graft"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    def required(k: String) = requiredOption(parameters, k)
    val snapshot: Option[Long] = (parameters.get("snapshot"), parameters.get("tag")) match {
      // time travel through the vanilla entry point — Iceberg's
      // `VERSION AS OF` addressing: pin the scan to a retained snapshot id
      // or a named tag, resolved ONCE here so the relation serves a stable
      // version for its whole lifetime (a view over it never drifts)
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "graft data source takes 'snapshot' or 'tag', not both")
      case (Some(id), None) => Some(id.toLong)
      case (None, Some(t)) =>
        Some(new GraftCatalog(required("root")).snapshotIdOfTag(required("table"), t))
      case (None, None) => None
    }
    parameters.get("metadata") match {
      // .option("metadata", "files"|"partitions"|"snapshots"|"history"):
      // the inspection surface through the same vanilla entry point —
      // Iceberg's `db.table.files` addressing, format-option flavored
      case Some(kind) => new GraftMetadataRelation(
        sqlContext, required("root"), required("table"), kind)
      case None =>
        new GraftRelation(sqlContext, required("root"), required("table"), snapshot)
    }
  }

  /** `df.write.format("graft")` — the WRITE side of the vanilla entry
    * point, mapped onto catalog commits:
    *
    *  - `Append` — one counted append commit ([[GraftCatalog.appendFiles]];
    *    creates the table with the frame's id-stamped schema when absent);
    *  - `Overwrite` — ONE atomic replace commit
    *    ([[GraftCatalog.overwriteTable]]: readers see old XOR new, never
    *    an empty window);
    *  - `ErrorIfExists` / `Ignore` — the standard existence semantics.
    *
    * Data files land under `option("outDir", …)` (default
    * `<root>/_data/<table>`). Returns the read relation over the table,
    * per the `CreatableRelationProvider` contract.
    */
  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    def required(k: String) = requiredOption(parameters, k)
    val root = required("root")
    val table = required("table")
    val cat = new GraftCatalog(root)
    val spark = sqlContext.sparkSession
    val outDir = parameters.getOrElse("outDir", s"$root/_data/$table")
    val exists = cat.tableExists(table)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(
          s"table $table already exists (SaveMode.ErrorIfExists)")
      case SaveMode.Ignore if exists => ()
      case m =>
        if (!exists)
          cat.createTable(table, Nil, Some(FieldIds.stamp(data.schema)))
        if (m == SaveMode.Overwrite && exists)
          cat.overwriteTable(spark, table, data, outDir)
        else
          cat.appendFiles(spark, table, data, outDir)
    }
    createRelation(sqlContext, parameters)
  }

  /** `stream.writeStream.format("graft")` — streaming ingestion through
    * the vanilla entry point, mapped onto the catalog's EXACTLY-ONCE
    * micro-batch commits ([[GraftCatalog.appendStreamBatch]]: snapshot
    * document → batch mark → head advance, with torn commits rolled
    * forward and replayed batch ids skipped). `option("queryId", …)`
    * names the replay-dedup domain; it defaults to the checkpoint
    * location, which Structured Streaming already requires to be stable
    * across restarts. Append-only (the catalog's commit model); the table
    * is created from the stream's id-stamped schema on first batch.
    */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    def required(k: String) = requiredOption(parameters, k)
    val root = required("root")
    val table = required("table")
    require(partitionColumns.isEmpty,
      "graft sink takes no partitionBy — declare a partition spec on the table")
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft sink is append-only, got $outputMode")
    val outDir = parameters.getOrElse("outDir", s"$root/_data/$table")
    val queryId = parameters.get("queryId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "graft sink requires option 'queryId' (or a checkpointLocation)"))
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(
          batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
        val spark = data.sparkSession
        // the V1 sink hands the analyzed STREAMING plan — re-wrap the
        // executed rows as a batch frame so the catalog's parquet write
        // accepts it (the standard V1-sink re-materialization)
        val batch =
          org.apache.spark.sql.graftbridge.DatasetBridge.asBatch(data)
        val cat = new GraftCatalog(root)
        if (!cat.tableExists(table))
          cat.createTable(table, Nil, Some(FieldIds.stamp(batch.schema)))
        cat.appendStreamBatch(spark, table, batch, outDir, queryId, batchId)
        ()
      }
    }
  }
}

/** A metadata table as a relation: rebuilt from the snapshot documents on
  * every scan, so a temp view always reflects the current snapshot.
  */
final class GraftMetadataRelation(
    override val sqlContext: SQLContext,
    root: String,
    table: String,
    kind: String) extends BaseRelation with TableScan {

  private val catalog = new GraftCatalog(root)
  private def df = catalog.metadataTable(sqlContext.sparkSession, table, kind)

  override val schema: StructType = df.schema

  override def buildScan(): RDD[Row] = df.rdd
}

final class GraftRelation(
    override val sqlContext: SQLContext,
    private[graft] val root: String,
    private[graft] val table: String,
    private[graft] val snapshot: Option[Long] = None)
    extends BaseRelation with PrunedFilteredScan
    with org.apache.spark.sql.sources.InsertableRelation {

  private val catalog = new GraftCatalog(root)
  private def spark = sqlContext.sparkSession

  /** Plain-SQL DML through a temp view over this relation:
    * `INSERT INTO v SELECT …` lands as one counted append commit,
    * `INSERT OVERWRITE` as ONE atomic replace ([[GraftCatalog
    * .overwriteTable]]). Version-pinned relations refuse writes — an
    * insert "into the past" would silently target the current head.
    */
  override def insert(
      data: org.apache.spark.sql.DataFrame, overwrite: Boolean): Unit = {
    require(snapshot.isEmpty,
      "INSERT into a snapshot/tag-pinned relation is not allowed " +
        "(reads are pinned to history; writes go to the current table)")
    val outDir = s"$root/_data/$table"
    if (overwrite) catalog.overwriteTable(spark, table, data, outDir)
    else catalog.appendFiles(spark, table, data, outDir)
    ()
  }

  override val schema: StructType =
    snapshot.fold(catalog.scanTable(spark, table))(
      catalog.scanTableAt(spark, table, _)).schema

  /** Answer Spark's size question from catalog METADATA (the manifests'
    * `file_size_in_bytes`, scaled by `spark.sql.sources.fileCompressionFactor`
    * like the builtin file sources) so a small graft table auto-broadcasts
    * in joins. Without this a BaseRelation reports `defaultSizeInBytes`
    * (Long.MaxValue-ish) and NEVER broadcasts — at 100 TB that turns every
    * dim-to-fact join on a catalog table into a shuffle. Deletes only
    * shrink the MoR output, so the data-file sum stays a valid upper
    * bound; any unknown size (-1) falls back to the conservative default
    * rather than risking a mis-broadcast of an unbounded table.
    */
  override def sizeInBytes: Long = {
    val entries =
      snapshot.fold(catalog.loadEntries(table))(catalog.loadEntriesAt(table, _))
    val sizes = entries.filter(_.kind == "data").map(_.sizeBytes)
    if (sizes.forall(_ >= 0L)) {
      val factor = spark.conf
        .get("spark.sql.sources.fileCompressionFactor", "1.0").toDouble
      math.max(1L, (sizes.sum * factor).toLong)
    } else super.sizeInBytes
  }

  /** Declare every filter unhandled: Spark evaluates all of them on the
    * returned rows, so [[buildScan]] is free to use them purely as pruning
    * hints (partial pushdown with zero correctness risk).
    */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val base = (snapshot, GraftRelation.bestRange(filters, schema)) match {
      // a pinned version reads that snapshot's MoR state; metadata range
      // pruning applies to the CURRENT snapshot's file set only, so the
      // pinned path takes the unpruned scan (filters still re-applied by
      // Spark — correctness identical, pruning is a current-head fast path)
      case (Some(id), _) => catalog.scanTableAt(spark, table, id)
      case (None, Some((c, lo, hi))) => catalog.scanTableWhere(spark, table, c, lo, hi)
      case (None, None) => catalog.scanTable(spark, table)
    }
    // requiredColumns CAN be empty (e.g. COUNT(*)): an empty select is the
    // legal zero-column projection — rows keep their count while skipping
    // every column's decode; returning `base` unprojected instead would
    // materialize the full width just to throw it away
    base.select(requiredColumns.toSeq.map(org.apache.spark.sql.functions.col): _*).rdd
  }
}

object GraftRelation {

  /** Fold the pushed filters into the tightest single-column numeric range
    * `[lo, hi]` — the shape the catalog's metadata pruning consumes.
    * Strict bounds are relaxed to closed ones (pruning needs a superset;
    * Spark re-applies the exact predicate). Columns scored by bound count,
    * so `k = 5` (two bounds) beats `j >= 0` (one).
    */
  private[sources] def bestRange(
      filters: Array[Filter],
      schema: StructType): Option[(String, Double, Double)] = {
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    val numericCols = schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
        f.name
    }.toSet
    val bounds = scala.collection.mutable.Map
      .empty[String, (Double, Double, Int)] // lo, hi, count
    def add(c: String, lo: Double, hi: Double): Unit =
      if (numericCols(c)) {
        val (l0, h0, n) = bounds.getOrElse(c,
          (Double.NegativeInfinity, Double.PositiveInfinity, 0))
        bounds(c) = (math.max(l0, lo), math.min(h0, hi), n + 1)
      }
    filters.foreach {
      case EqualTo(c, v) => num(v).foreach(d => add(c, d, d))
      case GreaterThan(c, v) => num(v).foreach(d => add(c, d, Double.PositiveInfinity))
      case GreaterThanOrEqual(c, v) => num(v).foreach(d => add(c, d, Double.PositiveInfinity))
      case LessThan(c, v) => num(v).foreach(d => add(c, Double.NegativeInfinity, d))
      case LessThanOrEqual(c, v) => num(v).foreach(d => add(c, Double.NegativeInfinity, d))
      case _ => ()
    }
    bounds.toSeq
      .filter { case (_, (lo, hi, _)) => lo <= hi && (
        lo != Double.NegativeInfinity || hi != Double.PositiveInfinity) }
      .sortBy { case (c, (_, _, n)) => (-n, c) }
      .headOption.map { case (c, (lo, hi, _)) =>
        // scanTableWhere takes finite doubles; open sides widen to extremes
        (c, if (lo == Double.NegativeInfinity) -Double.MaxValue else lo,
          if (hi == Double.PositiveInfinity) Double.MaxValue else hi)
      }
  }
}
