package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

/** Declared Structured Streaming queries — the streaming tier surfaced in
  * the driver's correctness gate. Each query reads the `events` fixture AS A
  * STREAM (`spark.readStream.parquet`), runs a genuinely streaming pipeline
  * (watermarked window aggregation / stream-static broadcast enrichment) to
  * completion with `Trigger.AvailableNow`, and returns the materialized
  * result, which is batch-equivalent and therefore DuckDB-oracle-checkable.
  *
  * The reference itself is bounded-batch only (`Boundedness::Bounded`,
  * `iceberg_file_task_scan.rs:97`); this tier is the forward-looking
  * streaming surface built on the idiomatic Spark primitives. At scale the
  * same pipelines run unchanged against a Kafka/file source with a real
  * sink — the memory sink here holds only the (small) aggregated state, and
  * the complete-output-mode caveat is documented per query.
  */
object StreamQueries {

  /** Memory-sink names must be unique per run: a second `start` with a live
    * query of the same name throws, and a stale same-name temp view would
    * silently serve a previous run's data.
    */
  private val sinkId = new AtomicLong()

  /** Run a streaming query to completion with the given output mode and
    * return the memory-sink table. The number of state-store partitions is
    * pinned to the streaming default (8) for the duration of the start —
    * Structured Streaming freezes `spark.sql.shuffle.partitions` into the
    * query's state layout at first start, and 32 stores for the fixture's
    * tiny keyed state is pure per-microbatch overhead. At scale this knob
    * sizes UP with key cardinality; it is per-query state layout, not a
    * session-wide choice, which is exactly why it's scoped here.
    */
  private def runToCompletion(
      df: DataFrame, mode: String,
      scopedConfs: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    val name = s"graft_stream_sink_${sinkId.incrementAndGet()}"
    // the set/restore of session-global confs is serialized: interleaved
    // pairs from two threads could strand a value on the session
    // (start() clones the session synchronously, so restoring before
    // awaitTermination is safe). scopedConfs (e.g. q100's RocksDB state
    // store provider) ride the SAME critical section — set outside it, a
    // concurrently starting stream could clone the session mid-override.
    val q = startLock.synchronized {
      val conf = spark.conf
      val prev = conf.get("spark.sql.shuffle.partitions")
      val prevScoped = scopedConfs.keys.map(k => k -> conf.getOption(k)).toMap
      try {
        conf.set("spark.sql.shuffle.partitions",
          math.min(8, prev.toInt).toString)
        scopedConfs.foreach { case (k, v) => conf.set(k, v) }
        df.writeStream
          .format("memory")
          .queryName(name)
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .start()
      } finally {
        conf.set("spark.sql.shuffle.partitions", prev)
        prevScoped.foreach {
          case (k, Some(v)) => conf.set(k, v)
          case (k, None) => conf.unset(k)
        }
      }
    }
    q.awaitTermination()
    // materialize OFF the memory sink and drop it: the sink's rows live on
    // the driver for the session lifetime otherwise — a bench looping the
    // streaming queries would accumulate one result copy per run
    val sunk = spark.table(name)
    val rows = sunk.collect()
    val schema = sunk.schema
    spark.catalog.dropTempView(name)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  private val startLock = new Object


  /** Run a streaming aggregation to completion (AvailableNow drains every
    * available file, then stops) and return the memory-sink table. Complete
    * output mode: with a finite stream, append mode would hold the trailing
    * windows in state forever (the watermark only advances on a NEXT batch,
    * which never comes), so the final result would be missing the tail —
    * complete mode emits the full deterministic aggregate instead. The
    * memory sink holds only aggregated rows (window × type / segment ×
    * type), not the event stream.
    */
  private def runComplete(df: DataFrame): DataFrame = runToCompletion(df, "complete")

  /** FileStreamSource only accepts a directory; the fixture ships one
    * parquet FILE per table. Stage a per-sfDir temp directory holding a
    * symlink to the file (memoized — repeat queries reuse it). A real
    * deployment points at the table directory and this is a no-op branch.
    */
  private val stagedDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[graft] def streamableDir(path: String): String = {
    import java.nio.file.{Files, Paths}
    // absolute target: a relative sfDir would otherwise produce a symlink
    // relative to the TEMP dir (dangling), failing every streaming query
    val src = Paths.get(path).toAbsolutePath.normalize
    if (Files.isDirectory(src)) path
    else stagedDirs.getOrElseUpdate(path, {
      val d = Files.createTempDirectory("graft_stream_src_")
      d.toFile.deleteOnExit()
      Files.createSymbolicLink(d.resolve(src.getFileName), src)
      d.toString
    })
  }

  /** Run an append-mode streaming query to completion — for stateful
    * non-aggregate operators (streaming dedup) where complete mode is not
    * defined. AvailableNow drains the source, append emits each surviving
    * row exactly once.
    */
  private[graft] def runAppend(df: DataFrame): DataFrame = runToCompletion(df, "append")

  /** Streamed events with a proper event-time column. The fixture's ts has
    * shipped as BOTH TIMESTAMP(NANOS) (→ nanos-long under the repo-wide
    * `nanosAsLong` conf; truncated to µs here — cannot move an event
    * across an hour boundary, so window membership is unaffected) and
    * plain `timestamp[us]` (TIMESTAMP_NTZ → re-typed TIMESTAMP under the
    * UTC session zone, same instant). [[graft.Tables.eventTime]] branches
    * on the physical type so both fixture shapes stream identically.
    */
  private def eventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(streamableDir(path))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        graft.Tables.eventTime(col("ts"), schema("ts").dataType).as("ts"))
  }

  /** Q68: watermarked tumbling-window aggregation over the event stream —
    * counts and value sums per (hour, event_type). The watermark bounds
    * state on an unbounded source; the window key shards state across
    * executors exactly like a batch shuffle.
    */
  private def q68(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventStream(spark, sfDir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start_sec"),
        col("event_type"), col("n"), col("sum_value"))
    runComplete(agg)
  }

  private val q68Sql =
    """SELECT epoch_ns(date_trunc('hour', ts)) // 1000000000 AS win_start_sec,
      |       event_type, count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Q69: stream-static enrichment — each event picks up its user's market
    * segment from the static customer dimension via a broadcast join (the
    * standard per-micro-batch dimension-enrichment shape; the static side
    * re-resolves every batch, so a refreshed dimension table is picked up
    * between batches at scale), then rolls up per (segment, event_type).
    */
  private def q69(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val agg = eventStream(spark, sfDir)
      .join(broadcast(dim), Seq("user_id"), "left_outer")
      .select(coalesce(col("c_mktsegment"), lit("NONE")).as("segment"),
        col("event_type"), col("value"))
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    runComplete(agg)
  }

  private val q69Sql =
    """SELECT coalesce(c.c_mktsegment, 'NONE') AS segment, e.event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events e
      |LEFT JOIN customer c ON c.c_custkey = e.user_id
      |GROUP BY 1, 2""".stripMargin

  /** Q75: streaming exact dedup — the streaming twin of q40's batch dedup
    * and the ingestion-time shape of a training-data pipeline (drop
    * duplicate documents as they arrive, BEFORE paying downstream compute).
    * `dropDuplicates` on the content hash keeps first-arrival per key in
    * state; every emitted column is a pure function of the text, so the
    * output SET is deterministic regardless of which physical row arrives
    * first. At scale the same query runs with a watermark on an event-time
    * column to bound state; the drain-once fixture needs none.
    */
  private def q75(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val docs = spark.readStream.schema(schema).parquet(streamableDir(path))
    val deduped = docs
      .select(md5(lower(col("text"))).as("k"),
        graft.functions.TextOps.shingleCountC(lower(col("text")), 1).as("n_tokens"))
      .dropDuplicates("k")
    runAppend(deduped)
  }

  private val q75Sql =
    """SELECT DISTINCT md5(lower(text)) AS k,
      |       CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT)
      |         AS n_tokens
      |FROM documents""".stripMargin

  /** Q79: streaming sessionization — `session_window` (gap 30 min) keyed by
    * user, the canonical stateful streaming shape: windows merge as events
    * arrive, the watermark bounds session state on an unbounded source, and
    * state shards by (user, window) exactly like a batch shuffle. Session
    * membership is a pure function of event times (merge while the gap to
    * the previous event is < 30 min), so the drained result is
    * batch-equivalent: the oracle is the same gaps-and-islands sessionize
    * as batch q66, with the session break at `gap >= 30 min` (Spark's
    * window [ts, ts+gap) overlap rule) and `end_sec` = last event + gap
    * (the window's close, not the last event).
    */
  private def q79(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventStream(spark, sfDir)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_sec"),
        unix_timestamp(col("session_window.end")).as("end_sec"),
        col("n_events"), col("sum_value"))
    runComplete(agg)
  }

  private val q79Sql =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tsu, value
      |           FROM events),
      |s AS (SELECT *, CASE WHEN lag(tsu) OVER w IS NULL
      |                      OR tsu - lag(tsu) OVER w >= 1800000000
      |                     THEN 1 ELSE 0 END AS new_sess
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
      |s2 AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
      |                                     ORDER BY tsu, event_id
      |                                     ROWS UNBOUNDED PRECEDING) AS sid
      |       FROM s)
      |SELECT user_id,
      |       min(tsu) // 1000000 AS start_sec,
      |       (max(tsu) + 1800000000) // 1000000 AS end_sec,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM s2 GROUP BY user_id, sid""".stripMargin

  /** Keyed record for the custom-state stage: `micros` is the event value
    * quantized to decimal(18,6) micro-units — LONG state sums are exact and
    * commutative, so the persisted state carries no fold-order bits (the
    * double-accumulating demo variant in [[EventStreams.runningUserTotals]]
    * must sort each batch instead). Not private: Catalyst's generated
    * (de)serializers need constructor access.
    */
  final case class KeyedValue(user_id: Long, micros: Long)

  final case class TotalsState(nEvents: Long, totalMicros: Long)

  /** Q82: custom keyed state in the declared gate — `mapGroupsWithState`
    * running per-user totals (the building block the built-in aggregations
    * don't cover: arbitrary per-key state machines). State is (count,
    * exact micro-unit sum); the final emitted total converts to double
    * once, reproducing the oracle's `CAST(sum(decimal) AS DOUBLE)` bit for
    * bit. AvailableNow over the one-file fixture drains in a single
    * micro-batch, so update mode emits exactly one final row per user.
    * At scale state shards by user across executors like any shuffle, and
    * a watermark + `GroupStateTimeout.EventTimeTimeout` bounds it on an
    * unbounded source.
    */
  private def q82(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val keyed = eventStream(spark, sfDir)
      .select(col("user_id"),
        (col("value").cast("decimal(18,6)") * lit(1000000L))
          .cast("long").as("micros"))
      .as[KeyedValue]
    val updates = keyed.groupByKey(_.user_id)
      .mapGroupsWithState[TotalsState, (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[KeyedValue], state: GroupState[TotalsState]) =>
          val prev = state.getOption.getOrElse(TotalsState(0L, 0L))
          var n = prev.nEvents
          var total = prev.totalMicros
          batch.foreach { e => n += 1; total += e.micros }
          state.update(TotalsState(n, total))
          (userId, n, total.toDouble / 1e6)
      }
      .toDF("user_id", "n_events", "total_value")
    runUpdate(updates)
  }

  private val q82Sql =
    """SELECT user_id, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Run a stateful update-mode streaming query to completion —
    * `mapGroupsWithState` only supports update output.
    */
  private def runUpdate(df: DataFrame): DataFrame = runToCompletion(df, "update")

  /** Per-user stats under the new API: count + exact micro sum + micro max
    * (all order-free, so no fold-order bits persist).
    */
  final case class TwsStats(nEvents: Long, sumMicros: Long, maxMicros: Long)

  /** Q100's `StatefulProcessor` — Spark 4's `transformWithState`
    * replacement for `mapGroupsWithState`: typed per-key state handles
    * from `getHandle` (here one `ValueState`), TTL support, timers, and
    * the RocksDB state store underneath. The processor is a top-level
    * class because executors deserialize it.
    */
  final class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, KeyedValue, (Long, Long, Double, Double)] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders, streaming}

    @transient private var state: ValueState[TwsStats] = _

    override def init(outputMode: streaming.OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TwsStats](
        "totals", Encoders.product[TwsStats], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedValue],
        timers: streaming.TimerValues): Iterator[(Long, Long, Double, Double)] = {
      val prev = if (state.exists()) state.get() else TwsStats(0L, 0L, Long.MinValue)
      var n = prev.nEvents
      var sum = prev.sumMicros
      var max = prev.maxMicros
      rows.foreach { e =>
        n += 1; sum += e.micros; if (e.micros > max) max = e.micros
      }
      state.update(TwsStats(n, sum, max))
      Iterator.single((key, n, sum.toDouble / 1e6, max.toDouble / 1e6))
    }
  }

  /** Q100: `transformWithState` in the declared gate — the Spark-4-native
    * arbitrary-state operator (successor to `mapGroupsWithState`) over the
    * RocksDB state store: explicit typed state handles, TTL-capable,
    * timer-capable. Emits one (count, exact-sum, max) row per user; the
    * RocksDB provider conf is scoped to this query start the same way the
    * state-store parallelism is.
    */
  private def q100(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.TimeMode
    import spark.implicits._
    val keyed = eventStream(spark, sfDir)
      .select(col("user_id"),
        (col("value").cast("decimal(18,6)") * lit(1000000L))
          .cast("long").as("micros"))
      .as[KeyedValue]
    val updates = keyed.groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor, TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
      .toDF("user_id", "n_events", "total_value", "max_value")
    // the provider override rides runToCompletion's startLock section:
    // set/restored atomically with the start, so a concurrently starting
    // stream can never clone the session with RocksDB accidentally set
    runToCompletion(updates, "update", Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
  }

  private val q100Sql =
    """SELECT user_id, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      |       CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS max_value
      |FROM events
      |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_stream_window" -> (q68 _),
    "q69_stream_enrich" -> (q69 _),
    "q75_stream_dedup" -> (q75 _),
    "q79_stream_sessions" -> (q79 _),
    "q82_stream_state" -> (q82 _),
    "q100_stream_tws" -> (q100 _),
    "q126_stream_ingest" -> (q126 _))

  /** Q126: streaming ingestion into the CATALOG — the document stream
    * drained through [[graft.sources.GraftCatalog.streamAppend]]
    * (foreachBatch → exactly-once append commits, one snapshot per
    * micro-batch), then read back through the catalog's own scan. The
    * production landing-zone shape: restart-safe via checkpoint + batch-id
    * marks, and the accumulated small files are exactly what the
    * compaction scheduler then sweeps. Batch-equivalent because append
    * commits never reorder or drop rows, so the oracle is the plain
    * GROUP BY over the same corpus.
    */
  private def q126(spark: SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-q126").toString
    val cat = new graft.sources.GraftCatalog(s"$root/cat")
    cat.createTable("documents", Nil)
    val path = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val docs = spark.readStream.schema(schema).parquet(streamableDir(path))
    val q = cat.streamAppend(docs, "documents", s"$root/data",
      s"$root/ckpt", "q126-ingest")
    q.awaitTermination()
    cat.scanTable(spark, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
  }

  private val q126Sql =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |GROUP BY 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q68_stream_window" -> q68Sql,
    "q69_stream_enrich" -> q69Sql,
    "q75_stream_dedup" -> q75Sql,
    "q79_stream_sessions" -> q79Sql,
    "q82_stream_state" -> q82Sql,
    "q100_stream_tws" -> q100Sql,
    "q126_stream_ingest" -> q126Sql)
}
