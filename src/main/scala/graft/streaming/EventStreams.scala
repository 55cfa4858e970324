package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming surface over the `events` shape.
  *
  * The reference is bounded-batch only (`Boundedness::Bounded`,
  * `iceberg_file_task_scan.rs:97`); this module is the forward-looking
  * streaming tier of the engine, expressed with the idiomatic Spark
  * primitives: watermarked tumbling windows, built-in session windows, and
  * `mapGroupsWithState` for custom keyed state. All operators take a
  * streaming Dataset (tested via MemoryStream) and work identically on a
  * Kafka/file source at scale — state is keyed and partitioned by the
  * grouping key, so a 1000-executor cluster shards it naturally.
  */
object EventStreams {

  /** Typed event record (events fixture schema, ts as a timestamp). */
  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  /** Watermarked tumbling-window aggregation per event type. */
  def windowedCounts(
      events: Dataset[Event],
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows per user: events within `gap` of each other merge into
    * one session (built-in `session_window`, no custom state needed).
    */
  def userSessions(
      events: Dataset[Event],
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drop re-deliveries of the same event id, with
    * state bounded by the watermark (late duplicates beyond it age out of
    * the dedup state — the standard at-least-once → exactly-once repair).
    */
  def dedupStream(events: Dataset[Event], watermark: String = "1 hour"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: each event picks up its user's profile
    * from a static dimension (broadcast per micro-batch — the standard
    * at-scale shape for dimension enrichment; the static side can be a
    * parquet/Delta table refreshed between batches).
    */
  def enrich(events: Dataset[Event], users: DataFrame): DataFrame =
    events.toDF().join(broadcast(users), Seq("user_id"), "left_outer")

  final case class UserState(nEvents: Long, totalValue: Double)
  final case class UserUpdate(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user totals,
    * emitting the updated state on every micro-batch that touches the key.
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserUpdate](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.nEvents
          var total = prev.totalValue
          // fold in (ts, event_id) order: the group iterator arrives in
          // shuffle-fetch order, and double addition is non-associative —
          // an unordered fold would persist run-dependent low-order bits
          // into state (every other aggregation here sums deterministically)
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .foreach { e => n += 1; total += e.value }
          val next = UserState(n, total)
          state.update(next)
          UserUpdate(userId, n, total)
      }
  }

  /** Stream-stream interval join: each view pairs with the same user's
    * purchases that land within `withinSeconds` AFTER it. Both sides carry
    * watermarks and the join condition bounds event time in BOTH directions,
    * so Spark can expire buffered rows — state stays bounded on unbounded
    * streams (the canonical attribution-join shape). Keyed on user_id, so a
    * 1000-executor cluster shards the join state like any shuffle.
    */
  def viewPurchaseAttribution(
      views: Dataset[Event],
      purchases: Dataset[Event],
      withinSeconds: Long = 3600L,
      watermark: String = "2 hours"): DataFrame = {
    val v = views.toDF()
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = purchases.toDF()
      .withWatermark("ts", watermark)
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"), col("purchase_value"))
  }

  // ---- streaming near-duplicate detection --------------------------------

  /** A document arriving on the stream. */
  final case class DocEvent(doc_id: Long, ts: java.sql.Timestamp, text: String)

  /** An emitted candidate pair (doc_a < doc_b) with its signature distance. */
  final case class NearDupCandidate(doc_a: Long, doc_b: Long, hamming: Int)

  // not private: Catalyst's generated (de)serializers need constructor access
  final case class BandedDoc(band: Int, bval: Long, doc_id: Long, sh: Long)

  /** Per-bucket state: signatures seen so far, admission-capped. */
  final case class BucketState(members: Seq[(Long, Long)])

  /** Streaming near-dup candidates — the streaming twin of the batch q49
    * pipeline: each incoming doc's 32-bit SimHash (computed by the codegen
    * kernel BEFORE the stateful stage, so the hot hash work stays in
    * whole-stage codegen) is banded into two 16-bit LSH keys;
    * `flatMapGroupsWithState` keyed on (band, key) holds the bucket's seen
    * signatures and emits a candidate against every stored member within
    * `maxHamming`. State is sharded by band key across executors exactly
    * like the batch shuffle.
    *
    * Bounded state + bounded emission: a bucket stops ADMITTING members at
    * `maxBucket` (the streaming counterpart of the batch
    * `MaxBandBucket` drop — a boilerplate-text hot bucket cannot grow its
    * state or go quadratic). Pairs sharing both bands are emitted twice —
    * dedup downstream (the batch path's `distinct`), keeping the stateful
    * stage append-only. Production deployments would add
    * `GroupStateTimeout.EventTimeTimeout` + a watermark so stale buckets
    * age out; left unbounded here because the fixture streams are finite.
    */
  def streamingNearDupCandidates(
      docs: Dataset[DocEvent],
      maxHamming: Int = 3,
      maxBucket: Int = 256): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    val banded = docs.toDF()
      .select(col("doc_id"),
        graft.functions.TextOps.simhash32C(lower(col("text"))).as("sh"))
      .select(col("doc_id"), col("sh"),
        explode(array(
          struct(lit(0).as("band"), (col("sh") % 65536).as("bval")),
          struct(lit(1).as("band"),
            floor(col("sh") / 65536).cast("long").as("bval")))).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bval").as("bval"),
        col("doc_id"), col("sh"))
      .as[BandedDoc]
    banded.groupByKey(b => (b.band, b.bval))
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          var members = state.getOption.map(_.members).getOrElse(Seq.empty)
          val out = scala.collection.mutable.ListBuffer[NearDupCandidate]()
          rows.foreach { r =>
            // a re-delivered doc_id (at-least-once sources) is already in
            // state: skip it entirely, or duplicates would both re-emit its
            // pairs and burn cap slots that block genuinely new members
            val seen = members.exists(_._1 == r.doc_id)
            if (!seen && members.size < maxBucket) {
              members.foreach { case (id, sh) =>
                val h = java.lang.Long.bitCount(sh ^ r.sh)
                if (h <= maxHamming)
                  out += NearDupCandidate(
                    math.min(id, r.doc_id), math.max(id, r.doc_id), h)
              }
              members = members :+ ((r.doc_id, r.sh))
            }
          }
          state.update(BucketState(members))
          out.iterator
      }
  }
}
