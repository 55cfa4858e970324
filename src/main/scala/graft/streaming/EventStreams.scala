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
          batch.foreach { e => n += 1; total += e.value }
          val next = UserState(n, total)
          state.update(next)
          UserUpdate(userId, n, total)
      }
  }
}
