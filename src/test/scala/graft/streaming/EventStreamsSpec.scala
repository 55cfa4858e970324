package graft.streaming

import graft.SparkSpec
import graft.streaming.EventStreams._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def ev(id: Long, minute: Int, user: Long, typ: String, v: Double) =
    Event(id, ts(minute), user, typ, v)

  test("watermarked tumbling-window aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = windowedCounts(input.toDS(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    input.addData(
      ev(1, 1, 1, "click", 1.0), ev(2, 2, 1, "click", 2.0),
      ev(3, 12, 2, "view", 3.0), ev(4, 15, 2, "click", 4.0))
    q.processAllAvailable()
    val out = spark.table("win_counts").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      .toSet
    q.stop()
    assert(out == Set(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 10:10:00.0", "view", 1L, 3.0),
      ("2024-01-01 10:10:00.0", "click", 1L, 4.0)))
  }

  test("session windows merge events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = userSessions(input.toDS(), "5 minutes", "1 hour")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    // user 1: minutes 1,3,5 (one session), minute 30 (second session)
    input.addData(
      ev(1, 1, 1, "click", 1.0), ev(2, 3, 1, "click", 1.0),
      ev(3, 5, 1, "click", 1.0), ev(4, 30, 1, "click", 1.0))
    q.processAllAvailable()
    val out = spark.table("sessions").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
    q.stop()
    assert(out.toSeq.sorted == Seq((1L, 1L), (1L, 3L)))
  }

  test("stream-static join enriches events from a broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val users = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = enrich(input.toDS(), users)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    input.addData(ev(1, 1, 1, "click", 1.0), ev(2, 2, 3, "view", 2.0))
    q.processAllAvailable()
    val out = spark.table("enriched").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("tier"))).toSet
    q.stop()
    assert(out == Set((1L, "gold"), (2L, null)))
  }

  test("streaming dedup drops re-delivered event ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = dedupStream(input.toDS(), "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    input.addData(ev(1, 1, 1, "click", 1.0), ev(2, 2, 1, "view", 2.0),
      ev(1, 1, 1, "click", 1.0))
    q.processAllAvailable()
    input.addData(ev(2, 2, 1, "view", 2.0), ev(3, 3, 2, "click", 3.0))
    q.processAllAvailable()
    val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id")).sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("streaming near-dup finds cross-batch candidates; hot bucket stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val input = MemoryStream[DocEvent]
    val q = streamingNearDupCandidates(input.toDS(), maxHamming = 3, maxBucket = 5)
      .writeStream.format("memory").queryName("stream_neardup")
      .outputMode("append").start()
    // batch 1: one doc + an unrelated one
    input.addData(
      DocEvent(1L, ts(1), base),
      DocEvent(2L, ts(2), "completely different words about spark engines and parquet"))
    q.processAllAvailable()
    assert(spark.table("stream_neardup").count() == 0)
    // batch 2: a near-duplicate of doc 1 arrives LATER — found via state
    // (one appended token: hamming 1, shares a 16-bit band with doc 1)
    input.addData(DocEvent(3L, ts(3), base + " x"))
    q.processAllAvailable()
    val pairs = spark.table("stream_neardup").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 3L)), s"cross-batch near-dup not found: $pairs")
    // batch 3: a flood of identical docs into one bucket — admission stops
    // at maxBucket=5, so emission stays far below the quadratic count
    input.addData((100L to 140L).map(i => DocEvent(i, ts(4), base)): _*)
    q.processAllAvailable()
    val n = spark.table("stream_neardup").count()
    // uncapped, 41 identical docs alone would emit 2 bands × C(41,2) = 1640
    assert(n < 100, s"hot bucket not bounded: $n pairs emitted")
    // batch 4: RE-DELIVERY of doc 1 (at-least-once source) — already in
    // state, so it must emit nothing new and burn no cap slot
    input.addData(DocEvent(1L, ts(5), base))
    q.processAllAvailable()
    val n2 = spark.table("stream_neardup").count()
    q.stop()
    assert(n2 == n, s"re-delivered doc re-emitted pairs: $n -> $n2")
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("user_totals")
      .outputMode("update").start()
    input.addData(ev(1, 1, 7, "click", 1.5), ev(2, 2, 7, "view", 2.5))
    q.processAllAvailable()
    input.addData(ev(3, 3, 7, "click", 6.0))
    q.processAllAvailable()
    val updates = spark.table("user_totals").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value")))
    q.stop()
    // one update per batch touching the key; final state 3 events / 10.0
    assert(updates.contains((7L, 2L, 4.0)))
    assert(updates.contains((7L, 3L, 10.0)))
  }

  test("stream-stream interval join attributes purchases to in-window views") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = viewPurchaseAttribution(views.toDS(), purchases.toDS(),
        withinSeconds = 600L)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    // views at 10:01 (u1), 10:02 (u2); purchases at 10:05 (u1, in window),
    // 10:20 (u2, OUTSIDE the 10-minute window), 10:06 (u3, no view)
    views.addData(ev(1, 1, 1, "view", 0.0), ev(2, 2, 2, "view", 0.0))
    purchases.addData(ev(10, 5, 1, "purchase", 9.99),
      ev(11, 20, 2, "purchase", 5.0), ev(12, 6, 3, "purchase", 1.0))
    q.processAllAvailable()
    val out = spark.table("attrib").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("view_id"),
        r.getAs[Long]("purchase_id"), r.getAs[Double]("purchase_value")))
      .toSet
    q.stop()
    assert(out == Set((1L, 1L, 10L, 9.99)))
  }

  test("streaming pipeline writes an exactly-once parquet sink with checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink_").toString
    val input = MemoryStream[Event]
    val q = dedupStream(input.toDS())
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    input.addData(ev(1, 1, 1, "click", 1.0), ev(2, 2, 1, "view", 2.0))
    q.processAllAvailable()
    // re-delivery of event 1 must be dropped by the watermarked dedup
    input.addData(ev(1, 1, 1, "click", 1.0), ev(3, 3, 2, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 3)
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }
}
