package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The declared streaming queries must agree with their batch twins — the
  * core Structured Streaming contract (same DataFrame program, incremental
  * execution) made into an executable assertion.
  */
class StreamQueriesSpec extends SparkSpec {

  private def rowsOf(name: String) =
    StreamQueries.queries(name)(spark, sfDir).collect()
      .map(_.toSeq.toList).toSet

  test("q68 streaming window agg equals the batch window agg") {
    val ev = graft.Tables.events(spark, sfDir)
    val batch = ev
      .select(graft.Tables.eventTime(col("ts"), ev.schema("ts").dataType).as("ts"),
        col("event_type"), col("value"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start_sec"),
        col("event_type"), col("n"), col("sum_value"))
      .collect().map(_.toSeq.toList).toSet
    val streamed = rowsOf("q68_stream_window")
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q69 streaming enrich equals the batch broadcast join rollup") {
    val dim = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val batch = graft.Tables.events(spark, sfDir)
      .join(broadcast(dim), Seq("user_id"), "left_outer")
      .select(coalesce(col("c_mktsegment"), lit("NONE")).as("segment"),
        col("event_type"), col("value"))
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .collect().map(_.toSeq.toList).toSet
    val streamed = rowsOf("q69_stream_enrich")
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q75 streaming dedup equals the batch distinct-key set") {
    val batch = graft.Tables.documents(spark, sfDir)
      .select(md5(lower(col("text"))).as("k"),
        graft.functions.TextOps.shingleCountC(lower(col("text")), 1).as("n_tokens"))
      .distinct()
      .collect().map(_.toSeq.toList).toSet
    val streamed = rowsOf("q75_stream_dedup")
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // genuinely deduplicating: exactly one row per content hash
    assert(streamed.map(_.head).size == streamed.size)
  }

  test("repeat runs get fresh sink names and identical results") {
    val a = rowsOf("q68_stream_window")
    val b = rowsOf("q68_stream_window")
    assert(a == b)
  }
}
