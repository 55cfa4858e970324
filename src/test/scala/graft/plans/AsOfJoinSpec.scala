package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom as-of join operator: semantics vs the window-rewrite
  * reference, the null (no-match) path, and the physical plan shape
  * (AsOfJoinExec, one exchange + one sort per side, right side never
  * unioned into the left).
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("asof matches the window-rewrite reference on a synthetic fixture") {
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 7L, "d"), (3L, 100L, "e"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 1L, "r1"),
      (2L, 8L, "r8"), (4L, 1L, "rx"))
      .toDF("rk", "rt", "rv")
    val viaOp = AsOfJoin.asof(left, right,
        left("k"), left("t"), right("rk"), right("rt"))
      .select($"k", $"t", $"tag", $"rt", $"rv")
    // reference: union-window rewrite (the q17 shape)
    val l = left.select($"k", $"t", $"tag", lit(null).cast("long").as("rt"),
      lit(null).cast("string").as("rv"), lit(1).as("isL"))
    val r = right.select($"rk".as("k"), $"rt".as("t"), lit(null).cast("string").as("tag"),
      $"rt", $"rv", lit(0).as("isL"))
    val w = Window.partitionBy($"k").orderBy($"t", $"isL")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = l.unionAll(r)
      .withColumn("mrt", last($"rt", ignoreNulls = true).over(w))
      .withColumn("mrv", last($"rv", ignoreNulls = true).over(w))
      .filter($"isL" === 1)
      .select($"k", $"t", $"tag", $"mrt".as("rt"), $"mrv".as("rv"))
    assert(sortedRows(viaOp) == sortedRows(viaWindow))
    // spot-check semantics incl. the null path: k=3 has no right rows;
    // k=1/t=10 takes the EQUAL-time right row (on <= t is inclusive)
    val m = viaOp.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      Option(r.get(4)).map(_.toString)).toMap
    assert(m((1L, 5L)) == Some("r1"))
    assert(m((1L, 10L)) == Some("r10"))
    assert(m((1L, 20L)) == Some("r15"))
    assert(m((2L, 7L)) == None)
    assert(m((3L, 100L)) == None)
  }

  test("asof accepts timestamp on-keys (micros ordering) and rejects mixed domains") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag")
      .select($"k", timestamp_micros($"t").as("t"), $"tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 1L, "r1"), (2L, 8L, "r8"))
      .toDF("rk", "rt", "rv")
      .select($"rk", timestamp_micros($"rt").as("rt"), $"rv")
    val viaTs = AsOfJoin.asof(left, right,
      left("k"), left("t"), right("rk"), right("rt"))
    // output = left(k, t, tag) ++ right(rk, rt, rv); match by tag
    val byTag = viaTs.collect().map(r => r.getString(2) ->
      Option(r.get(5)).map(_.toString)).toMap
    assert(byTag("c") == Some("r1"))
    assert(byTag("a") == Some("r10"))
    assert(byTag("b") == Some("r15"))
    assert(byTag("d") == None)
    // mixed long/timestamp on-domains would silently compare different
    // units — rejected at analysis
    val longRight = Seq((1L, 10L, "r10")).toDF("rk", "rt", "rv")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, longRight,
        left("k"), left("t"), longRight("rk"), longRight("rt"))
    }
    assert(ex.getMessage.contains("domain"))
    // TIMESTAMP vs TIMESTAMP_NTZ mixes instant micros with wall-clock
    // micros (zone-shifted under any non-UTC session) — also rejected
    val ntzRight = Seq((1L, 10L, "r10")).toDF("rk", "rt", "rv")
      .select($"rk", timestamp_micros($"rt").cast("timestamp_ntz").as("rt"), $"rv")
    val ex2 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, ntzRight,
        left("k"), left("t"), ntzRight("rk"), ntzRight("rt"))
    }
    assert(ex2.getMessage.contains("domain"))
  }

  test("plan is AsOfJoinExec with one exchange and one sort per side") {
    val ev = graft.Tables.eventsNanos(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts").as("tsn"))
    val ord = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("byk"),
        (col("o_orderdate").cast("timestamp").cast("long") * lit(1000000000L)).as("on_ns"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
    val joined = AsOfJoin.asof(ev, ord,
      ev("user_id"), ev("tsn"), ord("byk"), ord("on_ns"))
    joined.collect() // force AQE to finalize
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // nodeName strips the Exec suffix
    // left side: scan -> exchange -> sort -> asof. No union of the sides,
    // no window operator anywhere.
    assert(!plan.contains("Union"), plan)
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window ("), plan)
  }

  test("asof agrees with DuckDB semantics on events x orders at sf0.001") {
    val ev = graft.Tables.eventsNanos(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts").as("tsn"))
    val ord = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("byk"),
        (col("o_orderdate").cast("timestamp").cast("long") * lit(1000000000L)).as("on_ns"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
    val viaOp = AsOfJoin.asof(ev, ord,
        ev("user_id"), ev("tsn"), ord("byk"), ord("on_ns"))
      .select(col("user_id"), col("event_id"), col("last_orderkey"))
    // reference: max orderdate <= tsn per event via a plain join + agg
    // (orders grain is unique per (custkey, date))
    val ref = ev.join(ord, ev("user_id") === ord("byk") &&
        ord("on_ns") <= ev("tsn"), "left_outer")
      .groupBy(col("user_id"), col("event_id"))
      .agg(max(struct(col("on_ns"), col("last_orderkey"))).as("m"))
      .select(col("user_id"), col("event_id"), col("m.last_orderkey"))
    assert(sortedRows(viaOp) == sortedRows(ref))
  }
}
