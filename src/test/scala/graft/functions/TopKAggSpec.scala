package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TopKByScore]] — the bounded top-k aggregate behind q42's ranking:
  * result parity with the window formulation, tie-break order, k-bounding
  * in the PARTIAL aggregate (the scale property), and plan shape.
  */
class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  test("matches row_number window results including ties, best first") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.7), ("a", 3L, 0.9), ("a", 4L, 0.1),
      ("b", 5L, 0.5), ("b", 6L, 0.5), ("b", 7L, 0.5)
    ).toDF("g", "id", "score").repartition(4)
    val got = df.groupBy($"g")
      .agg(TopKByScore.topK($"score", $"id", 2).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", $"t.id".as("id"), $"pos", $"t.score".as("score"))
      .orderBy($"g", $"pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // ties break by id ASC, exactly like ORDER BY score DESC, id ASC
    assert(got.toSeq == Seq(
      ("a", 1L, 0), ("a", 3L, 1),
      ("b", 5L, 0), ("b", 6L, 1)))
  }

  test("k larger than the group returns the whole group, ordered") {
    val df = Seq((1L, 0.2), (2L, 0.8)).toDF("id", "score")
    val got = df.agg(TopKByScore.topK($"score", $"id", 10).as("top"))
      .select(explode($"top.id"))
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 1L))
  }

  test("partial aggregation bounds the exchange: plan has two agg stages, no window") {
    val df = spark.range(0, 10000).select(
      (col("id") % 7).as("g"), col("id"),
      (col("id") % 997).cast("double").as("score"))
    val agg = df.groupBy($"g").agg(TopKByScore.topK($"score", $"id", 5).as("top"))
    val plan = agg.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial_ mode instance BEFORE the exchange — the map-side bound
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_top_k_by_score"), plan)
    assert(!plan.contains("Window"), plan)
    // and the result is still exact
    val top = agg.filter($"g" === 0).select(explode($"top.id")).as[Long]
      .collect().toSeq
    // g=0: ids ≡ 0 (mod 7); best scores = highest id % 997 among them
    val expect = (0L until 10000L).filter(_ % 7 == 0)
      .sortBy(i => (-(i % 997).toDouble, i)).take(5)
    assert(top == expect)
  }
}
