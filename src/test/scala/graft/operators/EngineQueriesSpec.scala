package graft.operators

import graft.SparkSpec
import graft.functions.ScalarQueries

class EngineQueriesSpec extends SparkSpec {

  private val all =
    JoinQueries.queries ++ AggQueries.queries ++ ScalarQueries.queries ++
      MiscQueries.queries ++ TpchQueries.queries

  test("every engine-surface query runs and returns rows at sf0.001") {
    all.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("equi-key joins never fall back to nested loop (scale guard)") {
    // q16 is pure-theta and legitimately BNLJ over a broadcast dim; all
    // other joins carry equi keys and must plan hash-based.
    (JoinQueries.queries - "q16_join_theta").foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name fell back to nested-loop:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$name planned a cartesian product")
    }
  }

  test("q16 theta join broadcasts the dimension side") {
    val plan = JoinQueries.queries("q16_join_theta")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"theta join should broadcast the 25-row nation side:\n$plan")
  }

  test("top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = AggQueries.queries("q24_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("declared queries and oracles line up") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
  }
}
