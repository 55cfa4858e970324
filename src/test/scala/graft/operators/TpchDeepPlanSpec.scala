package graft.operators

import graft.SparkSpec

/** Plan-shape guards for the round-8 TPC-H completions (Q2/Q7/Q8/Q9/Q11/
  * Q15/Q16/Q17/Q20/Q21 shapes): the fact-side joins must stay hash-based —
  * the ONLY nested-loop allowed is a broadcast of a 1-row scalar threshold
  * (q107 total, q108 max, q110 has none: its avg joins on partkey). q112's
  * EXISTS/NOT-EXISTS must compile to semi/anti hash joins on orderkey, not
  * a per-row subquery.
  */
class TpchDeepPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    TpchDeepQueries.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  private val oneRowBroadcastOk = Set("q107_tpch_q11", "q108_tpch_q15")

  test("no cartesian products anywhere in the deep TPC-H tier") {
    TpchDeepQueries.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name has a cartesian:\n$p")
    }
  }

  test("nested-loop joins appear only as 1-row scalar broadcasts") {
    TpchDeepQueries.queries.keys.foreach { name =>
      val p = plan(name)
      if (!oneRowBroadcastOk(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name fell back to nested-loop:\n$p")
    }
  }

  test("q112 quantifiers compile to hash semi/anti joins on orderkey") {
    val p = plan("q112_tpch_q21")
    assert(p.contains("LeftSemi"), s"missing semi join:\n$p")
    assert(p.contains("LeftAnti"), s"missing anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in q112:\n$p")
  }

  test("q103 keeps only each part's minimum-cost suppliers") {
    import org.apache.spark.sql.functions._
    val out = TpchDeepQueries.queries("q103_tpch_q2")(spark, sfDir)
    // every (part, cost) in the output must equal the part's min cost over
    // EUROPE suppliers (the region scopes the min, per TPC-H Q2) —
    // recompute independently from the raw tables
    val li = graft.Tables.lineitem(spark, sfDir)
    val eurSupp = graft.Tables.supplier(spark, sfDir)
      .join(graft.Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val mins = li.join(eurSupp, li("l_suppkey") === eurSupp("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("c"))
      .groupBy(col("l_partkey")).agg(min(col("c")).as("minc"))
    val bad = out.join(mins, out("p_partkey") === mins("l_partkey"))
      .filter(col("supplycost") > col("minc")).count()
    assert(bad == 0L)
  }
}
