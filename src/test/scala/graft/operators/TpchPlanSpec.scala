package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TpchPlanSpec extends SparkSpec {

  test("q97 disjunctive-predicate join stays hash-based (residual, not BNLJ)") {
    val plan = TpchQueries.queries("q97_tpch_q19")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q97 fell back to nested-loop:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q95 left-outer keeps customers with zero qualifying orders") {
    val out = TpchQueries.queries("q95_tpch_q13")(spark, sfDir)
    // the zero bucket must exist (some customer has only urgent orders or
    // none at all in the fixture) and the histogram must cover all customers
    val total = out.agg(sum(col("custdist"))).head().getLong(0)
    val customers = graft.Tables.customer(spark, sfDir).count()
    assert(total == customers)
  }

  test("q96 promo share is a valid percentage from one aggregate pass") {
    val row = TpchQueries.queries("q96_tpch_q14")(spark, sfDir).head()
    val pct = row.getAs[Double]("promo_pct")
    assert(pct >= 0.0 && pct <= 100.0)
    assert(row.getAs[Double]("promo_rev") <= row.getAs[Double]("total_rev"))
  }
}
