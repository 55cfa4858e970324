package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MorSpec extends SparkSpec {

  import MorFixtures._
  import MorPlanner._

  test("data table carries hidden cols; seq constant per file; pos dense per file") {
    val data = dataTable(spark, sfDir).cache()
    assert(data.columns.toSet.intersect(HiddenCols.toSet) == HiddenCols.toSet)
    // seq_num constant per file
    val seqPerFile = data.groupBy(FilePathCol)
      .agg(countDistinct(SeqNumCol).as("n")).filter(col("n") =!= 1).count()
    assert(seqPerFile == 0)
    // positions are 0..count-1 per file (dense, unique)
    val bad = data.groupBy(FilePathCol)
      .agg(min(PosCol).as("mn"), max(PosCol).as("mx"),
        countDistinct(PosCol).as("nd"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 || col("nd") =!= col("n"))
      .count()
    assert(bad == 0)
    data.unpersist()
  }

  test("position-delete anti join removes exactly the deleted (file,pos) pairs") {
    val data = dataTable(spark, sfDir)
    val pd = positionDeletes(data)
    val survivors = applyPositionDeletes(data, pd)
    assert(survivors.count() == data.count() - pd.count())
    // no survivor matches a delete key
    assert(survivors.join(pd, Seq(FilePathCol, PosCol), "left_semi").count() == 0)
  }

  test("equality-delete respects the seq_num < guard") {
    val data = dataTable(spark, sfDir)
    val g = eqDeleteGroup1(spark, sfDir)
    val survivors = applyEqualityDeletes(data, g)
    // Independent expected-survivor computation (NOT EXISTS with the seq
    // condition). The delete decision is a pure function of
    // (l_orderkey, l_linenumber, seq) — work at key granularity to stay
    // deterministic (the synthetic lineitem has duplicate key pairs).
    val del = g.df
    val keyCols = Seq("l_orderkey", "l_linenumber", SeqNumCol)
    val dataKeys = data.select(keyCols.map(col): _*).distinct()
    val deletableKeys = dataKeys.join(del,
      dataKeys("l_orderkey") === del("l_orderkey") &&
        dataKeys("l_linenumber") === del("l_linenumber") &&
        dataKeys(SeqNumCol) < del(SeqNumCol), "left_semi")
    val shouldDeleteRows = data.join(deletableKeys, keyCols, "left_semi")
    assert(survivors.count() == data.count() - shouldDeleteRows.count())
    // No survivor carries a deletable key.
    assert(survivors.join(deletableKeys, keyCols, "left_semi").count() == 0)
    // Keys equal on the delete columns whose seq is NOT older than any
    // matching delete must all survive — the set a dropped guard would kill.
    val equalKeys = dataKeys.join(del.select("l_orderkey", "l_linenumber"),
      Seq("l_orderkey", "l_linenumber"), "left_semi")
    val equalButNotOlder = equalKeys.except(deletableKeys)
    assert(equalButNotOlder.count() > 0) // fixture exercises both sides of the guard
    assert(equalButNotOlder.join(survivors, keyCols, "left_anti").count() == 0)
  }

  test("full merge drops hidden columns and only them") {
    val out = MorQueries.queries("q3_mor_full")(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    assert(out.columns.toSeq == li.columns.toSeq)
    assert(out.count() > 0 && out.count() < li.count())
  }

  test("merge with no deletes is identity on user columns") {
    val data = dataTable(spark, sfDir)
    val out = merge(data, None, Nil)
    assert(out.count() == data.count())
    assert(!out.columns.exists(HiddenCols.contains))
  }

  test("anti joins plan as hash joins, not nested loop (scale guard)") {
    val data = dataTable(spark, sfDir)
    val plan = merge(data, Some(positionDeletes(data)),
      Seq(eqDeleteGroup1(spark, sfDir), eqDeleteGroup2(spark, sfDir)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"MoR merge fell back to nested-loop join:\n$plan")
  }
}
