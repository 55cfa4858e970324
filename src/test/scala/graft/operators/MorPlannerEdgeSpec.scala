package graft.operators

import graft.SparkSpec
import graft.operators.MorPlanner._
import org.apache.spark.sql.functions.col

/** MorPlanner edge cases from the round-15 review: dotted column names
  * must survive the alias-qualified join references (un-backticked
  * `col("a.b")` parses as struct-field access), and a key-less
  * equality-delete group must fail with a NAMED error on the row path —
  * the same shape the vectorized mask refuses — instead of an unnamed
  * reduce() crash (or, worse, matching every older row).
  */
class MorPlannerEdgeSpec extends SparkSpec {

  import spark.implicits._

  test("dotted column names survive merge and equality-delete joins") {
    val data = Seq((1L, "keep"), (2L, "doomed"), (3L, "keep2"))
      .toDF("user.id", "v")
      .withColumn(SeqNumCol, org.apache.spark.sql.functions.lit(1L))
      .withColumn(FilePathCol, org.apache.spark.sql.functions.lit("f"))
      .withColumn(PosCol, org.apache.spark.sql.functions.monotonically_increasing_id())
    val del = Seq(2L).toDF("user.id")
      .withColumn(SeqNumCol, org.apache.spark.sql.functions.lit(5L))
    val out = merge(data, None, Seq(EqualityDeleteGroup(del, Seq("user.id"))))
    assert(out.columns.toSeq == Seq("user.id", "v"))
    assert(out.select(col("`user.id`")).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L))
  }

  test("a key-less equality-delete group fails loudly, never matches all rows") {
    val data = Seq((1L, "a")).toDF("k", "v")
      .withColumn(SeqNumCol, org.apache.spark.sql.functions.lit(1L))
    val del = Seq((9L)).toDF("k")
      .withColumn(SeqNumCol, org.apache.spark.sql.functions.lit(5L))
    val e = intercept[IllegalArgumentException](
      applyEqualityDeletes(data, EqualityDeleteGroup(del, Nil)))
    assert(e.getMessage.contains("no equality columns"))
  }
}
