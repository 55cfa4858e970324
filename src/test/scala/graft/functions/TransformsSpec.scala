package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class TransformsSpec extends SparkSpec {

  import IcebergTransforms._

  private def one(colv: org.apache.spark.sql.Column): Any =
    spark.range(1).select(colv.as("v")).head.get(0)

  test("year/month/day/hour transforms on a known timestamp") {
    val ts = to_timestamp(lit("2017-11-16 22:31:08"))
    assert(one(yearsT(ts)) == 47)
    assert(one(monthsT(ts)) == 47 * 12 + 10)
    assert(one(daysT(ts)) == 17486)
    assert(one(hoursT(ts)) == 17486 * 24 + 22)
  }

  test("bucket expression matches direct murmur3 across types (interpreted + codegen)") {
    assert(one(bucketT(16, lit(34L))) == IcebergMurmur3.bucketLong(34L, 16))
    assert(one(bucketT(16, lit(34))) == IcebergMurmur3.bucketLong(34L, 16))
    assert(one(bucketT(16, lit("iceberg"))) == (1210000089 & Int.MaxValue) % 16)
    assert(one(bucketT(4, to_date(lit("2017-11-16")))) ==
      (IcebergMurmur3.hashLong(17486L) & Int.MaxValue) % 4)
    assert(one(bucketT(128, to_timestamp(lit("2017-11-16 22:31:08")))) ==
      (IcebergMurmur3.hashLong(1510871468000000L) & Int.MaxValue) % 128)
    assert(one(bucketT(64, lit(BigDecimal("14.20")).cast("decimal(9,2)"))) ==
      ((-500754589) & Int.MaxValue) % 64)
  }

  test("bucket of null is null; truncate handles negatives like iceberg") {
    assert(one(bucketT(16, lit(null).cast("long"))) == null)
    // iceberg truncate: floor to width, also for negatives: -1 w=10 -> -10
    assert(one(truncateT(10, lit(-1L), isString = false)) == -10L)
    assert(one(truncateT(10, lit(11L), isString = false)) == 10L)
    assert(one(truncateT(3, lit("iceberg"), isString = true)) == "ice")
  }

  test("bucket stays inside whole-stage codegen on a real scan") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(bucketT(16, col("l_orderkey")).as("b"))
    // `*(n)` prefix = inside WholeStageCodegen stage n; a codegen-fallback
    // expression would strip the star from the Project
    val plan = li.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("), s"no codegen span:\n$plan")
    assert(li.agg(min("b"), max("b")).head.toSeq.forall {
      case i: Int => i >= 0 && i < 16
    })
  }
}
