package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = SkewJoin.saltedInnerJoin(li, o, Seq("l_orderkey"), 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain.select(salted.columns.map(col): _*)).count() == 0)
    assert(plain.select(salted.columns.map(col): _*).exceptAll(salted).count() == 0)
  }

  test("salt spreads a hot key over multiple buckets") {
    import spark.implicits._
    // one hot key with 10k distinct rows
    val hot = spark.range(10000).select(lit(1L).as("k"), col("id"))
    val salts = hot.select(SkewJoin.saltOf(Seq(col("k"), col("id")), 8).as("s"))
      .distinct().count()
    assert(salts == 8, s"hot key only landed on $salts of 8 buckets")
  }
}
