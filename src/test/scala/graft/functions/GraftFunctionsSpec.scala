package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class GraftFunctionsSpec extends SparkSpec {

  private lazy val registered = { GraftFunctions.registerAll(spark); true }

  test("kernels are callable from pure SQL and match the kernel values") {
    assert(registered)
    val row = spark.sql(
      """SELECT graft_portable_hash('hello world foo') AS h,
        |       graft_simhash32('a b c') AS s32,
        |       graft_fingerprint('x y') AS fp,
        |       graft_shingle_count('a b c d', 3) AS sc,
        |       graft_minhash_sig('a b c d', 3) AS sig,
        |       graft_rep_stats('a b a') AS rep,
        |       graft_iceberg_bucket(CAST(34 AS INT), 16) AS b
        |""".stripMargin).head()
    assert(row.getAs[Long]("h") == TextOps.portableHash(UTF8String.fromString("hello world foo")))
    assert(row.getAs[Long]("s32") == TextOps.simhash32(UTF8String.fromString("a b c")))
    assert(row.getAs[Long]("fp") == TextOps.fingerprint(UTF8String.fromString("x y")))
    assert(row.getAs[Long]("sc") == 2L)
    assert(row.getSeq[Long](row.fieldIndex("sig")).length == 12)
    assert(row.getSeq[Long](row.fieldIndex("rep")).toList == List(3L, 2L, 2L, 2L, 2L))
    // Iceberg spec vector: bucket[16](34 as int) = murmur3(long bytes) mod 16
    val viaColumn = graft.Tables.documents(spark, sfDir).limit(1)
      .select(IcebergTransforms.bucketT(16, lit(34))).head().getInt(0)
    assert(row.getAs[Int]("b") == viaColumn)
  }

  test("SQL-named kernels run a full query over a table") {
    assert(registered)
    graft.Tables.documents(spark, sfDir).createOrReplaceTempView("docs_sqlfn")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash32(lower(text)) AS sh
        |FROM docs_sqlfn ORDER BY doc_id""".stripMargin).collect()
    val viaCol = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.simhash32C(lower(col("text"))).as("sh"))
      .orderBy(col("doc_id")).collect()
    assert(viaSql.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      viaCol.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("arity and literal-arg validation fail loudly") {
    assert(registered)
    val e1 = intercept[Exception](spark.sql("SELECT graft_simhash32('a', 'b')").head())
    assert(e1.getMessage.contains("expects 1 arguments") ||
      e1.getMessage.contains("graft_simhash32"))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_minhash_sig('a b c', 'not-int')").head())
    assert(e2.getMessage.contains("integer literal") ||
      e2.getMessage.contains("graft_minhash_sig"))
  }

  test("a session built withExtensions gets the functions without registerAll") {
    import org.apache.spark.sql.SparkSession
    // force the builder to construct a FRESH session (new sessionState, so
    // only the extensions provide the functions) over the SHARED context —
    // never stop it, the suite-wide session owns it
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark) // genuinely a different session (state)
      val v = s2.sql("SELECT graft_portable_hash('abc') AS h").head().getLong(0)
      assert(v == TextOps.portableHash(UTF8String.fromString("abc")))
    } finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
