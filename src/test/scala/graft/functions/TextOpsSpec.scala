package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TextOpsSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  test("portableHash matches the SQL definition's golden value") {
    // golden derived independently in DuckDB:
    // CAST(translate(substr(md5('hello world foo'),1,12),'abcdef','123456') AS BIGINT)
    assert(TextOps.portableHash(u("hello world foo")) == 759152554317L)
  }

  test("shingles split on single spaces keeping empties, n-gram edges") {
    def sh(s: String) = TextOps.shingles(u(s), 3).toArray[UTF8String](
      org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(sh("a b c d") == Seq("a b c", "b c d"))
    assert(sh("a b c") == Seq("a b c"))
    assert(sh("a b") == Seq.empty)
    assert(sh("") == Seq.empty)
    // double space produces an empty token, like split(' ', -1) in both engines
    assert(sh("a  b c") == Seq("a  b", " b c"))
  }

  test("fingerprint is the ordered fold; simhash bounded and set-stable") {
    val h1 = TextOps.portableHash(u("x"))
    val h2 = TextOps.portableHash(u("y"))
    val expected = ((h1 % 1000000007L) * 131L + h2) % 1000000007L
    assert(TextOps.fingerprint(u("x y")) == expected)
    val s = TextOps.simhash16(u("a b c a b"))
    assert(s >= 0 && s < (1 << 16))
    // distinct-token semantics: duplicates don't change the simhash
    assert(s == TextOps.simhash16(u("a b c")))
  }

  test("binaryChecksum matches the SQL char-code formula on ascii input") {
    val bytes = "abc".getBytes("UTF-8")
    val expected = (97L * 2 + 98L * 3 + 99L * 4) % 1000000007L
    assert(TextOps.binaryChecksum(bytes) == expected)
  }

  test("wordShingles column explodes to the same set the row-level kernels summarize") {
    import spark.implicits._
    val df = graft.Tables.documents(spark, sfDir).limit(16)
      .select(col("doc_id"), lower(col("text")).as("t"))
    val exploded = df
      .select(col("doc_id"), explode(TextOps.wordShingles(col("t"), 3)).as("s"))
      .distinct().groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernel = df.select(col("doc_id"), TextOps.shingleCountC(col("t"), 3).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs with <3 tokens produce no exploded rows and kernel count 0
    assert(kernel.filter(_._2 > 0) == exploded)
  }

  test("shingleHashesSorted is the sorted distinct hash set; sortedLongCommon the intersection") {
    import spark.implicits._
    val df = graft.Tables.documents(spark, sfDir).limit(16)
      .select(col("doc_id"), lower(col("text")).as("t"))
    val viaKernel = df
      .select(col("doc_id"), TextOps.shingleHashesC(col("t"), 3).as("dh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaExplode = df
      .select(col("doc_id"), explode(TextOps.wordShingles(col("t"), 3)).as("s"))
      .select(col("doc_id"), TextOps.portableHashC(col("s")).as("h"))
      .distinct().collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted.toSeq }
    assert(viaKernel.filter(_._2.nonEmpty) == viaExplode)
    viaKernel.values.foreach(a => assert(a == a.sorted && a.distinct == a))
    // merge-scan intersection equals set intersection, on every doc pair
    val docs = viaKernel.toSeq.sortBy(_._1).take(8)
    for ((ida, sa) <- docs; (idb, sb) <- docs) {
      val expected = sa.toSet.intersect(sb.toSet).size.toLong
      val got = df.filter(col("doc_id") === ida)
        .crossJoin(df.filter(col("doc_id") === idb)
          .select(col("t").as("t2")))
        .select(TextOps.sortedCommonC(
          TextOps.shingleHashesC(col("t"), 3),
          TextOps.shingleHashesC(col("t2"), 3)))
        .collect().head.getLong(0)
      assert(got == expected, s"pair ($ida, $idb)")
    }
  }

  test("codegen and interpreted paths agree for all kernels") {
    import spark.implicits._
    // parquet-backed input: a local relation would be constant-folded on
    // the driver via the interpreted path, bypassing codegen entirely
    val df = graft.Tables.documents(spark, sfDir).limit(16)
      .select(col("text").as("t"))
    val cols = Seq(
      TextOps.portableHashC(col("t")).as("h"),
      TextOps.fingerprintC(col("t")).as("fp"),
      TextOps.simhash16C(col("t")).as("sh"),
      TextOps.binaryChecksumC(col("t").cast("binary")).as("ck"))
    val viaCodegen = df.select(cols: _*).collect().toSeq
    // interpreted path: evaluate the same expressions row-by-row via eval
    val exprs = Seq[UTF8String => Long](
      TextOps.portableHash, TextOps.fingerprint, TextOps.simhash16,
      s => TextOps.binaryChecksum(s.getBytes))
    val viaInterp = df.collect().toSeq.map { r =>
      val s = u(r.getString(0)); exprs.map(_(s))
    }
    assert(viaCodegen.map(_.toSeq) == viaInterp)
    // whole-stage codegen actually engages for the kernel projection
    // (the "*(n)" stage marker on the Project node)
    val plan = df.select(cols: _*).queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") ||
      plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")), plan)
  }

  test("voidT yields typed nulls (not NullType)") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("i", "s")
      .select(IcebergTransforms.voidT(col("i")).as("vi"),
        IcebergTransforms.voidT(col("s")).as("vs"))
    assert(df.schema("vi").dataType == org.apache.spark.sql.types.IntegerType)
    assert(df.schema("vs").dataType == org.apache.spark.sql.types.StringType)
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
