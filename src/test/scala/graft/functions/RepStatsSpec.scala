package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

class RepStatsSpec extends SparkSpec {

  private def stats(s: String): Seq[Long] =
    TextOps.repStats(UTF8String.fromString(s)).toArray[Long](LongType).toSeq

  test("repStats counters on hand-checked inputs") {
    // layout: [total_words, distinct_words, top_word_count, total_2grams, distinct_2grams]
    assert(stats("a b a b a") == Seq(5, 2, 3, 4, 2)) // 2-grams: "a b"×2, "b a"×2
    assert(stats("a b c d") == Seq(4, 4, 1, 3, 3))
    assert(stats("a a a a") == Seq(4, 1, 4, 3, 1))
    assert(stats("x") == Seq(1, 1, 1, 0, 0))
    // empty string splits to one empty token (split(" ", -1) contract)
    assert(stats("") == Seq(1, 1, 1, 0, 0))
    // double space yields an empty middle token that counts like any other
    assert(stats("a  a") == Seq(3, 2, 2, 2, 2))
  }

  test("repStats column kernel matches a DataFrame reformulation") {
    import spark.implicits._
    val df = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), lower(col("text")).as("t"))
    val kernel = df.select(col("doc_id"),
      TextOps.repStatsC(col("t")).as("r"))
    val toks = df.select(col("doc_id"), split(col("t"), " ").as("w"))
    val grams = toks.select(col("doc_id"), col("w"),
      expr("transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))").as("bg"))
    val ref = grams.select(col("doc_id"),
      size(col("w")).cast("long").as("tw"),
      size(array_distinct(col("w"))).cast("long").as("dw"),
      expr("CAST(array_max(transform(array_distinct(w), x -> size(filter(w, y -> y = x)))) AS LONG)").as("topc"),
      size(col("bg")).cast("long").as("t2"),
      size(array_distinct(col("bg"))).cast("long").as("d2"))
    val joined = kernel.join(ref, "doc_id")
      .filter(
        element_at(col("r"), 1) =!= col("tw") ||
        element_at(col("r"), 2) =!= col("dw") ||
        element_at(col("r"), 3) =!= col("topc") ||
        element_at(col("r"), 4) =!= col("t2") ||
        element_at(col("r"), 5) =!= col("d2"))
    assert(joined.count() == 0)
  }

  test("q89 keep flag is consistent with its fractions") {
    val out = graft.pipeline.PipelineQueries.queries("q89_repetition")(spark, sfDir)
    val bad = out.filter(
      col("keep") =!= (col("top_word_frac") <= 0.09 && col("dup_2gram_frac") <= 0.12))
    assert(bad.count() == 0)
    assert(out.count() > 0)
  }

  test("q88 per-source accounting is internally consistent") {
    val out = graft.pipeline.PipelineQueries.queries("q88_domain_mix")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs"); val nKept = r.getAs[Long]("n_kept")
      val rate = r.getAs[Long]("rate_permille")
      assert(nKept >= 0 && nKept <= nDocs)
      assert(rate >= 1 && rate <= 1000)
      assert(r.getAs[Long]("kept_chars") <= r.getAs[Long]("src_chars"))
    }
  }
}
