package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {

  test("q90: planted perturbed additions are flagged near_dup at LSH recall") {
    val out = PipelineQueries.queries("q90_incremental_dedup")(spark, sfDir).cache()
    // additions (doc_id >= 100000) are 3-token tails on old docs -> near
    // dups; banded LSH recall is < 1.0 by design (a very short base doc can
    // have every band's minhash perturbed by the tail), so bound, not equal
    val additions = out.filter(col("doc_id") >= 100000)
    val n = additions.count()
    assert(n > 0)
    val found = additions.filter(col("verdict") === "near_dup").count()
    assert(found >= (n * 8) / 10, s"LSH recall too low: $found/$n")
    // verdicts cover exactly the new batch, one row per doc
    assert(out.groupBy(col("doc_id")).count().filter(col("count") > 1).count() == 0)
    out.unpersist()
  }

  test("q90: old corpus docs never appear in the output") {
    val out = PipelineQueries.queries("q90_incremental_dedup")(spark, sfDir)
    assert(out.filter(col("doc_id") < 100000 && col("doc_id") % 10 =!= 7).count() == 0)
  }

  test("q91: header decode matches a driver-side recomputation on a sample") {
    val out = PipelineQueries.queries("q91_header_decode")(spark, sfDir)
    val sample = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(32).collect()
      .map { r =>
        val id = r.getLong(0)
        val n = r.getString(1).getBytes("UTF-8").length.toLong
        val headerLen = if (id % 2 == 0) 33L else 43L + id % 16
        val channels =
          if (id % 2 == 1) 3L
          else Seq(1L, 3L, 4L)((id % 3).toInt)
        (id, (n + headerLen, 16L + id % 509, 16L + (id * 7) % 509, channels))
      }.toMap
    val got = out.filter(col("doc_id").isin(sample.keys.toSeq: _*)).collect()
    assert(got.length == sample.size)
    got.foreach { r =>
      val (n, w, h, c) = sample(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bytes") == n)
      assert(r.getAs[Long]("width") == w)
      assert(r.getAs[Long]("height") == h)
      assert(r.getAs[Long]("channels") == c)
      assert(r.getAs[String]("mime") ==
        (if (r.getAs[Long]("doc_id") % 2 == 0) "image/png" else "image/jpeg"))
      assert(r.getAs[Long]("bit_depth") == 8L)
    }
  }

  test("q92: estimate agrees with exact jaccard within sketch tolerance on average") {
    val out = PipelineQueries.queries("q92_sketch_accuracy")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("est_jaccard") < 0 || col("est_jaccard") > 1).count() == 0)
    val meanErr = out.agg(avg(col("err"))).head().getDouble(0)
    assert(meanErr < 0.2, s"mean |est - exact| = $meanErr")
    out.unpersist()
  }
}
