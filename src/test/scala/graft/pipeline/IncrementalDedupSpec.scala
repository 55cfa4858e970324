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

  test("q91: decode stub matches a driver-side recomputation on a sample") {
    val out = PipelineQueries.queries("q91_decode_stub")(spark, sfDir)
    val sample = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(32).collect()
      .map { r =>
        val p = r.getString(1).getBytes("UTF-8")
        val n = p.length.toLong
        def b(i: Int) = if (i < p.length) (p(i) & 0xff).toLong else 0L
        val sum = p.map(_ & 0xff).map(_.toLong).sum
        val stride = math.max(1L, n / 16L).toInt
        val sampled = p.indices.by(stride).map(i => (p(i) & 0xff).toLong).sum
        (r.getLong(0), (n, 16L + b(0) % 64, 16L + b(1) % 64, 1L + b(2) % 3,
          sum.toDouble / n, sampled))
      }.toMap
    val got = out.filter(col("doc_id").isin(sample.keys.toSeq: _*)).collect()
    assert(got.length == sample.size)
    got.foreach { r =>
      val (n, w, h, c, mean, samp) = sample(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bytes") == n)
      assert(r.getAs[Long]("width") == w)
      assert(r.getAs[Long]("height") == h)
      assert(r.getAs[Long]("channels") == c)
      assert(r.getAs[Double]("mean_byte") == mean)
      assert(r.getAs[Long]("sampled_sum") == samp)
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
