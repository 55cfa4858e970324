package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnQualitySpec extends SparkSpec {

  test("q101: int8 quantization keeps cosine within loose tolerance") {
    val out = PipelineQueries.queries("q101_quantized_cosine")(spark, sfDir).cache()
    assert(out.count() > 0)
    // int8 on unit-ish vectors: worst-case per-pair error stays tiny
    assert(out.agg(max(col("err"))).head().getDouble(0) < 0.05)
    assert(out.filter(col("cos_q") < -1.001 || col("cos_q") > 1.001).count() == 0)
    out.unpersist()
  }

  test("q102: recall is a fraction of 3 and nprobe=2 only adds candidates") {
    val out = PipelineQueries.queries("q102_ann_recall")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_hits") < 0 || col("n_hits") > 3).count() == 0)
    assert(out.filter(col("recall") =!= col("n_hits").cast("double") / 3.0).count() == 0)
    out.unpersist()
  }
}
