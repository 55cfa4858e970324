package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmeansStepSpec extends SparkSpec {

  test("q93: one row per (centroid, dim); members partition the corpus") {
    val out = PipelineQueries.queries("q93_kmeans_step")(spark, sfDir).cache()
    val dims = graft.Tables.embeddings(spark, sfDir)
      .select(size(col("embedding"))).head().getInt(0)
    assert(out.count() == 4L * dims)
    // every dim of one centroid sees the same member count
    assert(out.groupBy(col("cid"))
      .agg(countDistinct(col("n_members")).as("c"))
      .filter(col("c") =!= 1).count() == 0)
    // the member counts across centroids sum to the corpus size
    val total = out.filter(col("pos") === 0)
      .agg(sum(col("n_members"))).head().getLong(0)
    assert(total == graft.Tables.embeddings(spark, sfDir).count())
    out.unpersist()
  }

  test("q93: refined centroids stay inside the members' value range") {
    val out = PipelineQueries.queries("q93_kmeans_step")(spark, sfDir)
    // embeddings are bounded floats; the mean must be too (loose sanity)
    val bad = out.filter(abs(col("centroid_val")) > 100.0)
    assert(bad.count() == 0)
    assert(out.filter(col("shift") < 0).count() == 0)
  }
}
