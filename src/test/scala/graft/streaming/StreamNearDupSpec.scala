package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamNearDupSpec extends SparkSpec {

  test("q94: streaming pair set equals the batch q90 near-dup pair universe") {
    // q94 emits verified (new, old) pairs; q90 reduces the same pair
    // universe to per-doc verdicts. Every q94 new_id must therefore be
    // verdict=near_dup in q90, and every q90 near_dup doc must emit >= 1
    // q94 pair (identical banding, caps, and threshold on both paths).
    val pairs = graft.pipeline.PipelineQueries
      .queries("q94_stream_neardup")(spark, sfDir).cache()
    val verdicts = graft.pipeline.PipelineQueries
      .queries("q90_incremental_dedup")(spark, sfDir).cache()
    val fromPairs = pairs.select(col("new_id").as("doc_id")).distinct()
    val nearDocs = verdicts.filter(col("verdict") === "near_dup")
      .select(col("doc_id"))
    assert(fromPairs.exceptAll(nearDocs).count() == 0)
    assert(nearDocs.exceptAll(fromPairs).count() == 0)
    pairs.unpersist(); verdicts.unpersist()
  }

  test("q94: pairs always cross the old/new boundary, never within a side") {
    val pairs = graft.pipeline.PipelineQueries
      .queries("q94_stream_neardup")(spark, sfDir)
    val isNew = (c: org.apache.spark.sql.Column) => c >= 100000 || c % 10 === 7
    assert(pairs.filter(!isNew(col("new_id")) || isNew(col("old_id"))).count() == 0)
    assert(pairs.filter(col("jaccard") < 0.6).count() == 0)
  }
}
