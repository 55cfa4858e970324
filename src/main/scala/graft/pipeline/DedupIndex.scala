package graft.pipeline

import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental dedup index — the on-disk realization of the
  * q90/q94 pattern. The corpus-side artifacts live as BUCKETED tables so
  * that batch after batch probes them with no shuffle on the index side
  * (the 100 TB invariant: incoming batches are small, the index is not):
  *
  *   - `<name>_keys`  (k)                      — exact md5 keys, bucketed by k
  *   - `<name>_bands` (doc_id, bkey)           — LSH band index, bucketed by bkey
  *   - `<name>_docs`  (doc_id, text, n)        — verify-side texts, bucketed by doc_id
  *
  * `bkey` folds (band, bandkey) into one long (`bandkey * 4 + band`,
  * injective for the 4-band family), so every probe is a single-column
  * equi-join that lines up with the bucket layout. A probe batch computes
  * its signatures row-level (codegen kernels), is exchanged ONCE per join
  * to match the index buckets, and never causes the index side to move.
  *
  * Lifecycle: [[DedupIndex.create]] → [[DedupIndex#dedupBatch]] →
  * [[DedupIndex#append]] (kept docs join the index; re-probing the same
  * batch then reports every doc as `exact_dup`). Mirrors the reference's
  * catalog-commit discipline: each append is one atomic-per-table parquet
  * append to bucketed tables, never a rewrite of existing index files.
  */
final class DedupIndex private (spark: SparkSession, name: String) {

  import DedupIndex._

  private def keys = spark.table(s"${name}_keys")
  private def bands = spark.table(s"${name}_bands")
  private def docs = spark.table(s"${name}_docs")

  /** q90 semantics against the persisted index: one verdict
    * (`exact_dup` / `near_dup` / `kept`) per batch doc.
    */
  def dedupBatch(batch: DataFrame): DataFrame = {
    val p = prepare(batch) // single consumer (the exact join) — no cache
    val exact = p
      .join(keys.withColumn("exact_hit", lit(true)), Seq("k"), "left_outer")
      .select(col("doc_id"), col("text"), col("sig"), col("n"),
        coalesce(col("exact_hit"), lit(false)).as("is_exact"))
      .cache()
    val probeBands = bandsOf(exact.filter(!col("is_exact") && size(col("sig")) > 0))
    val idxBands = PipelineQueries.capBuckets(
      bands, Seq("bkey"), PipelineQueries.MaxBandBucket)
    val cand = probeBands.as("nb")
      .join(idxBands.as("ob"), col("nb.bkey") === col("ob.bkey"))
      .select(col("nb.doc_id").as("new_id"), col("ob.doc_id").as("old_id"))
      .distinct()
    val nearIds = cand
      .join(exact.select(col("doc_id").as("new_id"), col("text").as("ta"),
        col("n").as("na")), "new_id")
      .join(docs.select(col("doc_id").as("old_id"), col("text").as("tb"),
        col("n").as("nb")), "old_id")
      .withColumn("common", TextOps.shingleCommonC(col("ta"), col("tb"), 3))
      .filter(col("common").cast("double") /
        (col("na") + col("nb") - col("common")) >= PipelineQueries.JaccardThreshold)
      .select(col("new_id").as("doc_id")).distinct()
    val verdicts = exact
      .join(nearIds.withColumn("near_hit", lit(true)), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("text"),
        when(col("is_exact"), lit("exact_dup"))
          .when(coalesce(col("near_hit"), lit(false)), lit("near_dup"))
          .otherwise(lit("kept")).as("verdict"))
      // eager, lineage-free result so the batch-scoped cache can be
      // RELEASED here: a service probing batch after batch must not
      // accumulate one CacheManager entry per call
      .localCheckpoint(true)
    exact.unpersist()
    verdicts
  }

  /** Admit the batch's KEPT docs into the index: parquet appends into the
    * three bucketed tables (the writer re-declares the bucket spec, which
    * must match the existing layout — co-location survives appends).
    */
  def append(verdicts: DataFrame): Unit = {
    val kept = prepare(
      verdicts.filter(col("verdict") === "kept").select(col("doc_id"), col("text")))
      .cache()
    kept.select(col("k")).distinct()
      .write.mode("append").bucketBy(NumBuckets, "k")
      .saveAsTable(s"${name}_keys")
    bandsOf(kept.filter(size(col("sig")) > 0))
      .write.mode("append").bucketBy(NumBuckets, "bkey")
      .saveAsTable(s"${name}_bands")
    kept.select(col("doc_id"), col("text"), col("n"))
      .write.mode("append").bucketBy(NumBuckets, "doc_id")
      .saveAsTable(s"${name}_docs")
    kept.unpersist()
  }

  /** The band-probe join in isolation — exposed so tests can assert the
    * plan shape (index side consumes its bucket layout, no exchange).
    */
  def probePlan(batch: DataFrame): DataFrame = {
    val probeBands = bandsOf(prepare(batch).filter(size(col("sig")) > 0))
    probeBands.as("nb")
      .join(bands.as("ob"), col("nb.bkey") === col("ob.bkey"))
      .select(col("nb.doc_id").as("new_id"), col("ob.doc_id").as("old_id"))
  }

  def drop(): Unit =
    Seq("keys", "bands", "docs").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
}

object DedupIndex {

  /** Bucket count — sized to the test corpus; at 100 TB this scales with
    * executor count (buckets are the unit of index-side parallelism).
    */
  val NumBuckets = 8

  /** (doc_id, text) → (doc_id, text, k, sig, n): the row-level kernel pass
    * shared by index build and batch probe.
    */
  private def prepare(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("text"),
      md5(col("text")).as("k"),
      TextOps.minhashSigC(col("text"), 3).as("sig"),
      TextOps.shingleCountC(col("text"), 3).as("n"))

  /** Banded signatures with the composite single-column key. */
  private def bandsOf(sigged: DataFrame): DataFrame =
    PipelineQueries.minhashBands(
      sigged.select(col("doc_id"), col("sig")))
      .select(col("doc_id"), (col("bandkey") * 4 + col("band")).as("bkey"))

  /** Build the three bucketed tables from the existing corpus. */
  def create(spark: SparkSession, name: String, dir: String,
      corpus: DataFrame): DedupIndex = {
    val p = prepare(corpus).cache()
    p.select(col("k")).distinct()
      .write.mode("overwrite").bucketBy(NumBuckets, "k")
      .option("path", s"$dir/${name}_keys").saveAsTable(s"${name}_keys")
    bandsOf(p.filter(size(col("sig")) > 0))
      .write.mode("overwrite").bucketBy(NumBuckets, "bkey")
      .option("path", s"$dir/${name}_bands").saveAsTable(s"${name}_bands")
    p.select(col("doc_id"), col("text"), col("n"))
      .write.mode("overwrite").bucketBy(NumBuckets, "doc_id")
      .option("path", s"$dir/${name}_docs").saveAsTable(s"${name}_docs")
    p.unpersist()
    new DedupIndex(spark, name)
  }

  /** Reopen previously created tables (e.g. a new session over the same
    * warehouse).
    */
  def open(spark: SparkSession, name: String): DedupIndex =
    new DedupIndex(spark, name)
}
