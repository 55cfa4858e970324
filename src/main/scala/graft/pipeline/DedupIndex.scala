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
    *
    * There is no cross-table transaction, so the append order is chosen to
    * FAIL SAFE where ordering can: `_docs` first, `_bands` second, `_keys`
    * last. A crash between `_bands` and `_keys` leaves docs+bands rows
    * whose key rows are missing — a replay of the same batch classifies
    * `near_dup` (bands+docs present; identical text maximizes the verify
    * overlap), so duplicates stay suppressed. The reverse (keys-first)
    * order would be strictly worse: keys without doc/band backing silently
    * DROP near-dup verdicts for every later batch, and `_docs` is the
    * source [[compactIndex]] rebuilds from — keys without docs are
    * unreclaimable.
    *
    * The ordering canNOT cover a crash between `_docs` and `_bands`: a
    * replay of that batch finds neither keys nor bands and classifies
    * `kept` again — one duplicate admission (duplicate `_docs` rows plus a
    * repeated downstream `kept` verdict). Admission is therefore
    * AT-LEAST-ONCE under crashes, exactly-once would need a per-batch
    * commit marker; re-running `append` converges, and duplicate/orphaned
    * doc/band rows are reclaimed by [[compactIndex]] (which rebuilds keys
    * and bands from the distinct docs).
    */
  def append(verdicts: DataFrame): Unit = {
    val kept = prepare(
      verdicts.filter(col("verdict") === "kept").select(col("doc_id"), col("text")))
      .cache()
    kept.select(col("doc_id"), col("text"), col("n"))
      .write.mode("append").bucketBy(NumBuckets, "doc_id")
      .saveAsTable(s"${name}_docs")
    bandsOf(kept.filter(size(col("sig")) > 0))
      .write.mode("append").bucketBy(NumBuckets, "bkey")
      .saveAsTable(s"${name}_bands")
    kept.select(col("k")).distinct()
      .write.mode("append").bucketBy(NumBuckets, "k")
      .saveAsTable(s"${name}_keys")
    kept.unpersist()
  }

  /** Index maintenance: rewrite the three bucketed tables into one file
    * per bucket. Per-batch appends each add ≥1 small file per table —
    * at production cadence that is the classic Iceberg small-file growth
    * this whole project exists to solve, here applied to our own index.
    *
    * The rewrite REBUILDS `_keys` and `_bands` from `_docs` (the source of
    * truth — written first by [[append]]'s fail-safe order), so a partial
    * append heals here too: keys/bands become exactly the kernel pass over
    * the surviving docs. Each table is written to a fresh generation path
    * bucketed identically, then swapped in with a metadata-only
    * drop+rename — probes in flight keep reading the old files, which
    * remain on disk for orphan collection (the [[graft.sources.GraftCatalog]]
    * orphan-detection discipline). The pre-write `repartition(NumBuckets,
    * bucketCol)` aligns shuffle partitions with bucket ids, so each bucket
    * lands as exactly one file.
    */
  def compactIndex(dir: String): Unit = {
    // bucketed-by-doc_id read → exchange-free dropDuplicates
    val corpus = docs.select(col("doc_id"), col("text")).dropDuplicates("doc_id")
    val p = prepare(corpus).cache()
    val gen = java.lang.Long.toHexString(System.nanoTime())
    def swapIn(suffix: String, bcol: String, df: DataFrame): Unit = {
      val t = s"${name}_$suffix"
      val tmp = s"${t}_compact_tmp"
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      df.repartition(NumBuckets, col(bcol))
        .write.mode("overwrite").bucketBy(NumBuckets, bcol)
        .option("path", s"$dir/${t}_$gen").saveAsTable(tmp)
      spark.sql(s"DROP TABLE IF EXISTS $t") // external: files stay readable
      spark.sql(s"ALTER TABLE $tmp RENAME TO $t")
    }
    swapIn("docs", "doc_id", p.select(col("doc_id"), col("text"), col("n")))
    swapIn("bands", "bkey", bandsOf(p.filter(size(col("sig")) > 0)))
    swapIn("keys", "k", p.select(col("k")).distinct())
    p.unpersist()
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
