package graft.pipeline

import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted span inventory — the incremental twin of q132's span-level
  * exact-substring audit, the way [[DedupIndex]] is q90's. One BUCKETED
  * table holds the corpus's distinct span hashes:
  *
  *   - `<name>_spans` (h) — distinct 8-word span hashes, bucketed by h
  *
  * so batch after batch probes it with no shuffle on the index side (the
  * 100 TB invariant: incoming batches are small, the inventory is not).
  * A probe classifies each batch doc's spans against the corpus — "how
  * much of this document already exists verbatim somewhere?" — without
  * ever touching corpus text: presence of the hash IS the answer, which
  * keeps the index a fraction of corpus size (8 bytes per distinct span).
  *
  * Lifecycle: [[SpanIndex.create]] → [[SpanIndex#probe]] →
  * [[SpanIndex#append]] (the batch's NEW spans join the inventory;
  * re-probing the same batch then reports every span duplicated) →
  * [[SpanIndex#compactIndex]] (per-batch appends each add ≥1 small file —
  * the same small-file debt the compaction runtime exists to solve,
  * applied to our own index).
  *
  * Probe semantics are batch-vs-INDEX only (like q90): intra-batch
  * duplication is invisible until the first append admits the batch —
  * the production ingestion contract, where a batch's own dups are the
  * next batch's corpus.
  */
final class SpanIndex private (spark: SparkSession, name: String) {

  import SpanIndex._

  private def spans = spark.table(s"${name}_spans")

  /** Per-doc span duplication vs the corpus inventory: `(doc_id,
    * n_spans, n_dup_spans)` — q132's per-doc row, with "another document"
    * meaning "any indexed document". Docs with fewer than
    * [[SpanIndex.SpanWords]] tokens have no spans and produce no row
    * (matching q132). The batch side exchanges once to meet the index
    * buckets; the index side never moves.
    */
  def probe(batch: DataFrame): DataFrame =
    spansOf(batch)
      .join(spans.withColumn("hit", lit(true)), Seq("h"), "left_outer")
      // collapse per (doc, span) BEFORE counting: the inventory is
      // distinct by construction, but a torn/concurrent append can leave
      // duplicate hash rows until compaction reclaims them, and the outer
      // join would multiply both counts by the duplicate factor. The
      // extra aggregation is batch-side only (same h partitioning).
      .groupBy(col("doc_id"), col("h"))
      .agg(max(coalesce(col("hit"), lit(false))).as("hit"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_dup_spans"))

  /** Admit the batch's spans NOT already present: one anti join against
    * the inventory (batch side exchanges, index side bucketed), one
    * bucketed parquet append. Re-running the same append converges (the
    * anti join sees the first run's rows); a crash mid-append leaves a
    * subset of new spans indexed — replays classify those spans as
    * duplicated (conservative for dedup: nothing admitted twice).
    */
  def append(batch: DataFrame): Unit =
    spansOf(batch).select(col("h")).distinct()
      .join(spans, Seq("h"), "left_anti")
      .write.mode("append").bucketBy(NumBuckets, "h")
      .saveAsTable(s"${name}_spans")

  /** Rewrite the inventory into one file per bucket (distinct rebuilt in
    * the same pass — duplicate rows from torn/replayed appends reclaim
    * here). Fresh generation path + metadata-only swap, so in-flight
    * probes keep reading the old files. The DROP→RENAME swap has a brief
    * window where the NAME does not resolve (Spark's catalog has no
    * atomic two-table swap): run compaction from the maintenance role,
    * not concurrently with probe/append planning; a crash inside the
    * window self-heals at the next [[SpanIndex.open]] (the compacted
    * generation survives under the tmp name and is renamed into place).
    */
  def compactIndex(dir: String): Unit = {
    val t = s"${name}_spans"
    val tmp = s"${t}_compact_tmp"
    val gen = java.lang.Long.toHexString(System.nanoTime())
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spans.select(col("h")).distinct()
      .repartition(NumBuckets, col("h"))
      .write.mode("overwrite").bucketBy(NumBuckets, "h")
      .option("path", s"$dir/${t}_$gen").saveAsTable(tmp)
    spark.sql(s"DROP TABLE IF EXISTS $t") // external: files stay readable
    spark.sql(s"ALTER TABLE $tmp RENAME TO $t")
  }

  /** The probe join in isolation — exposed so tests can assert the plan
    * shape (index side consumes its bucket layout, no exchange).
    */
  def probePlan(batch: DataFrame): DataFrame =
    spansOf(batch).join(spans, Seq("h"), "left_semi")

  def drop(): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${name}_spans")
}

object SpanIndex {

  /** Bucket count — sized to the test corpus; at 100 TB this scales with
    * executor count (buckets are the unit of index-side parallelism).
    */
  val NumBuckets = 8

  /** Span width in words — q132's unit. */
  val SpanWords = 8

  /** (doc_id, text) → exploded distinct span hashes, one kernel pass per
    * doc ([[TextOps.shingleHashesC]] emits the set — no explode+distinct
    * shuffle).
    */
  private def spansOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      explode(TextOps.shingleHashesC(col("text"), SpanWords)).as("h"))

  /** Build the bucketed inventory from the existing corpus. */
  def create(spark: SparkSession, name: String, dir: String,
      corpus: DataFrame): SpanIndex = {
    spansOf(corpus).select(col("h")).distinct()
      .write.mode("overwrite").bucketBy(NumBuckets, "h")
      .option("path", s"$dir/${name}_spans").saveAsTable(s"${name}_spans")
    new SpanIndex(spark, name)
  }

  /** Reopen a previously created inventory (e.g. a new session over the
    * same warehouse). Repairs a [[SpanIndex#compactIndex]] crash that
    * landed between the DROP and the RENAME (the compacted generation
    * survives under the tmp name — rename it into place so the inventory
    * is never permanently lost).
    */
  def open(spark: SparkSession, name: String): SpanIndex = {
    val t = s"${name}_spans"
    val tmp = s"${t}_compact_tmp"
    if (!spark.catalog.tableExists(t) && spark.catalog.tableExists(tmp))
      spark.sql(s"ALTER TABLE $tmp RENAME TO $t")
    new SpanIndex(spark, name)
  }
}
