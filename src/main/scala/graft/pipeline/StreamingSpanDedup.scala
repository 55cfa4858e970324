package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The production span-audit loop: an unbounded document stream drained
  * through a persisted [[SpanIndex]] — per micro-batch, PROBE (per-doc
  * span-duplication counts against the corpus inventory), APPEND the
  * batch's new spans so later batches audit against them, and hand the
  * per-doc counts to the caller's sink (which applies its own policy:
  * drop docs over a duplicated fraction, strip spans, or just record).
  * [[StreamingDedup]]'s doc-level loop decides keep/drop; this one
  * measures VERBATIM OVERLAP at span granularity — the signal that
  * catches partial copies doc-level verdicts miss.
  *
  * Same session discipline as [[StreamingDedup]]: the index is addressed
  * BY NAME and reopened on each micro-batch's session clone, so probes
  * see every span appended since the stream started.
  *
  * Delivery semantics: [[SpanIndex#append]] admits only spans absent from
  * the inventory (anti join), so a replayed batch re-appends nothing —
  * admission converges under replays; a replayed PROBE, however, counts
  * the batch's own (already-appended) spans as duplicated, so probe
  * emission is at-least-once with replays biased toward higher dup
  * counts. Downstream consumers must key on `doc_id`.
  */
object StreamingSpanDedup {

  /** Start draining `docs` (a streaming DataFrame with `doc_id`, `text`)
    * through the span inventory named `indexName` (as created by
    * [[SpanIndex.create]]). `onCounts` receives each micro-batch's
    * per-doc frame (doc_id, n_spans, n_dup_spans) BEFORE the append — the
    * counts describe the doc against the corpus as it stood on arrival.
    * AvailableNow by default (awaitable in tests/backfills); pass a
    * processing-time trigger for a long-lived service.
    */
  def run(
      indexName: String,
      docs: DataFrame,
      onCounts: DataFrame => Unit,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val writer = docs.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val index = SpanIndex.open(batch.sparkSession, indexName)
          // materialize the counts BEFORE append mutates the inventory:
          // probe() is lazy and resolves the index table by name, so a
          // sink that defers evaluation past this callback would
          // otherwise observe post-append state (every span of its own
          // batch counted as duplicated — the inverted policy signal)
          val counts = index.probe(batch).localCheckpoint(true)
          onCounts(counts)
          index.append(batch)
        }
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
