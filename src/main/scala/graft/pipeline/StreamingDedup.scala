package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The production dedup loop: an unbounded document stream drained through
  * a persisted [[DedupIndex]] — per micro-batch, PROBE (q90 verdicts
  * against the index), APPEND the kept docs so later batches dedup against
  * them, and hand the verdicts to the caller's sink. This is the shape a
  * 100 TB ingestion pipeline actually runs: the index only ever grows by
  * bucketed parquet appends (no rewrite per batch), each batch exchanges
  * only itself, and [[DedupIndex#compactIndex]] runs on whatever cadence
  * the small-file count demands — exactly the compaction loop the
  * reference automates for Iceberg tables, applied to our own index.
  *
  * The index is addressed BY NAME and reopened on each micro-batch's own
  * session: `foreachBatch` executes on a CLONE of the session that started
  * the stream, and a `DedupIndex` bound to the outer session keeps serving
  * that session's cached (pre-append) file listing — probes would silently
  * miss every doc appended since the stream started. Re-resolving the
  * bucketed tables through the batch session pins each probe to the
  * current table state.
  *
  * Delivery semantics: with a checkpoint, each micro-batch is processed
  * once per commit; after a failure `foreachBatch` may REPLAY the last
  * uncommitted batch. Re-probing docs a previous attempt fully appended
  * classifies them `exact_dup` (not re-appended); a torn append is
  * AT-LEAST-ONCE per [[DedupIndex#append]]'s ordering contract — every
  * window except docs-only-landed keeps the replay suppressed, and that
  * last window yields one duplicate admission that `compactIndex`
  * reclaims. Verdict emission is therefore at-least-once, not
  * exactly-once; downstream consumers must key on `doc_id`.
  */
object StreamingDedup {

  /** Start draining `docs` (a streaming DataFrame with `doc_id`, `text`)
    * through the index named `indexName` (as created by
    * [[DedupIndex.create]]). `onVerdicts` receives each micro-batch's
    * verdict frame (doc_id, text, verdict) AFTER the index append — e.g.
    * to route kept docs downstream. Runs with AvailableNow by default so
    * callers can await completion in tests and backfills; pass a
    * processing-time trigger for a long-lived service.
    */
  def run(
      indexName: String,
      docs: DataFrame,
      onVerdicts: DataFrame => Unit,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val writer = docs.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val index = DedupIndex.open(batch.sparkSession, indexName)
          val verdicts = index.dedupBatch(batch)
          index.append(verdicts)
          onVerdicts(verdicts)
        }
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
