package graft.streaming

import org.apache.spark.sql.streaming.DataStreamWriter

/** Shared plumbing for the streaming maintainers' start() entries.
  *
  * THE BATCH-ID STAMP CONTRACT: the sum-merged delta logs (CMS
  * counters, loghist buckets, MV partials, drift monitor rows, the
  * curation chain's winner/survivor stores) stamp every appended row
  * with the micro-batch's batchId so the read seam
  * ([[graft.sources.DeltaLogCompaction.dedupeRetries]]) can collapse
  * at-least-once foreachBatch retries back to exactly-once. That
  * dedupe is only sound while batchIds uniquely identify LOGICAL
  * batches over the log's whole lifetime — which Spark guarantees
  * exactly when the query runs with a checkpointLocation (ids resume
  * from the checkpoint across restarts, and a restarted mid-flight
  * batch re-runs under its ORIGINAL id, which is precisely the retry
  * the dedupe exists to absorb). A maintainer restarted WITHOUT a
  * checkpoint restarts batchId at 0 and appends DIFFERENT data under
  * already-used ids, which the (batch_id, keys) dedupe then silently
  * collapses into one row — an under-count worse than the
  * double-count it prevents.
  *
  * So: production maintainers MUST pass `checkpointDir`; omitting it
  * is only sound for a single uninterrupted run (tests driving a
  * MemoryStream). Stamping a per-run id instead would not fix this —
  * it would un-fix the important half (a restart-recovered retry of
  * an uncommitted batch carries a NEW runId and would no longer
  * dedupe against its partial first attempt).
  */
object StreamingStarters {
  /** Apply the checkpointLocation when the caller provided one. */
  def checkpointed[T](w: DataStreamWriter[T],
                      checkpointDir: Option[String]): DataStreamWriter[T] =
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d))
}
