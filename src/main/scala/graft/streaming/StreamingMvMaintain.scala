package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the [[graft.plans.MvRewrite]] rollup
  * artifact: each micro-batch appends its own PARTIAL hourly aggregate
  * rows as a delta — the artifact is an append-only log of partial
  * aggregates, never rewritten in place (the same admission contract
  * as the streaming LSH band index: history files are immutable).
  *
  * This is correct WITHOUT compaction because the MV rewrite
  * re-aggregates the artifact anyway: sum over several partial rows
  * for the same (hour_bucket, event_type) equals the total, and both
  * stored measures (count, fixed-point cents) are integer sums —
  * associative, so delta granularity can't change any rewritten
  * result. Compacting the delta log back to one row per bucket is an
  * optional rollup-merge storage job, orthogonal to correctness.
  *
  * At scale this is the standard lambda-free MV story: one streaming
  * writer appends deltas (micro-batch-sized, no state store needed —
  * the artifact IS the state), readers get fresh day-grain answers
  * through the same optimizer rule that serves the batch-built MV.
  */
object StreamingMvMaintain {
  /** `checkpointDir` is a REQUIREMENT of the batch_id stamp in any
    * deployment that can restart — see
    * [[StreamingStarters.checkpointed]] for the contract.
    */
  def start(events: Dataset[EventRecord], mvPath: String,
            checkpointDir: Option[String] = None): StreamingQuery =
    StreamingStarters.checkpointed(events.writeStream.outputMode("append"), checkpointDir)
      .foreachBatch { (batch: Dataset[EventRecord], batchId: Long) =>
        // the SAME rollup expression the batch MV build uses — schema
        // and measure algebra cannot drift between the two writers.
        // batch_id stamp: the partials re-aggregate by SUM, so a
        // foreachBatch retry would double-count — the MV read path
        // dedupes on (batch_id, hour_bucket, event_type)
        graft.plans.MvRewrite.hourlyRollup(batch.toDF())
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .coalesce(1).write.mode("append").parquet(mvPath)
        ()
      }
      .start()
}
