package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming flavor of
  * `ensure_event`'s content-addressed insert (reference
  * graph.rs:136-154, batch flavor `operators/Dedup.exact` /
  * `GraphOps.dedupInsert`): only the FIRST event with a given content
  * hash passes; replays and duplicates are dropped as they arrive.
  *
  * `dropDuplicatesWithinWatermark` keys dedup state by the content
  * hash and lets the watermark expire it — the streaming analog of
  * frontier compaction (bounded state, not full history,
  * exvc main.rs:232-249). Within the watermark horizon the semantics
  * equal the batch `row_number() = 1` pick on arrival order.
  */
object StreamingDedup {
  /** Content hash matching the batch dedup-insert addressing
    * (q_dedup_insert): event_type | cents | props, sha256'd.
    */
  def contentHash(df: DataFrame): DataFrame =
    df.withColumn("content_hash",
      sha2(concat_ws("|", col("event_type"),
        expr("CAST(CAST(round(value * 100) AS BIGINT) AS STRING)"), col("props")), 256))

  /** First-arrival winner per content hash within the watermark. */
  def firstPerHash(events: Dataset[EventRecordP], lateness: String = "1 hour"): DataFrame =
    contentHash(events.toDF())
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("content_hash"), col("event_id"), col("event_time"))
}

/** [[EventRecord]] plus the props payload the content hash needs. */
final case class EventRecordP(event_id: Long, ts: Long, user_id: Long,
                              event_type: String, value: Double, props: String)
