package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Streaming corpus curation — the streaming flavor of
  * `q_curation_pipeline`'s batch shape (lang gate -> quality gate ->
  * exact dedup), for corpora that arrive continuously (crawl dumps,
  * ingest queues) instead of as a fixed snapshot.
  *
  * The gates are stateless projections/filters, so they run
  * UNCHANGED in a streaming plan (same code path as batch —
  * [[TextAnalysis.curationGateAll]]); the only stateful stage is the
  * exact dedup, keyed by content hash via
  * `dropDuplicatesWithinWatermark` — first arrival wins, and the
  * watermark bounds the hash-key state instead of letting it grow
  * with the corpus forever. Within the watermark horizon the result
  * equals the batch pipeline with keep-first-arrival policy (equal
  * to keep-lowest-id when ingest is id-ordered).
  */
object StreamingCuration {
  final case class DocRecord(doc_id: Long, text: String, ingest_ts: Long)

  /** Gate + dedup a document stream. `ingest_ts` is event-time micros;
    * `lateness` bounds both late data and dedup-state retention.
    */
  def curate(docs: Dataset[DocRecord],
             minMarkers: Int, minWords: Int, maxStopRatio: Double,
             lateness: String = "1 hour"): DataFrame =
    TextAnalysis.curationGateAll(
        docs.toDF()
          .withColumn("event_time", timestamp_micros(col("ingest_ts")))
          .withWatermark("event_time", lateness),
        "text", minMarkers, minWords, maxStopRatio)
      .withColumn("content_hash", md5(lower(trim(col("text")))))
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("doc_id"), col("content_hash"))
}
