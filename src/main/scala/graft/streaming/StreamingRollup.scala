package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark over the event
  * stream — the standard Structured Streaming shape for the hourly
  * rollup (`q_hourly_rollup`'s streaming flavor). The watermark bounds
  * state (late events beyond it are dropped), which is the streaming
  * analog of the reference's frontier compaction: keep bounded derived
  * state, not the full history (exvc main.rs:232-249).
  */
object StreamingRollup {
  /** Hourly counts/sums per event type with a `lateness` watermark.
    * Input: [[EventRecord]] stream (ts = nanos since epoch).
    */
  def hourly(events: Dataset[EventRecord], lateness: String = "1 hour"): DataFrame =
    events
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("cents"))
}
