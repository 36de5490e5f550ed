package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the log-histogram quantile sketch
  * ([[graft.operators.Sketches.logHistSketch]]): each micro-batch
  * appends its OWN batch-local (source, bucket, lo, c) rows as delta
  * rows — append-only, never rewritten, the CMS/HLL delta-log shape.
  * Buckets merge by ADDITION, so a reader summing c per
  * (source, bucket, lo) over any number of delta rows gets exactly
  * the sketch one batch build over the union would produce — and so
  * do all quantile edges derived from it. Every batch's delta is
  * bounded (<= 8 + 59 octaves * 8 buckets per stratum) regardless of
  * batch size — sustained ingest grows the log linearly in BATCHES,
  * not rows, and [[graft.sources.ArtifactCompaction]] folds it back
  * to one file.
  *
  * Unlike the CMS (d, w) / HLL (b) logs there is no parameter header:
  * the bucket algebra is fixed and universal, so a restarted
  * maintainer cannot drift — any loghist delta merges exactly with
  * any other over the same measured quantity.
  */
object StreamingLogHist {
  final case class ValRecord(source: String, v: Long)

  /** `checkpointDir` is a REQUIREMENT of the batch_id stamp in any
    * deployment that can restart (see
    * [[StreamingStarters.checkpointed]]): without it a restarted
    * maintainer restarts batchId at 0 and appends DIFFERENT data under
    * already-used ids, which the read-side (batch_id, keys) dedupe
    * silently collapses — an under-count worse than the double-count
    * it prevents. Tests driving a single MemoryStream run may omit it.
    */
  def start(vals: Dataset[ValRecord], histPath: String,
            checkpointDir: Option[String] = None): StreamingQuery =
    StreamingStarters.checkpointed(vals.writeStream.outputMode("append"), checkpointDir)
      .foreachBatch { (batch: Dataset[ValRecord], batchId: Long) =>
        // batch_id stamp: buckets merge by SUM, so a foreachBatch
        // retry would double-count without read-side dedupe
        Sketches.logHistSketch(batch.toDF(), "v", "source")
          .withColumn("batch_id", lit(batchId))
          .coalesce(1).write.mode("append").parquet(histPath)
        ()
      }
      .start()

  /** Current sketch: sum-merge the delta log, foreachBatch retry
    * duplicates removed first
    * ([[graft.sources.DeltaLogCompaction.dedupeRetries]]).
    */
  def readSketch(spark: SparkSession, histPath: String): DataFrame =
    graft.sources.DeltaLogCompaction.dedupeRetries(
        spark.read.parquet(histPath), Seq("source", "bucket", "lo"))
      .groupBy("source", "bucket", "lo").agg(sum(col("c")).as("c"))

  /** Quantile edges straight from the PERSISTED delta log. */
  def quantilesFrom(spark: SparkSession, histPath: String,
                    quantilesPermille: Seq[Int]): DataFrame =
    Sketches.logHistQuantilesFromSketch(readSketch(spark, histPath),
      quantilesPermille)
}
