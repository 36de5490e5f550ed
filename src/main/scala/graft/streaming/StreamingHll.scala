package graft.streaming

import graft.operators.{Dedup, Sketches}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the HyperLogLog register artifact
  * ([[graft.operators.Sketches.hllRegisters]]): each micro-batch
  * appends its OWN batch-local registers as delta rows — the artifact
  * is an append-only log of partial register tables, never rewritten
  * in place (the same admission contract as the streaming LSH band
  * index and the streaming MV delta log).
  *
  * Correct without compaction because HLL registers merge by MAX, and
  * max is associative/commutative/idempotent: a reader taking
  * max(r) per (source, j) over any number of delta rows gets exactly
  * the registers a single batch build over the union would produce —
  * bit-for-bit, so the estimate is too. Micro-batch boundaries,
  * replays, and duplicate appends all vanish under max. Registers are
  * bounded (2^b rows per source per batch), so the delta log grows by
  * at most batches * strata * 2^b tiny rows; compacting it back to
  * one row per (source, j) is an optional storage job, orthogonal to
  * correctness.
  */
object StreamingHll {
  final case class DocRecord(doc_id: Long, source: String, text: String)

  def start(docs: Dataset[DocRecord], regPath: String, b: Int = 10): StreamingQuery =
    docs.writeStream.outputMode("append")
      // no batch_id stamp needed (unlike the CMS/loghist SUM logs):
      // registers merge by MAX, so an at-least-once foreachBatch
      // retry re-appending identical register rows changes nothing
      .foreachBatch { (batch: Dataset[DocRecord], _: Long) =>
        // the artifact carries its own register-count exponent b:
        // registers read under a different b mis-scale the alpha*m^2
        // estimate and mis-split the hash — silently wrong
        // cardinalities without the header
        graft.sources.ArtifactHeader.validateOrStamp(batch.sparkSession, regPath,
          "hll", Seq("b" -> b.toString))
        Sketches.hllRegisters(
          batch.toDF().select(col("source"),
            explode(Dedup.tokens(col("text"))).as("word")), "source", b)
          .coalesce(1).write.mode("append").parquet(regPath)
        ()
      }
      .start()

  /** Current registers: max-merge the delta log. */
  def readRegisters(spark: SparkSession, regPath: String): DataFrame =
    spark.read.parquet(regPath)
      .groupBy("source", "j").agg(max(col("r")).as("r"))

  /** Current cardinality estimate straight from the artifact. The
    * caller-passed `b` is validated against the stored one and refused
    * on mismatch; use [[estimateFrom]] to take the artifact's own b.
    */
  def estimate(spark: SparkSession, regPath: String, b: Int = 10): DataFrame = {
    val hdr = graft.sources.ArtifactHeader.required(spark, regPath, "hll")
    require(hdr.get("b").contains(b.toString),
      s"HLL register log at $regPath was built with b=${hdr.getOrElse("b", "?")}, " +
        s"estimated with b=$b — registers mis-scale across b; pass the build-time b")
    Sketches.hllEstimate(readRegisters(spark, regPath), b)
  }

  /** [[estimate]] with b taken FROM the artifact's header — the
    * [[StreamingCms.estimateFrom]] convention: a reader needs no
    * out-of-band knowledge of how the register log was built.
    */
  def estimateFrom(spark: SparkSession, regPath: String): DataFrame = {
    val hdr = graft.sources.ArtifactHeader.required(spark, regPath, "hll")
    Sketches.hllEstimate(readRegisters(spark, regPath), hdr("b").toInt)
  }
}
