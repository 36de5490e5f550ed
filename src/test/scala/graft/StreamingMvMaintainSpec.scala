package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventReplay
import graft.plans.MvRewrite
import graft.streaming.{EventRecord, StreamingMvMaintain}

/** Streaming MV maintenance: micro-batches append PARTIAL hourly
  * aggregates as delta rows (append-only artifact, never rewritten);
  * re-aggregating the artifact must equal the batch hourly truth, and
  * the register-only MvRewrite path must serve day-grain queries from
  * the streaming-maintained artifact with base-table-identical
  * results.
  */
class StreamingMvMaintainSpec extends AnyFunSuite with SharedSpark {
  private val dir = "/root/testdata/sf0.001"

  private def leafPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      case _ => Nil
    }

  test("delta log re-aggregates to batch truth; rewrite rule serves the streamed artifact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mvPath = java.nio.file.Files.createTempDirectory("graft_mv_stream").toString + "/mv"
    val base = EventReplay.loadEvents(spark, dir)
    // parity split: every hour bucket gets rows from BOTH batches, so
    // the artifact holds >1 partial row per bucket (the delta shape
    // under test); an event_id range split would cut time cleanly and
    // degenerate to one row per bucket
    val all = base.as[EventRecord].collect()
    val (b1, b2) = all.partition(_.event_id % 2 == 0)

    val stream = MemoryStream[EventRecord]
    val q = StreamingMvMaintain.start(stream.toDS(), mvPath)
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    // re-aggregation over the delta log == one-shot batch rollup
    val truth = MvRewrite.hourlyRollup(base).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val art = spark.read.parquet(mvPath)
    val reagg = art.groupBy("hour_bucket", "event_type")
      .agg(sum("cnt").as("cnt"), sum("cents").as("cents")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(reagg == truth)
    // the artifact really is a delta log: both batches contributed
    // partial rows, so it holds more rows than there are buckets
    assert(art.count() > truth.size.toLong, "expected partial delta rows per bucket")

    // register-only path: day-grain queries re-target the streamed
    // artifact (no rebuild, no base rewrite) with identical results
    MvRewrite.clear()
    val dayQ = base.groupBy(expr("ts DIV 86400000000000").as("day_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").as("cents"))
    val plain = dayQ.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    MvRewrite.registerHourlyMv(spark, base, s"$dir/events.parquet", mvPath,
      rewriteGrains = Set(86400000000000L))
    val rewritten = base.groupBy(expr("ts DIV 86400000000000").as("day_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").as("cents"))
    val leaves = leafPaths(rewritten)
    assert(leaves.exists(_.contains("graft_mv_stream")), s"expected streamed-MV scan, got $leaves")
    assert(!leaves.exists(_.contains("events.parquet")), s"base scan survived: $leaves")
    val got = rewritten.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == plain)

    // at-least-once retry: re-append batch 0's stamped partials
    // verbatim (what a re-run foreachBatch writes under the same
    // batchId) — the rewrite's retry-dedupe seam must keep serving
    // the exact answer where a raw re-aggregation would double-count
    val batch0 = art.filter(col("batch_id") === 0L).localCheckpoint()
    batch0.write.mode("append").parquet(mvPath)
    val afterRetry = base.groupBy(expr("ts DIV 86400000000000").as("day_bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(afterRetry == plain, "retried partials double-counted through the rewrite")
    MvRewrite.clear()
  }
}
