package graft

import graft.streaming.StreamingRangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join == the batch bucketed range join on
  * the same event log, including cross-batch matches (a click in a
  * LATER micro-batch than its signup).
  */
final case class SEv(event_id: Long, user_id: Long, ts_us: Long)
final case class CEv(c_user_id: Long, ts_us: Long, cents: Long)

class StreamingRangeJoinSpec extends AnyFunSuite with SharedSpark {

  test("stream-stream range join == batch rangeJoinBucketed") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = graft.operators.EventReplay.loadEvents(spark, "/root/testdata/sf0.001")
      .withColumn("tsu", expr("ts DIV 1000"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("tsu").as("ts_us")).as[SEv].collect()
      .sortBy(_.ts_us)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("tsu").as("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents")).as[CEv].collect()
      .sortBy(_.ts_us)
    val widthSec = 604800L // 7 days, the q_range_join window

    val sStream = MemoryStream[SEv]
    val cStream = MemoryStream[CEv]
    val joined = StreamingRangeJoin.clicksWithinWindow(
      sStream.toDS().select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("s_time")),
      cStream.toDS().select(col("c_user_id"),
        timestamp_micros(col("ts_us")).as("c_time"), col("cents")),
      widthSec)
    val query = joined.writeStream.format("memory").queryName("rj_out")
      .outputMode("append").start()
    try {
      // time-sliced batches; many matches span the slice boundary
      val cut = signups(signups.length / 2).ts_us
      sStream.addData(signups.filter(_.ts_us <= cut).toIndexedSeq)
      cStream.addData(clicks.filter(_.ts_us <= cut).toIndexedSeq)
      query.processAllAvailable()
      sStream.addData(signups.filter(_.ts_us > cut).toIndexedSeq)
      cStream.addData(clicks.filter(_.ts_us > cut).toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.sql(
      "SELECT event_id, count(*) AS n, sum(cents) AS c FROM rj_out GROUP BY event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = graft.operators.Temporal.rangeJoinBucketed(
        ev.filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"), col("tsu")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("tsu"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents")),
        "user_id", "tsu", "tsu", width = widthSec * 1000000L)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n"), sum(col("r_cents")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
