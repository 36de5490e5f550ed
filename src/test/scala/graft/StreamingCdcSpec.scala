package graft

import graft.streaming.StreamingCdc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CDC apply: keyed last-writer-wins state across
  * micro-batches must equal the batch Dimensions.cdcApply snapshot on
  * the same change set, including keys whose winner flips between
  * batches and out-of-order (late) changes that do NOT win.
  */
class StreamingCdcSpec extends AnyFunSuite with SharedSpark {
  test("3-batch stream == batch cdcApply, late losers ignored, tombstones surfaced") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val b1 = Seq(
      StreamingCdc.Change(1L, 10L, 1L, "U", 1.0),
      StreamingCdc.Change(2L, 10L, 2L, "U", 5.0),
      StreamingCdc.Change(3L, 10L, 3L, "U", 9.0))
    val b2 = Seq(
      StreamingCdc.Change(1L, 20L, 4L, "U", 2.0),  // key 1 upgraded
      StreamingCdc.Change(2L, 30L, 5L, "D", 0.0),  // key 2 deleted
      StreamingCdc.Change(4L, 40L, 6L, "U", 4.0))
    val b3 = Seq(
      StreamingCdc.Change(1L, 15L, 7L, "U", 99.0), // LATE: older than key 1's winner
      StreamingCdc.Change(2L, 25L, 8L, "U", 88.0), // late: older than the delete
      StreamingCdc.Change(4L, 40L, 9L, "U", 6.0))  // same instant, higher seq wins

    val stream = MemoryStream[StreamingCdc.Change]
    val out = StreamingCdc.snapshot(stream.toDS())
    val query = out.writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    try {
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      stream.addData(b3); query.processAllAvailable()
    } finally query.stop()

    // update mode re-emits a key per batch: keep the LAST emission
    val emissions = spark.sql("SELECT * FROM cdc_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val finalByKey = emissions.groupBy(_._1).map { case (k, rows) =>
      k -> rows.maxBy(_._4) // n_changes grows monotonically
    }
    assert(finalByKey(1L) === ((1L, "U", 2.0, 3L)))
    assert(finalByKey(2L) === ((2L, "D", 0.0, 3L))) // tombstone surfaced
    assert(finalByKey(3L) === ((3L, "U", 9.0, 1L)))
    assert(finalByKey(4L) === ((4L, "U", 6.0, 2L)))

    // equals the batch operator (which drops tombstoned keys)
    val changes = (b1 ++ b2 ++ b3).toDF()
    val batch = graft.operators.Dimensions
      .cdcApply(changes, "k", "t", "seq", "op", "v")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val streamedLive = finalByKey.collect {
      case (k, (_, "U", v, n)) => k -> ((v, n))
    }
    assert(streamedLive === batch)
  }
}
