package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming KMV maintenance: the per-source state after any
  * micro-batch slicing must equal the batch sketch of the union —
  * min-merge is commutative, associative and idempotent, so the
  * batch boundary cannot matter.
  */
class StreamingKmvSpec extends AnyFunSuite with SharedSpark {
  test("2-batch stream sketch state == batch kmvSketch of the union") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = 16
    val batch = graft.operators.Sketches.kmvSketch(docs, "text", "source",
        k = k, shingleN = 3)
      .collect().groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }

    val rows = docs.select($"source", $"text").as[(String, String)].collect()
      .map { case (s, t) => graft.streaming.StreamingKmv.DocRecord(s, t) }
    val stream = MemoryStream[graft.streaming.StreamingKmv.DocRecord]
    val out = graft.streaming.StreamingKmv.sketch(stream.toDS(), k = k, shingleN = 3)
    val query = out.writeStream.format("memory").queryName("kmv_out")
      .outputMode(graft.streaming.StreamingKmv.outputMode).start()
    try {
      // split mid-stream so several sources straddle the boundary
      val (b1, b2) = rows.splitAt(rows.length / 2)
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    // memory sink in update mode appends each update; last row per
    // source is the final state
    val streamed = spark.sql("SELECT source, mins FROM kmv_out")
      .collect().zipWithIndex
      .groupBy(_._1.getString(0))
      .map { case (s, rs) => s -> rs.maxBy(_._2)._1.getSeq[Long](1) }
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (s, mins) =>
      assert(mins == batch(s), s"source $s: stream $mins vs batch ${batch(s)}")
      assert(mins.length <= k && mins == mins.sorted)
    }
    // the hash kernel really is the batch algebra: spot-check one value
    val viaSql = docs.sparkSession.sql(
      "SELECT CAST(conv(substring(md5('kmv|the'), 1, 15), 16, 10) AS BIGINT)")
      .collect()(0).getLong(0)
    assert(graft.streaming.StreamingKmv.hash60("the") == viaSql)

    // the artifact loop closes: the streaming-maintained state feeds
    // kmvSetOpsFromSketches directly and yields the SAME cross-source
    // estimates as the batch sketch — "cross-corpus overlap answerable
    // at any moment from the running states", end to end
    def ests(sk: org.apache.spark.sql.DataFrame) =
      graft.operators.Sketches.kmvSetOpsFromSketches(sk, k = k)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    val fromStream = ests(streamed.toSeq
      .flatMap { case (s, mins) => mins.map(h => (s, h)) }.toDF("source", "h"))
    val fromBatch = ests(graft.operators.Sketches.kmvSketch(docs, "text", "source",
      k = k, shingleN = 3))
    assert(fromStream == fromBatch && fromStream.nonEmpty)
  }
}
