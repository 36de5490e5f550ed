package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming curation: the gates + keyed dedup over a document stream
  * must equal the batch pipeline (q_curation_pipeline shape) when
  * ingest is id-ordered, including duplicates that arrive in a LATER
  * micro-batch than their original.
  */
class StreamingCurationSpec extends AnyFunSuite with SharedSpark {
  test("2-batch stream with cross-batch duplicates == batch gate + exact dedup") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val docs = base.map { case (id, text) =>
      graft.streaming.StreamingCuration.DocRecord(id, text, 1700000000000000L + id * 1000L)
    }
    val (b1, b2) = docs.splitAt(docs.length / 2)
    // re-ingest 5 batch-1 docs (higher ids, same text) inside batch 2:
    // cross-batch duplicates the keyed state must drop
    val dups = b1.take(5).map(d =>
      d.copy(doc_id = d.doc_id + 1000000L, ingest_ts = d.ingest_ts + 60000000L))

    val stream = MemoryStream[graft.streaming.StreamingCuration.DocRecord]
    val out = graft.streaming.StreamingCuration.curate(
      stream.toDS(), minMarkers = 3, minWords = 30, maxStopRatio = 0.3)
    val query = out.writeStream.format("memory").queryName("cur_out")
      .outputMode("append").start()
    try {
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData((b2 ++ dups).toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.sql("SELECT doc_id, content_hash FROM cur_out")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(streamed.map(_._2).distinct.length == streamed.length, "duplicate hash passed")
    assert(streamed.forall(_._1 < 1000000L), "a re-ingested duplicate won over its original")

    // batch reference: same gates, exact dedup keep-lowest-id
    val batchDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val gated = graft.operators.TextAnalysis.curationGate(
      batchDocs, "text", "doc_id", minMarkers = 3, minWords = 30, maxStopRatio = 0.3)
    val batch = graft.operators.Dedup.exact(gated, "text", "doc_id")
      .select(col("keep_id"), col("content_hash"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(streamed.toSet == batch.toSet)
  }
}
