package graft

import graft.streaming.StreamingSubstringDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming incremental substring dedup: micro-batch boundaries
  * define "prior"; the foreachBatch pipeline must equal the batch
  * incremental operator applied at the same boundaries, and the gram
  * index must grow append-only.
  */
class StreamingSubstringDedupSpec extends AnyFunSuite with SharedSpark {

  test("2-batch stream == batch substringDedupAgainst at the same split; index append-only") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("substr_idx").toFile
    val indexPath = new java.io.File(dir, "grams").getPath

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val all = docs.as[StreamingSubstringDedup.DocRecord].collect().sortBy(_.doc_id)
    val (b1, b2) = all.splitAt(all.length / 2)

    val results = scala.collection.mutable.ArrayBuffer.empty[Array[org.apache.spark.sql.Row]]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stream = MemoryStream[StreamingSubstringDedup.DocRecord]
    val q = StreamingSubstringDedup.dedupStream(stream.toDS(), indexPath,
      df => results += df.collect(), k = 8)
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      sizes += StreamingSubstringDedup.readIndex(spark, indexPath).count()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
      sizes += StreamingSubstringDedup.readIndex(spark, indexPath).count()
    } finally q.stop()

    assert(results.size == 2)
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    // batch reference at the same boundaries: batch 1 dedups against
    // nothing (self only), batch 2 against batch 1's corpus
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val d1 = b1.toSeq.map(r => (r.doc_id, r.text)).toDF("doc_id", "text")
    val d2 = b2.toSeq.map(r => (r.doc_id, r.text)).toDF("doc_id", "text")
    val ref1 = asMap(graft.operators.Curation
      .substringDedupAgainst(empty, d1, "text", "doc_id", k = 8).collect())
    val ref2 = asMap(graft.operators.Curation
      .substringDedupAgainst(d1, d2, "text", "doc_id", k = 8).collect())
    assert(asMap(results(0)) == ref1)
    assert(asMap(results(1)) == ref2)
    // something was actually deduplicated across the boundary (the
    // corpus has planted duplicates), and the index only grew
    assert(results(1).exists(_.getLong(2) > 0L), "no cross-batch span removed")
    assert(sizes(0) > 0 && sizes(1) >= sizes(0))

    // idempotent admission: re-appending batch 2's grams admits zero
    assert(StreamingSubstringDedup.appendToIndex(d2, "text", "doc_id", indexPath, k = 8) == 0L)
  }

  test("counted stream twin == plain stream results; a mid-stream decrement takes effect at the next batch, no fold needed") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val indexPath = new java.io.File(
      java.nio.file.Files.createTempDirectory("substr_cidx").toFile, "gramsc").getPath
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val all = docs.as[StreamingSubstringDedup.DocRecord].collect().sortBy(_.doc_id)
    val (b1, b2) = all.splitAt(all.length / 2)
    // a doc with a unique planted sentence, ingested in batch 1 then
    // removed mid-stream; batch 3 re-presents the same sentence under
    // a fresh id
    val uniq = "kwzqv plmtr xcfgd njhyb aoeiu wrstn qgjkx zvbnm cdfgh lmnop"
    val victim = StreamingSubstringDedup.DocRecord(900001L, uniq)
    val probe = StreamingSubstringDedup.DocRecord(900002L, uniq)

    val results = scala.collection.mutable.ArrayBuffer.empty[Array[org.apache.spark.sql.Row]]
    val stream = MemoryStream[StreamingSubstringDedup.DocRecord]
    val q = StreamingSubstringDedup.dedupStreamCounted(stream.toDS(), indexPath,
      df => results += df.collect(), k = 8)
    try {
      stream.addData((b1 :+ victim).toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
      // removal request lands between batches: decrement the victim's
      // ownership from its own text
      StreamingSubstringDedup.decrementCounted(
        Seq((victim.doc_id, victim.text)).toDF("doc_id", "text"),
        "text", "doc_id", indexPath, stampId = -42L)
      stream.addData(Seq(probe)); q.processAllAvailable()
    } finally q.stop()

    assert(results.size == 3)
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // batches 1-2 equal the plain batch algebra at the same split
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val d1 = (b1 :+ victim).toSeq.map(r => (r.doc_id, r.text)).toDF("doc_id", "text")
    val d2 = b2.toSeq.map(r => (r.doc_id, r.text)).toDF("doc_id", "text")
    assert(asMap(results(0)) == asMap(graft.operators.Curation
      .substringDedupAgainst(empty, d1, "text", "doc_id", k = 8).collect()))
    assert(asMap(results(1)) == asMap(graft.operators.Curation
      .substringDedupAgainst(d1, d2, "text", "doc_id", k = 8).collect()))
    // batch 3: the forgotten sentence no longer dedups — the removal
    // took effect without any fold
    val (_, _, keptText) = asMap(results(2))(probe.doc_id)
    assert(asMap(results(2))(probe.doc_id)._2 == 0L,
      s"forgotten grams still dedup the probe doc (kept: $keptText)")
    // and the probe doc's own admission re-owns the grams: live set
    // equals the plain index of (all docs + probe, minus victim)
    val expect = graft.operators.Curation.gramTable(
        (all :+ probe).toSeq.map(r => (r.doc_id, r.text)).toDF("doc_id", "text"),
        "text", "doc_id", 8)
      ._2.select("h").distinct().collect().map(_.getLong(0)).toSet
    val got = StreamingSubstringDedup.countedLiveFor(spark, indexPath, 8)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }
}
