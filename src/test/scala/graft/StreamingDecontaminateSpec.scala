package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming decontamination: per-document verdicts over a 2-batch
  * stream must equal the batch contamination aggregate on the same
  * corpus/test split — the stateless broadcast-gram design means the
  * batch boundary cannot matter.
  */
class StreamingDecontaminateSpec extends AnyFunSuite with SharedSpark {
  test("2-batch stream verdicts == batch contamination counts") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val test = all.filter($"doc_id" % 50 === 3)
    val corpusRows = all.filter($"doc_id" % 50 =!= 3)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, text) => graft.streaming.StreamingDecontaminate.DocRecord(id, text) }

    val grams = graft.streaming.StreamingDecontaminate.benchGrams(spark, test, "text", n = 3)
    val stream = MemoryStream[graft.streaming.StreamingDecontaminate.DocRecord]
    val out = graft.streaming.StreamingDecontaminate.verdicts(
      stream.toDS(), grams, n = 3, minOverlap = 3)
    val query = out.writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = corpusRows.splitAt(corpusRows.length / 2)
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.sql("SELECT doc_id, n_overlap, keep FROM decon_out")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(streamed.size == corpusRows.length) // every doc got a verdict

    // batch reference: contamination counts + the minOverlap gate;
    // docs absent from the batch aggregate share zero grams
    val batch = graft.operators.Curation.contamination(
        all.filter($"doc_id" % 50 =!= 3), test, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    corpusRows.foreach { d =>
      val expected = batch.getOrElse(d.doc_id, 0L)
      val (got, keep) = streamed(d.doc_id)
      assert(got == expected, s"doc ${d.doc_id}: stream $got batch $expected")
      assert(keep == (expected < 3))
    }
    // the gate actually fires on this corpus (planted contamination)
    assert(streamed.values.exists(!_._2), "no contaminated doc in fixture?")
  }
}
