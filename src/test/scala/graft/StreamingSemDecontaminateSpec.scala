package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantic decontamination: flags over a 2-batch stream
  * must equal the batch LSH operator row-for-row — the stateless
  * broadcast-bucket design means the batch boundary cannot matter,
  * and the shared scalar kernels mean scores are bit-identical.
  */
class StreamingSemDecontaminateSpec extends AnyFunSuite with SharedSpark {
  test("2-batch stream flags == batch semanticContaminationLsh") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = all.filter($"vec_id" % 50 === 3)
    val corpus = all.filter($"vec_id" % 50 =!= 3)

    val batch = graft.operators.Similarity.semanticContaminationLsh(
        corpus, bench, threshold = 0.3, dim = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val idx = graft.streaming.StreamingSemDecontaminate.benchIndex(bench, dim = 64)
    val corpusRows = corpus.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
      .map { case (id, v) => graft.streaming.StreamingSemDecontaminate.VecRecord(id, v) }

    val stream = MemoryStream[graft.streaming.StreamingSemDecontaminate.VecRecord]
    val out = graft.streaming.StreamingSemDecontaminate.flags(
      stream.toDS(), idx, threshold = 0.3)
    val query = out.writeStream.format("memory").queryName("semdecon_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = corpusRows.splitAt(corpusRows.length / 2)
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.sql("SELECT vec_id, bench_id, score FROM semdecon_out")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed == batch,
      s"stream ${streamed.size} rows vs batch ${batch.size}; " +
        s"diff=${(streamed.toSet diff batch.toSet).take(3)} / ${(batch.toSet diff streamed.toSet).take(3)}")
    assert(batch.nonEmpty, "no contamination flagged in fixture?")
  }

  test("benchIndex refuses an unbounded bench side; index unchanged at the bound") {
    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = all.filter(col("vec_id") % 50 === 3)
    val n = bench.count()
    // over the bound: refusal names the bound and the batch LSH path
    // (the driver-collect mirror of Similarity.semanticContamination's
    // guard — an unbounded "benchmark" is a corpus)
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.StreamingSemDecontaminate.benchIndex(bench, dim = 64,
        maxBenchRows = n - 1)
    }
    assert(ex.getMessage.contains(s">${n - 1} rows") &&
      ex.getMessage.contains("semanticContaminationLsh"))
    // exactly at the bound: same index as the default, bit-for-bit
    // (so tightening the guard can never change flag output)
    val idxDefault = graft.streaming.StreamingSemDecontaminate.benchIndex(bench, dim = 64)
    val idxBounded = graft.streaming.StreamingSemDecontaminate.benchIndex(bench, dim = 64,
      maxBenchRows = n)
    assert(idxBounded.buckets.view.mapValues(_.toSeq).toMap ==
      idxDefault.buckets.view.mapValues(_.toSeq).toMap)
    assert(idxBounded.vecs.view.mapValues { case (v, nrm) => (v.toSeq, nrm) }.toMap ==
      idxDefault.vecs.view.mapValues { case (v, nrm) => (v.toSeq, nrm) }.toMap)
  }
}
