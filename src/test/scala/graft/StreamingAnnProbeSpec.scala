package graft

import graft.operators.Similarity
import graft.streaming.StreamingAnnProbe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN probe over the persisted IVF-PQ artifact: any
  * micro-batch slicing of the query stream must yield exactly the
  * batch operator's ranked results for those queries — queries are
  * independent and the artifact is the only state.
  */
class StreamingAnnProbeSpec extends AnyFunSuite with SharedSpark {
  test("2-batch query stream over the persisted artifact == batch probe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // persist the index once (the batch pipeline's job)
    val dir = java.nio.file.Files.createTempDirectory("ann_stream_idx").toString
    Similarity.ivfPqIndex(emb.filter(col("vec_id") % 3 =!= 0), dim = 64)
      .write.mode("overwrite").parquet(dir)

    val queries = emb.filter(col("vec_id") % 3 === 0 && col("vec_id") < 48)
      .select($"vec_id", $"embedding").as[StreamingAnnProbe.VecRecord]
      .collect().sortBy(_.vec_id)
    val (b1, b2) = queries.splitAt(queries.length / 2)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val stream = MemoryStream[StreamingAnnProbe.VecRecord]
    val q = StreamingAnnProbe.probeStream(stream.toDS(), dir,
      df => got ++= df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))),
      k = 5, dim = 64)
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val batch = Similarity.annIvfPqProbe(
        spark.read.parquet(dir),
        emb.filter(col("vec_id") % 3 === 0 && col("vec_id") < 48), k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == batch.toSet && batch.nonEmpty)
    // both micro-batches actually produced results
    assert(got.map(_._1).distinct.size > b1.length / 2)
  }
}
