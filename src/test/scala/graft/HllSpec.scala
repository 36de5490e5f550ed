package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sketches}

/** HyperLogLog distinct sketch: estimator accuracy within the
  * published bound, and the property the sketch exists for — registers
  * built per shard and merged by MAX equal registers built over the
  * whole corpus (so nightly cross-shard merges never rescan history).
  */
class HllSpec extends AnyFunSuite with SharedSpark {
  private val dir = "/root/testdata/sf0.001"

  test("per-source estimates land within 3 standard errors of exact") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rows = Sketches.hllDistinct(docs, "text", "source", b = 10).collect()
    assert(rows.nonEmpty)
    // sigma = 1.04/sqrt(m) ~ 3.25% at m=1024; 3 sigma ~ 9.75%
    rows.foreach { r =>
      val est = r.getAs[Double]("estimate")
      val exact = r.getAs[Long]("n_exact").toDouble
      assert(math.abs(est - exact) / exact < 0.0975,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
    // the union row is a real union: at least as big as every stratum
    val union = rows.find(_.getString(0) == "__union__").get.getAs[Long]("n_exact")
    assert(rows.forall(_.getAs[Long]("n_exact") <= union))
  }

  test("streaming delta log estimates bit-identically to the batch build") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamingHll

    val regPath = java.nio.file.Files.createTempDirectory("graft_hll_stream").toString + "/regs"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source", $"text")
    val all = docs.as[StreamingHll.DocRecord].collect()
    val (b1, b2) = all.partition(_.doc_id % 2 == 0)

    val stream = MemoryStream[StreamingHll.DocRecord]
    val q = StreamingHll.start(stream.toDS(), regPath, b = 10)
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    // the artifact is a delta log: both batches appended their own
    // batch-local registers (raw rows == sum of the per-half builds —
    // the tiny per-source vocab here makes the two halves' register
    // sets nearly disjoint, so a plain raw > distinct check is flaky)
    def regsOf(rows: Array[StreamingHll.DocRecord]) = Sketches.hllRegisters(
      spark.createDataFrame(rows.toIndexedSeq)
        .select(col("source"), explode(Dedup.tokens(col("text"))).as("word")),
      "source", b = 10).count()
    val raw = spark.read.parquet(regPath)
    assert(raw.count() == regsOf(b1) + regsOf(b2), "expected per-batch delta rows")
    def estMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // b is validated against the artifact's stamped header; a drifted
    // caller refuses instead of mis-scaling the estimate
    intercept[IllegalArgumentException] {
      StreamingHll.estimate(spark, regPath, b = 12)
    }
    val streamed = estMap(StreamingHll.estimate(spark, regPath, b = 10))
    val batch = estMap(Sketches.hllEstimate(
      Sketches.hllRegisters(
        docs.select(col("source"), explode(Dedup.tokens(col("text"))).as("word")),
        "source", b = 10), b = 10))
    assert(streamed == batch)
    // and the no-out-of-band-knowledge read: b straight from the header
    assert(estMap(StreamingHll.estimateFrom(spark, regPath)) == batch)
  }

  test("shard registers max-merge to whole-corpus registers") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tok = docs.select(col("source"), explode(Dedup.tokens(col("text"))).as("word"))
    def regMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Int] =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap

    val whole = regMap(Sketches.hllRegisters(tok, "source", b = 10))
    val tokE = docs.filter(col("doc_id") % 2 === 0)
      .select(col("source"), explode(Dedup.tokens(col("text"))).as("word"))
    val tokO = docs.filter(col("doc_id") % 2 === 1)
      .select(col("source"), explode(Dedup.tokens(col("text"))).as("word"))
    val re = regMap(Sketches.hllRegisters(tokE, "source", b = 10))
    val ro = regMap(Sketches.hllRegisters(tokO, "source", b = 10))
    val merged = (re.keySet ++ ro.keySet).map { k =>
      k -> math.max(re.getOrElse(k, 0), ro.getOrElse(k, 0))
    }.toMap
    assert(merged == whole)
  }
}
