package graft

import graft.operators.Drift
import org.scalatest.funsuite.AnyFunSuite

/** Transition counts and PSI drift vs hand-computed expectations. */
class DriftSpec extends AnyFunSuite with SharedSpark {

  test("transitions counts (state, next) pairs per key in time order") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"), // a->b, b->a
      (2L, 1L, 4L, "a"), (2L, 2L, 5L, "b"),                     // a->b
      (3L, 9L, 6L, "c")                                          // no successor
    ).toDF("k", "t", "id", "st")
    val out = Drift.transitions(ev, "k", "t", "id", "st")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out === Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  test("psi: zero for identical snapshots, positive under shift, " +
    "matches an independent computation") {
    import spark.implicits._
    val a = (Seq.fill(30)(0L) ++ Seq.fill(10)(1L)).map(("s", _)).toDF("src", "bin")
    val bSame = a
    val same = Drift.psi(a, bSame, "src", "bin", nBins = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(same === Array(("s", 0L, 40L, 40L))) // pa == pb everywhere
    // shifted mass: bin 0 -> bin 1
    val b = (Seq.fill(10)(0L) ++ Seq.fill(30)(1L)).map(("s", _)).toDF("src", "bin")
    val psiRow = Drift.psi(a, b, "src", "bin", nBins = 4).collect().head
    // independent model of the same fixed-point algebra
    val na = Map(0L -> 30L, 1L -> 10L); val nb = Map(0L -> 10L, 1L -> 30L)
    val want = (0L until 4L).map { bin =>
      val pa = (na.getOrElse(bin, 0L) + 1).toDouble / 44.0
      val pb = (nb.getOrElse(bin, 0L) + 1).toDouble / 44.0
      math.floor((pa - pb) * math.log(pa / pb) * 1e9).toLong
    }.sum
    assert(psiRow.getLong(1) === want)
    assert(psiRow.getLong(1) > 0L)
    // strata with no drift stay independent of the drifted one
    val multi = Drift.psi(
      a.unionByName(Seq(("t", 0L)).toDF("src", "bin")),
      b.unionByName(Seq(("t", 0L)).toDF("src", "bin")),
      "src", "bin", nBins = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(multi("s") === want && multi("t") === 0L)
  }

  test("StreamingDrift: per-batch PSI vs the stamped reference == batch psi; " +
    "headerless reference refuses") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDrift
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("psi_mon").toString
    val refRaw = (Seq.fill(30)(0L) ++ Seq.fill(10)(1L)).map(("s", _)).toDF("source", "bin")
    StreamingDrift.writeReference(refRaw, "source", "bin", nBins = 4, s"$dir/ref")

    // batch 1 matches the reference mix, batch 2 is shifted
    val b1 = (Seq.fill(15)(0L) ++ Seq.fill(5)(1L)).map(StreamingDrift.BinRecord("s", _))
    val b2 = (Seq.fill(2)(0L) ++ Seq.fill(18)(1L)).map(StreamingDrift.BinRecord("s", _))
    val stream = MemoryStream[StreamingDrift.BinRecord]
    val q = StreamingDrift.start(stream.toDS(), s"$dir/ref", s"$dir/mon")
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val mon = spark.read.parquet(s"$dir/mon")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def batchPsi(rows: Seq[StreamingDrift.BinRecord]) =
      Drift.psi(refRaw, rows.map(r => (r.source, r.bin)).toDF("source", "bin"),
        "source", "bin", nBins = 4).collect().head.getLong(1)
    assert(mon(0L)._1 === batchPsi(b1) && mon(1L)._1 === batchPsi(b2))
    assert(mon(0L)._2 === 40L && mon(0L)._3 === 20L) // n_a = ref total, n_b = batch total
    assert(mon(1L)._1 > mon(0L)._1, "shifted batch must score higher drift")

    // a reference without its grid header refuses the monitor path
    refRaw.groupBy("source", "bin").count().withColumnRenamed("count", "n")
      .write.parquet(s"$dir/ref_nohdr")
    val ex = intercept[IllegalArgumentException] {
      StreamingDrift.referenceCounts(spark, s"$dir/ref_nohdr")
    }
    assert(ex.getMessage.contains("no psi_ref header"), ex.getMessage)
  }
}
