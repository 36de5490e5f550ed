package graft

import graft.operators.Sketches
import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.SessEvent
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch invariants and streaming sessionization vs an
  * independent driver-side model.
  */
class SketchStreamSpec extends AnyFunSuite with SharedSpark {

  test("CMS: est >= exact for every token; exact when w is ample") {
    import spark.implicits._
    val words = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(10)("gamma") ++ Seq("delta")
    val tok = words.toDF("word")
    // tiny sketch: collisions likely -> one-sided error only
    val skSmall = Sketches.cmsBuild(tok, d = 2, w = 4)
    val cand = tok.distinct()
    val estSmall = Sketches.cmsEstimate(skSmall, cand, d = 2, w = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = words.groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
    exact.foreach { case (w, n) => assert(estSmall(w) >= n, s"CMS undercounted $w") }
    // ample sketch: no collisions among 4 words in 4096 columns (md5-spread)
    val skBig = Sketches.cmsBuild(tok, d = 4, w = 4096)
    val estBig = Sketches.cmsEstimate(skBig, cand, d = 4, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, n) => assert(estBig(w) === n) }
  }

  test("log-histogram quantile edge brackets the exact rank value within one sub-bucket") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("source"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val ps = Seq(250, 500, 750, 990)
    val got = Sketches.logHistQuantiles(li, "cents", "source", ps)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byStratum = li.as[(String, Long)].collect().groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2).sorted }
    for ((s, vals) <- byStratum; p <- ps) {
      val rank = ((vals.length.toLong * p + 999) / 1000).toInt
      val exact = vals(rank - 1)
      val lo = got((s, p.toLong))
      // exact lands inside the reported bucket: [lo, lo * 9/8) above 8
      assert(lo <= exact, s"$s p$p: edge $lo above exact $exact")
      assert(exact < math.max(lo + 1, lo * 9L / 8L + 1), s"$s p$p: exact $exact beyond bucket of $lo")
    }
  }

  test("CMS join-size estimate: exact at ample w, one-sided under collisions") {
    import spark.implicits._
    import graft.operators.Sketches
    // A: key k appears k times (k=1..6); B: key k appears 7-k times.
    // true join size = sum k*(7-k) for shared keys 1..6 = 56
    val a = (1 to 6).flatMap(k => Seq.fill(k)(k.toString)).toDF("word")
    val b = (1 to 6).flatMap(k => Seq.fill(7 - k)(k.toString)).toDF("word")
    val exact = (1 to 6).map(k => k * (7 - k)).sum.toLong
    val ample = Sketches.cmsJoinSize(
      Sketches.cmsBuild(a, d = 4, w = 4096), Sketches.cmsBuild(b, d = 4, w = 4096))
      .collect()(0).getLong(0)
    assert(ample === exact)
    // w = 2 forces collisions: the estimate stays an UPPER bound
    val tiny = Sketches.cmsJoinSize(
      Sketches.cmsBuild(a, d = 4, w = 2), Sketches.cmsBuild(b, d = 4, w = 2))
      .collect()(0).getLong(0)
    assert(tiny >= exact)
  }

  test("CMS merges by addition: sketch(A ++ B) == sketch(A) + sketch(B)") {
    import spark.implicits._
    val a = Seq("x", "y", "x", "z").toDF("word")
    val b = Seq("x", "w", "w").toDF("word")
    val merged = Sketches.cmsMergeSketches(
      Sketches.cmsBuild(a, 3, 64), Sketches.cmsBuild(b, 3, 64))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val whole = Sketches.cmsBuild(a.unionByName(b), 3, 64)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(merged === whole)
  }

  test("CMS over a stream (update-mode aggregate state) == batch sketch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq("x", "y", "x", "z"); val b2 = Seq("x", "w", "w", "y")
    val stream = MemoryStream[String]
    val query = Sketches.cmsBuild(stream.toDS().toDF("word"), 3, 64)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try {
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.sql("SELECT * FROM cms_out")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val batch = Sketches.cmsBuild((b1 ++ b2).toDF("word"), 3, 64)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamed === batch)
  }

  test("StreamingCms delta log: merged == batch; (d,w) header refuses drift") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingCms
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("cms_hdr").toString + "/cms"
    val b1 = Seq((1L, "x y x z"), (2L, "y y"))
    val b2 = Seq((3L, "x w w"), (4L, "z x y"))
    val stream = MemoryStream[StreamingCms.DocRecord]
    val query = StreamingCms.start(stream.toDS(), path, d = 3, w = 64)
    try {
      stream.addData(b1.map((StreamingCms.DocRecord.apply _).tupled))
      query.processAllAvailable()
      stream.addData(b2.map((StreamingCms.DocRecord.apply _).tupled))
      query.processAllAvailable()
    } finally query.stop()
    // sum-merged deltas == one batch build over the union
    val merged = StreamingCms.readSketch(spark, path)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val whole = Sketches.cmsBuild(
      (b1 ++ b2).map(_._2).flatMap(_.split(" ")).toDF("word"), 3, 64)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(merged === whole && whole.nonEmpty)
    // estimates straight from the artifact, (d, w) from its header
    val est = StreamingCms.estimateFrom(spark, path, Seq("x", "w").toDF("word"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("x") >= 4L && est("w") >= 2L)
    // a maintainer restarted with a drifted shape refuses on its
    // first batch instead of silently polluting the counter space
    val stream2 = MemoryStream[StreamingCms.DocRecord]
    val query2 = StreamingCms.start(stream2.toDS(), path, d = 3, w = 128)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        stream2.addData(Seq(StreamingCms.DocRecord(9L, "q")))
        query2.processAllAvailable()
      } finally query2.stop()
    }
    assert(ex.getMessage.contains("different parameters") ||
      Option(ex.getCause).exists(_.getMessage.contains("different parameters")),
      ex.getMessage)
  }

  test("log-histogram sketch merges by addition: merged halves == whole, " +
    "quantiles from the merged artifact == inline") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("flag"), col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)
    val merged = Sketches.logHistMergeSketches(
      Sketches.logHistSketch(li.filter(col("l_orderkey") % 2 === 0), "cents", "flag"),
      Sketches.logHistSketch(li.filter(col("l_orderkey") % 2 =!= 0), "cents", "flag"))
    val whole = Sketches.logHistSketch(li, "cents", "flag")
    assert(merged.collect().map(key).toMap === whole.collect().map(key).toMap)
    // quantiles computed from the merged ARTIFACT equal the inline path
    val ps = Seq(250, 500, 990)
    val qm = Sketches.logHistQuantilesFromSketch(merged, ps)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val qi = Sketches.logHistQuantiles(li, "cents", "flag", ps)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(qm === qi && qi.nonEmpty)
  }

  test("log-histogram bucket algebra is exact integers over the full long range") {
    import spark.implicits._
    // adversarial values straddling every octave boundary up to 2^62
    // plus random 63-bit draws: with the double-division form,
    // v = 2^61 - 1 rounded UP through the double cast and landed in
    // sub-bucket 0 of its octave instead of 7 (lo off by ~2x)
    val rnd = new scala.util.Random(7)
    val vs = ((0L to 20L) ++
      (4 to 62).flatMap(i => Seq((1L << i) - 1, 1L << i, (1L << i) + 1)) ++
      Seq.fill(300)(rnd.nextLong() & Long.MaxValue)).distinct
    val rows = Sketches.logHistSketch(
      vs.map(v => (v.toString, v)).toDF("src", "v"), "v", "src")
      .collect().map(r => (r.getString(0).toLong, r.getLong(1), r.getLong(2)))
    assert(rows.length == vs.size)
    rows.foreach { case (v, bucket, lo) =>
      if (v < 8L) assert(bucket == v && lo == v, s"v=$v")
      else {
        val len = 64 - java.lang.Long.numberOfLeadingZeros(v)
        val width = 1L << (len - 4)
        assert(lo <= v && v - lo < width, s"v=$v lo=$lo width=$width")
        assert(width * 8 <= lo, s"width > lo/8 (12.5% contract) at v=$v")
        assert(bucket == len * 8L + (v / width) % 8L, s"bucket mismatch at v=$v")
      }
    }
  }

  test("StreamingLogHist delta log: sum-merged == batch sketch of the union") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingLogHist
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("loghist").toString + "/hist"
    val b1 = Seq(("api", 3L), ("api", 120L), ("web", 7L), ("api", 121L))
    val b2 = Seq(("api", 119L), ("web", 0L), ("web", 4096L))
    val stream = MemoryStream[StreamingLogHist.ValRecord]
    val query = StreamingLogHist.start(stream.toDS(), path)
    try {
      stream.addData(b1.map((StreamingLogHist.ValRecord.apply _).tupled))
      query.processAllAvailable()
      stream.addData(b2.map((StreamingLogHist.ValRecord.apply _).tupled))
      query.processAllAvailable()
    } finally query.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)
    val merged = StreamingLogHist.readSketch(spark, path).collect().map(key).toMap
    val whole = Sketches.logHistSketch((b1 ++ b2).toDF("source", "v"), "v", "source")
      .collect().map(key).toMap
    assert(merged === whole && whole.nonEmpty)
    // two delta files on disk (one per batch), each bounded by the
    // bucket-space size, and quantiles answer from the log alone
    val q = StreamingLogHist.quantilesFrom(spark, path, Seq(500))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q("api") === 112L) // rank-2 of {3,119,120,121} = 119, in [112,120)
    assert(q("web") === 7L)   // rank-2 of {0,7,4096} = 7, an exact unit bucket
  }

  test("sum-merged delta logs survive a foreachBatch RETRY: re-appended " +
    "stamped rows dedupe on read (CMS + loghist), compaction folds them") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{StreamingCms, StreamingLogHist}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("retry").toString

    // CMS: 2 batches, then simulate an at-least-once retry of batch 0
    // by re-appending its stamped delta rows verbatim (what a re-run
    // foreachBatch writes — same batchId, identical deterministic rows)
    val cmsPath = s"$dir/cms"
    val s1 = MemoryStream[StreamingCms.DocRecord]
    val q1 = StreamingCms.start(s1.toDS(), cmsPath, d = 3, w = 64)
    try {
      s1.addData(Seq(StreamingCms.DocRecord(1L, "x y x z"))); q1.processAllAvailable()
      s1.addData(Seq(StreamingCms.DocRecord(2L, "x w w"))); q1.processAllAvailable()
    } finally q1.stop()
    def cmsMap() = StreamingCms.readSketch(spark, cmsPath)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val before = cmsMap()
    val batch0 = spark.read.parquet(cmsPath).filter(col("batch_id") === 0L)
      .localCheckpoint()
    batch0.write.mode("append").parquet(cmsPath) // the retry's re-append
    assert(cmsMap() === before, "retry re-append must not change counters")
    // without the stamp seam the same rows WOULD double-count
    assert(spark.read.parquet(cmsPath).groupBy("row", "col").agg(sum("c"))
      .collect().map(_.getLong(2)).sum > before.values.sum)
    // compaction folds the retried log to one row per key, same answer
    graft.sources.DeltaLogCompaction.compactCms(spark, cmsPath)
    assert(cmsMap() === before)
    assert(spark.read.parquet(cmsPath).count() == before.size)

    // loghist: same contract
    val lhPath = s"$dir/hist"
    val s2 = MemoryStream[StreamingLogHist.ValRecord]
    val q2 = StreamingLogHist.start(s2.toDS(), lhPath)
    try {
      s2.addData(Seq(StreamingLogHist.ValRecord("s", 3L),
        StreamingLogHist.ValRecord("s", 120L))); q2.processAllAvailable()
      s2.addData(Seq(StreamingLogHist.ValRecord("s", 119L))); q2.processAllAvailable()
    } finally q2.stop()
    def lhMap() = StreamingLogHist.readSketch(spark, lhPath)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    val lhBefore = lhMap()
    spark.read.parquet(lhPath).filter(col("batch_id") === 1L).localCheckpoint()
      .write.mode("append").parquet(lhPath)
    assert(lhMap() === lhBefore)
  }

  test("event-time sessionization closes sessions by WATERMARK timeout " +
    "(no sentinels) and equals the batch algebra") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val raw = graft.operators.EventReplay.loadEvents(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 4)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"))
      .as[SessEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    val gap = 1800000000L
    // one far-future tick (user 999) advances the global watermark far
    // past every open session's (last + gap) -> all of them time out
    val tick = SessEvent(-1L, 999L, raw.map(_.ts_us).max + 100L * gap)
    val stream = MemoryStream[SessEvent]
    val query = StreamingSessionize.sessionizeEventTime(stream.toDS(), gap, "1 minute")
      .writeStream.format("memory").queryName("sess_et")
      .outputMode("append").start()
    try {
      val half = raw.length / 2
      stream.addData(raw.take(half).toIndexedSeq); query.processAllAvailable()
      stream.addData(raw.drop(half).toIndexedSeq); query.processAllAvailable()
      stream.addData(Seq(tick)); query.processAllAvailable()
      stream.addData(Seq.empty[SessEvent]); query.processAllAvailable() // timeout batch
    } finally query.stop()
    val streamed = spark.sql("SELECT * FROM sess_et WHERE user_id < 4")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batchQ = SparkEntry.queries("q_sessionize")(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 4)
      .select("user_id", "session_id", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed === batchQ)
  }

  test("streaming sessionization: closed sessions across 3 micro-batches " +
    "== independent driver model") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val raw = graft.operators.EventReplay.loadEvents(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 6)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"))
      .as[SessEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    val gap = 1800000000L
    // sentinels one gap past the end close every user's last session
    val flushTs = raw.map(_.ts_us).max + 2 * gap
    val sentinels = raw.map(_.user_id).distinct
      .map(u => SessEvent(event_id = -1L, user_id = u, ts_us = flushTs))
    val batches = raw.grouped((raw.length + 2) / 3).map(_.toSeq).toSeq :+ sentinels.toSeq

    val stream = MemoryStream[SessEvent]
    val query = StreamingSessionize.sessionize(stream.toDS(), gap)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b.toIndexedSeq); query.processAllAvailable() }
    } finally query.stop()
    val streamed = spark.sql("SELECT * FROM sess_out").as[(Long, Long, Long, Long)]
      .collect().toSet

    // independent model: per-user linear scan over the ordered log
    val want = raw.groupBy(_.user_id).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e.ts_us, e.event_id))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var (sid, start, last, n) = (0L, 0L, 0L, 0L)
      sorted.foreach { e =>
        if (n == 0L) { sid = 1L; start = e.ts_us; last = e.ts_us; n = 1L }
        else if (e.ts_us - last > gap) {
          sessions += ((u, sid, n, last - start))
          sid += 1; start = e.ts_us; last = e.ts_us; n = 1L
        } else { last = e.ts_us; n += 1 }
      }
      if (n > 0) sessions += ((u, sid, n, last - start)) // closed by sentinel
      sessions
    }.toSet
    assert(streamed === want)
    // and the numbering matches the batch window algebra (q_sessionize)
    val batchQ = SparkEntry.queries("q_sessionize")(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 6)
      .select("user_id", "session_id", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed === batchQ)
  }
}
