package graft

import graft.operators.Sketches
import graft.streaming.StreamingLogHist
import graft.streaming.StreamingLogHist.ValRecord
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 seams: checkpoint-stable batch ids for the stamped delta
  * logs (the r12 ADVICE medium item), and the header guards around
  * them.
  */
class Round13OpsSpec extends AnyFunSuite with SharedSpark {

  private def writeVals(dir: String, name: String, rows: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("source", "v").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$name")
  }

  private def startHist(srcDir: String, histPath: String,
                        ckpt: Option[String]) = {
    import spark.implicits._
    val src = spark.readStream
      .schema("source STRING, v BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*")
      .as[ValRecord]
    StreamingLogHist.start(src, histPath, checkpointDir = ckpt)
  }

  test("checkpointed maintainer resumes batch ids across restart; stamped dedupe stays exact") {
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt_resume").toString
    val histPath = s"$root/hist"
    val b0 = Seq(("a", 10L), ("a", 100L))
    val b1 = Seq(("a", 1000L), ("b", 7L))
    val b2 = Seq(("b", 70L), ("a", 10L))
    writeVals(s"$root/src", "f0", b0); writeVals(s"$root/src", "f1", b1)

    val q1 = startHist(s"$root/src", histPath, Some(s"$root/ckpt"))
    try q1.processAllAvailable() finally q1.stop()
    val ids1 = spark.read.parquet(histPath).select("batch_id")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ids1 == Set(0L, 1L))

    // RESTART against the same checkpoint: the new file must land
    // under a FRESH id (resumed), not a reused 0 — the precondition
    // of the (batch_id, keys) retry dedupe
    writeVals(s"$root/src", "f2", b2)
    val q2 = startHist(s"$root/src", histPath, Some(s"$root/ckpt"))
    try q2.processAllAvailable() finally q2.stop()
    val ids2 = spark.read.parquet(histPath).select("batch_id")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ids2 == Set(0L, 1L, 2L), s"restart reused ids: $ids2")

    // and the deduped merge equals one batch build over the union
    import spark.implicits._
    val exact = Sketches.logHistSketch((b0 ++ b1 ++ b2).toDF("source", "v"), "v", "source")
      .orderBy("source", "bucket", "lo").collect().toSeq
    val merged = StreamingLogHist.readSketch(spark, histPath)
      .orderBy("source", "bucket", "lo").collect().toSeq
    assert(merged == exact)
  }

  test("the documented hazard: a checkpoint-LESS restart reuses ids and the dedupe under-counts") {
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt_hazard").toString
    val histPath = s"$root/hist"
    // one file per run so each run is exactly one micro-batch (id 0)
    writeVals(root, "f0", Seq(("a", 10L), ("a", 10L)))
    val q1 = startHist(s"$root/f0", histPath, None)
    try q1.processAllAvailable() finally q1.stop()
    writeVals(root, "f1", Seq(("a", 10L)))
    val q2 = startHist(s"$root/f1", histPath, None)
    try q2.processAllAvailable() finally q2.stop()

    // both runs stamped batch_id 0 for the same (source, bucket, lo)
    // key, so dedupeRetries keeps ONE of the two distinct batches:
    // the merged count under-counts the true 3 — this spec documents
    // WHY checkpointDir is a requirement of the stamp, not a nicety
    val mergedCount = StreamingLogHist.readSketch(spark, histPath)
      .agg(sum(col("c"))).collect()(0).getLong(0)
    assert(mergedCount < 3L, s"expected the under-count, got $mergedCount")
  }

  test("ArtifactHeader refuses a param key named 'hash' at the write seam") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hdr_hash").toString
    val ex = intercept[IllegalArgumentException] {
      graft.sources.ArtifactHeader.write(spark, dir, "demo",
        Seq("k" -> "1", "hash" -> "boom"))
    }
    assert(ex.getMessage.contains("reserved"))
  }
}
