package graft

import graft.streaming.StreamingNearDup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 seams: the deletion contract on LIVE streaming ingest
  * (re-appearing deleted ids are dropped, never query-killers; deleted
  * priors leave the per-batch probe immediately), and the
  * end-to-end rights-removal composition (ForgetSpec holds the
  * cross-artifact verb).
  */
class Round16OpsSpec extends AnyFunSuite with SharedSpark {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("indexedIngest under deletion: deleted priors leave the probe; a re-appearing deleted id is dropped, not fatal") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val indexPath = s"${tmpDir("ndstreamdel")}/band_index"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val prior = docs.filter(col("doc_id") % 3 =!= 0)
    StreamingNearDup.appendToIndex(
      graft.operators.Dedup.capBucket(
        graft.operators.Dedup.bandKeys(
          prior.select(col("doc_id"), col("text").as("__text")),
          shingleN = 3, bands = 6, rows = 2),
        "band_key", "doc_id", 128),
      indexPath, bucketCap = 128, stampParams = Some((3, 6, 2)))

    val probe = docs.filter(col("doc_id") % 3 === 0)
      .as[StreamingNearDup.DocRecord].collect().sortBy(_.doc_id)
    val (b1, b2) = probe.splitAt(probe.length / 2)

    // pick a prior doc that actually collides with batch-2 docs so the
    // exclusion is observable, by dry-running the b2 candidates
    val dryCand = StreamingNearDup.probeBands(b2.toSeq.toDS())
      .join(spark.read.parquet(indexPath).select(col("band_key"),
        col("doc_id").as("doc_prior")), "band_key")
      .select("doc_prior").distinct().collect().map(_.getLong(0))
    assert(dryCand.nonEmpty, "fixture needs at least one colliding prior")
    val deadPrior = dryCand.min
    // and a batch-1 doc that will be deleted then re-appear in batch 2
    val deadNew = b1.head.doc_id

    val perBatch = scala.collection.mutable.ArrayBuffer[Set[(Long, Long)]]()
    val stream = MemoryStream[StreamingNearDup.DocRecord]
    val q = StreamingNearDup.indexedIngest(stream.toDS(), indexPath,
      batch => perBatch += batch.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      assert(q.isActive)
      // delete one colliding prior AND one batch-1 doc mid-stream
      graft.operators.Dedup.neardupIndexDeleteAt(spark, indexPath,
        Seq(deadPrior, deadNew))
      val physicalAfterDelete = spark.read.parquet(indexPath)
        .filter(col("doc_id") === deadNew).count()
      // batch 2 carries the deleted batch-1 doc again (replayed
      // history) — the stream must survive and drop it
      stream.addData((b2 :+ b1.head).toIndexedSeq); q.processAllAvailable()
      assert(q.isActive, "a re-appearing deleted id must not kill the stream")
      // its batch-1 rows stay physical until a fold (tombstoned, not
      // rewritten), but batch 2 must not have re-appended any
      val physicalAfterReplay = spark.read.parquet(indexPath)
        .filter(col("doc_id") === deadNew).count()
      assert(physicalAfterReplay === physicalAfterDelete,
        "re-appearing deleted doc re-entered the index")
    } finally q.stop()

    assert(perBatch.size === 2)
    // deleted prior never surfaces as a candidate after the delete
    assert(!perBatch(1).exists(_._2 == deadPrior),
      s"tombstoned prior $deadPrior surfaced as doc_prior after deletion")
    // the re-appearing deleted doc neither probes nor re-enters
    assert(!perBatch(1).exists(_._1 == deadNew),
      s"re-appearing deleted doc $deadNew probed as doc_new")
    // batch-1 candidates were computed before the delete and include
    // live priors; sanity: the stream produced some candidates
    assert(perBatch(0).nonEmpty || perBatch(1).nonEmpty)
  }

  test("tombstone add: idempotent re-delete and disjoint merges round-trip the sidecar verbatim") {
    val path = s"${tmpDir("tombadd")}/idx"
    import spark.implicits._
    Seq((1L, "K")).toDF("doc_id", "band_key").write.parquet(path)
    graft.sources.ArtifactHeader.validateOrStamp(spark, path, "bands",
      StreamingNearDup.bandParams(3, 6, 2, 128))
    assert(graft.sources.Tombstones.add(spark, path, Seq(7L, 3L)) === 2L)
    assert(graft.sources.Tombstones.add(spark, path, Seq(3L, 9L)) === 3L)
    assert(graft.sources.Tombstones.read(spark, path).toSeq === Seq(3L, 7L, 9L))
  }
}
