package graft

import graft.streaming.{StreamingCuration, StreamingCurationFull,
  StreamingDecontaminate, StreamingSemDecontaminate}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sustained-ingest soak of the COMPOSED five-stage streaming curation
  * chain ([[graft.streaming.StreamingCurationFull]]): N micro-batches
  * of id-ordered documents flow through gate -> exact dedup -> indexed
  * near-dup -> n-gram decontam -> semantic decontam -> substring
  * dedup, and the probe reports, per batch, the wall time of every
  * stage plus the size of each persisted history artifact (winner
  * store, band index, gram index). What a 100 TB reviewer reads off
  * the output: per-batch latency FLATNESS (the indexed near-dup probe
  * must not grow with history the way a re-shingle of all prior
  * winners would) and linear artifact growth.
  *
  * The optional `copies` arg grows the ENTITY space (never replicates
  * rows): copy k keeps gate-vocabulary tokens (stopwords + language
  * markers — the words the gates inspect) and prefixes every other
  * token `c<k>`, so each copy passes the gates exactly like the
  * original while shingle spaces stay disjoint; embeddings rotate by
  * k dims (distinct vectors, same geometry); ids get disjoint offsets.
  *
  * A third arg turns on STEADY DELETION under the live stream (the
  * rights-removal soak): every batch from the third on, `delRate`
  * doc ids from the batch ingested two batches earlier are deleted
  * through [[graft.operators.Dedup.neardupIndexDeleteAt]] under the
  * maintainer's shared access, and `neardupTombstoneFoldDue` joins
  * the per-batch maintainIfDue poll (budget 3x the rate, so fold
  * windows land repeatedly mid-soak and rewrite the winner store +
  * band index under live history). The close-out proves the
  * contract: a probe of the deleted documents' own texts surfaces
  * ZERO deleted priors while tombstones are still live, and after
  * the final fold both artifacts physically contain zero deleted
  * rows.
  *
  * A fourth arg `counted=1` routes the substring stage through the
  * COUNTED gram index (`StreamingCurationFull(countedGrams = true)`)
  * and turns the deletion soak's gram story live: every per-batch
  * removal ALSO issues the O(deleted-docs)
  * [[graft.streaming.StreamingSubstringDedup.decrementCounted]]
  * against the chain's own gram artifact (uniquely stamped per
  * batch), so removals reach the gram surface at the NEXT batch with
  * no rebuild and no pause; `countedGramCompactDue` joins the
  * per-batch poll so the delta log folds mid-soak under live
  * removals. Close-out proves set-equivalence: the counted live gram
  * set must equal the grams re-derived from (survivors minus
  * deleted) — the same truth the rebuild path would install — and
  * the final forget's gram phase reports a (no-op) decrement, not a
  * rebuild.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.CurationStreamProbe 12 1 8"      # rebuild path
  *   sbt "runMain graft.CurationStreamProbe 12 1 8 1"    # counted path
  */
object CurationStreamProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.nonEmpty) args(0).toInt else 12
    val copies = if (args.length > 1) args(1).toInt else 1
    val delRate = if (args.length > 2) args(2).toInt else 0
    val counted = args.length > 3 && args(3).toInt != 0
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")

    val gateVocab = graft.operators.TextAnalysis.GateVocab
    val (docs, emb) =
      if (copies <= 1) (docs0.localCheckpoint(), emb0.localCheckpoint())
      else {
        val tagged = (0 until copies).map { k =>
          val tag = udf { (t: String) =>
            Option(t).getOrElse("").split(" +").filter(_.nonEmpty)
              .map(w => if (gateVocab(w)) w else s"c$k$w").mkString(" ")
          }
          docs0.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
            tag(col("text")).as("text"))
        }.reduce(_.unionByName(_))
        val shifted = (0 until copies).map { k =>
          val rot = k % 64
          emb0.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
            (if (rot == 0) col("embedding")
             else concat(slice(col("embedding"), rot + 1, 64 - rot),
               slice(col("embedding"), 1, rot))).as("embedding"))
        }.reduce(_.unionByName(_))
        (tagged.localCheckpoint(), shifted.localCheckpoint())
      }
    val nDocs = docs.count()

    // static decontam assets from the (scaled) corpus's held-out
    // slice. The synthetic corpus has a tiny vocabulary, so the
    // correctness gates' %50 slice + minOverlap=3 flags EVERY doc at
    // sf0.1 — a soak with empty stages 4-5 measures nothing. Thinner
    // slice + higher overlap keep every stage under load while the
    // drop counts stay nonzero (verified in the output).
    val grams = StreamingDecontaminate.benchGrams(spark,
      docs.filter(col("doc_id") % 500 === 3), "text", n = 3)
    val benchIdx = StreamingSemDecontaminate.benchIndex(
      emb.filter(col("vec_id") % 50 === 3), dim = 64)

    val stateDir = java.nio.file.Files.createTempDirectory("cur_soak").toString
    val metrics = scala.collection.mutable.ArrayBuffer
      .empty[StreamingCurationFull.BatchMetrics]
    val stream = MemoryStream[StreamingCuration.DocRecord]
    // the soak runs the PRODUCTION maintenance component: the
    // maintainer owns start/quiesce/restart (checkpointed, so batch
    // ids resume across the mid-soak window) instead of the former
    // ad-hoc stop -> compact sequencing
    val maint = new graft.sources.ArtifactMaintainer(owner = Some(() =>
      StreamingCurationFull.start(stream.toDS(), docs, emb,
        grams, benchIdx, stateDir, minOverlap = 8, onBatch = metrics += _,
        checkpointDir = Some(s"$stateDir/ckpt"), countedGrams = counted)))
    // the maintenance DECISION is the production policy too: per
    // batch the probe polls maintainIfDue with a small-file budget
    // (due checks are pure listings); windows open only when an
    // artifact's accumulated small-file debt crosses the budget.
    // Budget ~ half the soak so the first window lands mid-soak under
    // live history and debt re-accumulates visibly afterwards.
    val smallFileBudget = math.max(3, nBatches / 2)
    // the deletion soak's fold policy: the live tombstone set is a
    // probe-side cost, so the budget is a RATE bound (3 batches of
    // deletes), not a storage bound — windows land repeatedly
    val tombBudget = math.max(1L, delRate * 3L)
    def delChecks =
      if (delRate <= 0) Nil
      else Seq(graft.sources.ArtifactMaintainer.neardupTombstoneFoldDue(
        spark, s"$stateDir/bands", Some(s"$stateDir/winners"),
        maxIds = tombBudget))
    // counted mode: the gram DELTA LOG's probe cost grows with raw
    // log length between folds — its stamp-preserving fold joins the
    // poll with a budget paced off the first batch's log size, so
    // windows land mid-soak under live decrements. ONE DueCheck
    // instance across polls (it remembers the last fold's floor —
    // the netted log is corpus-sized, so a stateless raw-rows budget
    // would re-fold every batch for zero shrink); created after
    // batch 0 once the pacing size is known
    var countedCheck = Option.empty[graft.sources.ArtifactMaintainer.DueCheck]
    def dueChecks = delChecks ++ countedCheck.toSeq ++
      Seq("winners", "bands", "grams").map(a =>
      graft.sources.ArtifactMaintainer.compactDue(
        spark, s"$stateDir/$a", maxSmallFiles = smallFileBudget,
        // auto-sized rewrite (~64 MB/file): soak-scale stores fold to
        // one file (debt resets, the policy re-paces from zero) while
        // a grown store gets right-sized files that no longer count
        // as small-file debt
        // re-establish cross-batch id clustering on the text store so
        // the probe fetch's pushed ids keep pruning after compaction
        clusterBy = if (a == "winners") Seq("doc_id") else Nil))

    val all = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)
      .map { case (id, text) =>
        StreamingCuration.DocRecord(id, text, 1700000000000000L + id * 1000L) }
    val per = math.max(1, all.length / nBatches)
    val batchWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    // winner-store touch accounting (the text-tiering decision input):
    // per batch, how many stored text bytes the near-dup verify fetches
    val touched = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var storeAcc = 0L   // running prior-store text bytes (sum of batch increments)
    var accUpTo = -1L   // highest batch id whose increment is in storeAcc
    val windows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, graft.sources.ArtifactMaintainer.Report)]
    val batchSlices = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    val deleted = scala.collection.mutable.ArrayBuffer.empty[Long]
    var nDeletedPresent = 0L // deleted ids that really held winner rows
    var gramDecremented = 0L // counted mode: owner-count rows decremented live
    val gramDecSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val tombLive = scala.collection.mutable.ArrayBuffer.empty[Long]
    maint.start()
    try {
      all.grouped(per).take(nBatches).zipWithIndex.foreach { case (b, i) =>
        val t0 = System.nanoTime()
        stream.addData(b.toIndexedSeq)
        maint.drain()
        batchSlices += b.map(_.doc_id).toArray
        // steady removal requests against settled history (two
        // batches back), issued under the shared artifact access like
        // any writer-class caller; the per-batch cost of the delete
        // itself is one sidecar merge
        if (delRate > 0 && i >= 2) {
          val src = batchSlices(i - 2)
          val stride = math.max(1, src.length / delRate)
          val ids = src.grouped(stride).map(_.head).take(delRate).toSeq
          maint.withAccess {
            nDeletedPresent += spark.read.parquet(s"$stateDir/winners")
              .filter(col("doc_id").isin(ids.map(java.lang.Long.valueOf): _*))
              .select("doc_id").distinct().count()
            graft.operators.Dedup.neardupIndexDeleteAt(
              spark, s"$stateDir/bands", ids)
            // counted mode: the gram surface settles NOW — one
            // O(deleted docs' text) decrement, uniquely stamped per
            // removal batch; effective at the next batch's probe with
            // no rebuild and no stream pause
            if (counted) {
              val t0 = System.nanoTime()
              val delTexts = graft.sources.DeltaLogCompaction.dedupeRetries(
                  spark.read.parquet(s"$stateDir/winners"), Seq("doc_id"))
                .filter(col("doc_id").isin(ids.map(java.lang.Long.valueOf): _*))
                .select("doc_id", "text")
              gramDecremented += graft.streaming.StreamingSubstringDedup
                .decrementCounted(delTexts, "text", "doc_id",
                  s"$stateDir/grams", stampId = -(i + 1L))
              gramDecSecs += (System.nanoTime() - t0) / 1e9
            }
          }
          deleted ++= ids
        }
        if (counted && i == 0 && countedCheck.isEmpty) {
          // batch 0 can legitimately admit nothing: the artifact is
          // then header-only and unreadable as parquet — budget from 0
          val rows0 =
            try spark.read.parquet(s"$stateDir/grams").count()
            catch { case _: org.apache.spark.sql.AnalysisException => 0L }
          countedCheck = Some(graft.sources.ArtifactMaintainer
            .countedGramCompactDue(spark, s"$stateDir/grams",
              maxRows = math.max(256L, rows0 * 3L)))
        }
        tombLive += graft.sources.Tombstones.count(spark, s"$stateDir/bands")
        batchWalls += (System.nanoTime() - t0) / 1e9
        touched += {
          // linear-soak accounting: the prior-store total is the
          // running sum of per-batch increments (each O(batch) via the
          // pushed batch_id predicate), so an N-batch soak never pays
          // an O(history) store scan per batch just to measure itself
          val fresh = metrics.filter(_.batch > accUpTo).sortBy(_.batch)
          if (fresh.isEmpty) (0L, 0L, 0L)
          else {
            fresh.init.foreach { m =>
              storeAcc += StreamingCurationFull.batchTextBytes(
                spark, s"$stateDir/winners", m.batch)
            }
            val m = fresh.last
            val r =
              if (m.batch > 0)
                StreamingCurationFull.touchedTextBytes(spark,
                  s"$stateDir/winners", s"$stateDir/bands", m.batch,
                  priorStoreBytes = Some(storeAcc))
              else (0L, 0L, 0L)
            storeAcc += StreamingCurationFull.batchTextBytes(
              spark, s"$stateDir/winners", m.batch)
            accUpTo = m.batch
            r
          }
        }
        // policy-paced maintenance: the poll is per batch, the window
        // opens only when the small-file budget trips — the ingest
        // pause a deployment budgets, measured under live history
        maint.maintainIfDue(dueChecks).foreach(r => windows += ((i, r)))
      }
    } finally maint.stop()
    windows.foreach { case (batch, r) =>
      val tasks = r.tasks.map(t =>
        s""""${t.name}":{"sec":${f"${t.sec}%.3f"},"summary":"${t.summary}"}""")
        .mkString(",")
      println(s"""{"maintenance_window":{"after_batch":$batch,""" +
        s""""pause_sec":${f"${r.pauseSec}%.3f"},""" +
        s""""quiesce_sec":${f"${r.quiesceSec}%.3f"},""" +
        s""""window_sec":${f"${r.windowSec}%.3f"},"tasks":{$tasks}}}""")
    }

    metrics.zip(batchWalls).zipWithIndex.foreach { case ((m, wall), i) =>
      val stages = m.stageSec.map { case (n, s) => s""""$n":${f"$s%.3f"}""" }
        .mkString(",")
      val (storeB, touchB, touchDocs) =
        if (i < touched.size) touched(i) else (0L, 0L, 0L)
      val tl = if (i < tombLive.size) tombLive(i) else 0L
      println(s"""{"batch":$i,"wall_sec":${f"$wall%.3f"},"stages":{$stages},""" +
        s""""winners":${m.nWinners},"cross_drop":${m.nCrossDrop},""" +
        s""""within_drop":${m.nWithinDrop},"gram_drop":${m.nGramDrop},""" +
        s""""sem_drop":${m.nSemDrop},"survivors":${m.nSurvivors},""" +
        s""""winners_rows":${m.winnersRows},"band_idx_rows":${m.bandIdxRows},""" +
        s""""gram_idx_rows":${m.gramIdxRows},""" +
        s""""store_text_bytes":$storeB,"touched_text_bytes":$touchB,""" +
        s""""touched_prior_docs":$touchDocs,"tombstones_live":$tl}""")
    }
    // lifecycle close-out: the appends wrote one file per batch by
    // design; the periodic maintenance job compacts the layout (rows
    // unchanged — ArtifactCompaction verifies before swapping)
    val compacted = Seq("winners", "bands", "grams").map { a =>
      val (fb, fa) = graft.sources.ArtifactCompaction.compactFiles(
        spark, s"$stateDir/$a", targetFiles = 1)
      s""""$a":[$fb,$fa]"""
    }
    println(s"""{"compacted_files":{${compacted.mkString(",")}}}""")

    if (delRate > 0) {
      val delArr = deleted.map(java.lang.Long.valueOf).toSeq
      // the contract WHILE tombstones may still be live: probing the
      // deleted documents' own texts (jaccard 1.0 against themselves
      // if reachable) must surface ZERO deleted priors
      val probeDocs = docs.filter(col("doc_id").isin(delArr: _*))
        .select("doc_id", "text").limit(64)
      val store = graft.sources.DeltaLogCompaction.dedupeRetries(
        spark.read.parquet(s"$stateDir/winners"), Seq("doc_id"))
        .select("doc_id", "text")
      val hits = graft.operators.Dedup.nearDupAgainstIndexAt(spark, store,
          probeDocs, s"$stateDir/bands", "text", "doc_id", threshold = 0.4)
        .filter(col("doc_prior").isin(delArr: _*)).count()
      val liveResidue = graft.sources.Tombstones.count(spark, s"$stateDir/bands")
      require(hits == 0L,
        s"deletion soak VIOLATION: $hits deleted priors surfaced from the probe")
      // close-out via the FULL rights-removal composition: one
      // forgetDocuments over every deleted id (idempotent — most are
      // already folded) covering the gram index too, which the
      // per-batch fold deliberately leaves to rebuild-from-surviving
      // (content-addressed grams have no per-doc rows). The chain's
      // gram corpus is the SURVIVOR docs (post-decontam), so the
      // surviving corpus is the folded winner store semi-joined to
      // survivor ids — evaluated inside the call, AFTER the fold.
      val t0 = System.nanoTime()
      val report = graft.operators.Forget.forgetDocuments(spark,
        deleted.toSeq,
        graft.operators.Forget.Targets(
          bandIndexPath = Some(s"$stateDir/bands"),
          winnerStorePath = Some(s"$stateDir/winners"),
          gramIndexPath = Some(s"$stateDir/grams"),
          survivingDocs = Some(() => {
            val survIds = graft.sources.DeltaLogCompaction.dedupeRetries(
              spark.read.parquet(s"$stateDir/survivors"), Seq("doc_id"))
              .select("doc_id")
            graft.sources.DeltaLogCompaction.dedupeRetries(
              spark.read.parquet(s"$stateDir/winners"), Seq("doc_id"))
              .select("doc_id", "text")
              .join(survIds, Seq("doc_id"), "left_semi")
          })))
      val forgetSec = (System.nanoTime() - t0) / 1e9
      val (sb, sa) = report.storeFold.getOrElse((0L, 0L))
      val (ib, ia) = report.bandFold.getOrElse((0L, 0L))
      val (gb, ga) = report.gramRebuild.getOrElse((0L, 0L))
      if (counted) {
        // counted-mode contract: the per-batch decrements already
        // settled the gram surface, so the close-out forget's gram
        // phase is a decrement (of residual registered ids — zero
        // here) and NEVER a rebuild
        require(report.gramRebuild.isEmpty && report.gramDecrement.isDefined,
          s"counted soak VIOLATION: close-out forget took the rebuild path " +
            s"(${report.summary})")
        // set-equivalence close-out: the live counted gram set must
        // equal the grams re-derived from (survivors minus deleted) —
        // the exact truth the rebuild path would have installed
        val keptIds = graft.sources.DeltaLogCompaction.dedupeRetries(
            spark.read.parquet(s"$stateDir/survivors"), Seq("doc_id"))
          .select("doc_id")
          .filter(!col("doc_id").isin(delArr: _*))
        val keptTexts = graft.sources.DeltaLogCompaction.dedupeRetries(
            spark.read.parquet(s"$stateDir/winners"), Seq("doc_id"))
          .select("doc_id", "text")
          .join(keptIds, Seq("doc_id"), "left_semi")
        val expected = graft.operators.Curation
          .gramTable(keptTexts, "text", "doc_id", 8)._2
          .select("h").distinct()
        val live = graft.streaming.StreamingSubstringDedup
          .countedLive(spark, s"$stateDir/grams")
        val diff = expected.join(live, Seq("h"), "left_anti")
          .unionByName(live.join(expected, Seq("h"), "left_anti")).count()
        require(diff == 0L,
          s"counted soak VIOLATION: live gram set diverges from the " +
            s"surviving-corpus derivation by $diff hashes")
        println(s"""{"counted_gram_closeout":{""" +
          s""""live_decrements":$gramDecremented,""" +
          s""""decrement_total_sec":${f"${gramDecSecs.sum}%.2f"},""" +
          s""""decrement_max_sec":${f"${gramDecSecs.foldLeft(0.0)(math.max)}%.3f"},""" +
          s""""live_set_equals_surviving_derivation":true}}""")
      }
      val storeLeft = spark.read.parquet(s"$stateDir/winners")
        .filter(col("doc_id").isin(delArr: _*)).count()
      val idxLeft = spark.read.parquet(s"$stateDir/bands")
        .filter(col("doc_id").isin(delArr: _*)).count()
      require(storeLeft == 0L && idxLeft == 0L,
        s"deletion soak VIOLATION: $storeLeft store / $idxLeft index rows " +
          "survived the final forget")
      require(nDeletedPresent > 0L,
        "deletion soak fixture: no deleted id ever held a winner row — the " +
          "probe checks would be vacuous")
      println(s"""{"deletion_soak":{"del_rate":$delRate,""" +
        s""""deleted_total":${deleted.size},""" +
        s""""deleted_present_in_store":$nDeletedPresent,""" +
        s""""probe_deleted_prior_hits":$hits,""" +
        s""""tombstones_at_close":$liveResidue,""" +
        s""""forget_sec":${f"$forgetSec%.2f"},""" +
        s""""final_forget":{"store":[$sb,$sa],"index":[$ib,$ia],""" +
        s""""grams":[$gb,$ga],"gram_decrement":${report.gramDecrement.getOrElse(-1L)}},""" +
        s""""store_rows_left":$storeLeft,"index_rows_left":$idxLeft}}""")
    }

    val head3 = batchWalls.take(3)
    val tail3 = batchWalls.takeRight(3)
    println(s"""{"metric":"curation_stream_soak","dir":"$dir","copies":$copies,""" +
      s""""n_docs":$nDocs,"batches":${batchWalls.size},""" +
      s""""total_sec":${f"${batchWalls.sum}%.2f"},""" +
      s""""first3_avg":${f"${head3.sum / head3.size}%.3f"},""" +
      s""""last3_avg":${f"${tail3.sum / tail3.size}%.3f"},""" +
      s""""survivors_total":${metrics.map(_.nSurvivors).sum}}""")
    spark.stop()
  }
}
