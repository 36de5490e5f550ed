package graft.streaming

import graft.operators.{Curation, Dedup}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The WHOLE streaming curation chain as one reusable foreachBatch
  * pipeline — the production form of the composition
  * StreamingCurationFullSpec pins against `q_curation_full2`:
  *
  *   gate + keyed exact dedup  (in-plan state, watermark-bounded)
  *   -> near-dup vs history    (persisted LSH band index — see below)
  *   -> n-gram decontam        (broadcast benchmark grams)
  *   -> semantic decontam      (driver-built bench LSH index)
  *   -> substring-span dedup   (persisted gram index)
  *
  * State posture at 100 TB: every cross-batch stage consumes a
  * PERSISTED artifact, never re-derives history. The near-dup stage
  * probes the `(doc_id, band_key)` index grown append-only by
  * [[StreamingNearDup.appendToIndex]] ([[Dedup.nearDupAgainstIndex]]),
  * so per-batch cost is (batch shingling) + (band join against the
  * index) + (Jaccard verify over colliding docs only) — NOT a
  * re-shingle of every prior winner, which would make batch B cost
  * O(B) and the whole ingest O(B^2). Winner texts are touched only
  * for candidate ids: a broadcast semi-join, so history is never
  * shuffled — the residual per-batch cost is one columnar (id, text)
  * scan of the winner store; at extreme history sizes back that store
  * with a bucketed table so the fetch prunes. The gram index and the
  * winner store grow by one parquet append per batch;
  * [[graft.sources.ArtifactCompaction.compactFiles]] is the periodic
  * layout job that keeps their file counts bounded.
  *
  * Reference analog: the append-only event log + derived state
  * (crates/esvc-core/src/workcache.rs:60-108) — arriving data probes
  * derived artifacts and extends them, never replays history.
  */
object StreamingCurationFull {

  /** Everything a batch reports: survivors and drop counts per stage,
    * per-stage wall seconds, and the size of each persisted history
    * artifact AFTER the batch — the state-maintenance story a soak
    * reads for latency flatness and artifact growth.
    */
  final case class BatchMetrics(batch: Long, nWinners: Long, nCrossDrop: Long,
                                nWithinDrop: Long, nGramDrop: Long, nSemDrop: Long,
                                nSurvivors: Long, stageSec: Seq[(String, Double)],
                                winnersRows: Long, bandIdxRows: Long, gramIdxRows: Long)

  /** Append-file count targeting ~`targetBytes` of payload per file:
    * still 1 for small batches (the measured small-files listing tax
    * stays fixed), but a genuinely large micro-batch no longer
    * funnels its whole text volume through a single writer task (the
    * r12 watch item: winner-store appends carry full document texts).
    * Capped so a corrupt estimate cannot explode the file count.
    */
  private[graft] def fileCount(estBytes: Long, targetBytes: Long): Int =
    math.min(4096L, math.max(1L, (estBytes + targetBytes - 1) / targetBytes)).toInt

  /** Winner-store TOUCH measurement for the text-tiering decision:
    * of all the text bytes the winner store carries, how many does
    * batch `batchId`'s near-dup verify actually FETCH? The probe path
    * reads prior texts only for ids whose band keys collide with the
    * batch ([[graft.operators.Dedup.nearDupAgainstIndexAt]]'s
    * semi-join), so the touched fraction is the store's effective hot
    * set — if it stays small as history grows, the texts belong in a
    * COLD artifact fetched by id (bucketed so the fetch prunes) while
    * the hot path keeps only (doc_id, band_key).
    *
    * Derivation mirrors the production probe off the SAME persisted
    * artifacts (band params from the index's own header, retry-deduped
    * store, per-bucket cap), with the batch's own ids excluded the way
    * the pre-admit probe never sees them — including the candidate-id
    * pushdown: the touched fetch collects the (bounded) collision ids
    * and pushes them as a scan predicate, so the MEASUREMENT costs
    * what the production fetch costs, O(batch + candidates), not a
    * full-store text scan per call. The prior-store TOTAL is the one
    * inherently O(history) aggregate: pass `priorStoreBytes` (the
    * caller's running accumulation of [[batchTextBytes]] increments —
    * what the soak probe does, keeping an N-batch soak linear) to skip
    * it; `None` computes it exactly (the audited form, and the spec
    * pins accumulated == scanned). Measurement-only: nothing in the
    * chain calls this; the soak probe does, per batch.
    */
  def touchedTextBytes(spark: org.apache.spark.sql.SparkSession,
                       winnersPath: String, bandIdxPath: String,
                       batchId: Long,
                       priorStoreBytes: Option[Long] = None): (Long, Long, Long) = {
    val store = graft.sources.DeltaLogCompaction.dedupeRetries(
      spark.read.parquet(winnersPath), Seq("doc_id"))
    val hdr = graft.sources.ArtifactHeader.required(spark, bandIdxPath, "bands")
    val batchDocs = store.filter(col("batch_id") === batchId)
      .select(col("doc_id"), col("text").as("__text"))
    val batchBands = Dedup.capBucket(
      Dedup.bandKeys(batchDocs, hdr("shingle_n").toInt,
        hdr("bands").toInt, hdr("rows").toInt),
      "band_key", "doc_id", hdr("bucket_cap").toInt)
    val candPrior = spark.read.parquet(bandIdxPath)
      .join(batchBands.select("band_key").distinct(), Seq("band_key"), "left_semi")
      .select("doc_id").distinct()
      .join(batchDocs.select("doc_id"), Seq("doc_id"), "left_anti")
    val priorStore = store.filter(col("batch_id") < batchId)
    def bytes(df: DataFrame): Long = df
      .agg(coalesce(sum(octet_length(col("text")).cast("long")), lit(0L)))
      .collect()(0).getLong(0)
    // same pushdown-or-semi-join policy as the production fetch
    // (Dedup.verifyAgainst): candidate ids are bounded by the batch's
    // band keys x bucket_cap, so the collect is small by construction
    val candIds = candPrior.limit(Dedup.PriorIdPushdownMax + 1).collect().map(_.get(0))
    val touched =
      if (candIds.length <= Dedup.PriorIdPushdownMax)
        priorStore.filter(col("doc_id").isin(candIds: _*))
      else priorStore.join(candPrior, Seq("doc_id"), "left_semi")
    (priorStoreBytes.getOrElse(bytes(priorStore)), bytes(touched),
      touched.select("doc_id").distinct().count())
  }

  /** One batch's admitted text bytes in the winner store — the
    * O(batch) increment a caller accumulates into the running
    * prior-store total for [[touchedTextBytes]] (the `batch_id`
    * equality predicate reaches the parquet scan, and appends are
    * per-batch files, so row-group stats prune the rest of history).
    */
  def batchTextBytes(spark: org.apache.spark.sql.SparkSession,
                     winnersPath: String, batchId: Long): Long =
    graft.sources.DeltaLogCompaction.dedupeRetries(
        spark.read.parquet(winnersPath).filter(col("batch_id") === batchId),
        Seq("doc_id"))
      .agg(coalesce(sum(octet_length(col("text")).cast("long")), lit(0L)))
      .collect()(0).getLong(0)

  /** Start the five-stage chain over `stream`. `docTexts` is the
    * stream-static (doc_id, text) lookup (texts re-attach after the
    * keyed dedup state, which carries only hashes); `emb` the static
    * (vec_id, embedding) side for the semantic stage. Survivors land
    * append-only under `$stateDir/survivors`; the three history
    * artifacts live under `$stateDir/{winners,bands,grams}`.
    *
    * `countedGrams` routes the substring stage through the COUNTED
    * gram index ([[StreamingSubstringDedup.appendToIndexCounted]] /
    * `countedLiveFor`) instead of the plain content-addressed one:
    * identical dedup semantics on clean data (the live set equals the
    * plain index's hash set while nothing was removed — spec-held),
    * but rights-removal becomes an O(deleted-docs)
    * [[StreamingSubstringDedup.decrementCounted]] that takes effect
    * at the NEXT batch's probe with no rebuild and no stream pause —
    * the 100 TB forget path for the chain's one rebuild-priced
    * artifact. Admission stamps ride the micro-batch id, so the flag
    * REQUIRES `checkpointDir` (a checkpoint-less restart would reuse
    * ids for different batches — the stamp-collision refusal would
    * halt the chain loudly rather than corrupt, but a production
    * chain should never be startable into that state). The artifact
    * kinds differ (`gramsc` vs `grams`), so flipping the flag over an
    * existing stateDir refuses at the header seam instead of probing
    * a foreign index shape.
    */
  def start(stream: Dataset[StreamingCuration.DocRecord],
            docTexts: DataFrame, emb: DataFrame,
            benchGrams: Broadcast[Set[String]],
            benchIdx: StreamingSemDecontaminate.BenchIndex,
            stateDir: String,
            minMarkers: Int = 3, minWords: Int = 30, maxStopRatio: Double = 0.3,
            shingleN: Int = 3, bands: Int = 6, rows: Int = 2,
            threshold: Double = 0.4, bucketCap: Int = 128,
            gramN: Int = 3, minOverlap: Int = 3,
            semThreshold: Double = 0.3, substrK: Int = 8,
            onBatch: BatchMetrics => Unit = _ => (),
            checkpointDir: Option[String] = None,
            targetAppendBytes: Long = 64L << 20,
            countedGrams: Boolean = false): StreamingQuery = {
    require(!countedGrams || checkpointDir.nonEmpty,
      "StreamingCurationFull: countedGrams stamps gram ownership with the " +
        "micro-batch id, which is only restart-stable under a checkpoint — " +
        "pass checkpointDir")
    val winnersPath = s"$stateDir/winners"
    val bandIdxPath = s"$stateDir/bands"
    val gramIdxPath = s"$stateDir/grams"
    val survivorsPath = s"$stateDir/survivors"
    val curated = StreamingCuration.curate(stream, minMarkers, minWords, maxStopRatio)
    // checkpointDir is a REQUIREMENT of the batch_id stamps below in
    // any deployment that can restart — see StreamingStarters
    StreamingStarters.checkpointed(
      curated.writeStream.outputMode("append"), checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // watermark eviction fires extra NO-DATA micro-batches; only
        // data batches run the chain. The whole batch body is a
        // checkpoint-hygiene scope: every localCheckpoint created in
        // it — INCLUDING ones inside called operators the chain holds
        // no handle to — is freed at batch end, so sustained ingest
        // carries zero dead blocks between batches.
        if (!batch.isEmpty) graft.plans.CheckpointHygiene.scoped(batch.sparkSession) {
          val spark = batch.sparkSession
          import spark.implicits._
          def timed[T](f: => T): (T, Double) = {
            val t = System.nanoTime(); val r = f; (r, (System.nanoTime() - t) / 1e9)
          }
          def readOr(path: String, empty: => DataFrame): DataFrame =
            try spark.read.parquet(path)
            catch { case _: org.apache.spark.sql.AnalysisException => empty }

          // -- stage 1 landed in-plan (gate + keyed exact dedup);
          // re-attach texts to this batch's winners
          val (winners, tWin) = timed {
            val w = batch.select("doc_id", "content_hash")
              .join(docTexts.select("doc_id", "text"), "doc_id").localCheckpoint()
            w
          }
          val nWinners = winners.count()

          // -- stage 2: near-dup — cross-batch via the PERSISTED band
          // index, within-batch via the self-join; history texts are
          // read only for colliding candidate ids
          val ((crossDrop, withinDrop, ndSurv), tNd) = timed {
            // retry-dedupe seam: winner rows are batch_id-stamped, so
            // an at-least-once re-append of a batch cannot duplicate
            // the prior corpus this (and every later) batch probes
            val priorTexts = graft.sources.DeltaLogCompaction.dedupeRetries(
                readOr(winnersPath, Seq.empty[(Long, String)].toDF("doc_id", "text")),
                Seq("doc_id"))
              .select("doc_id", "text")
            // trusted probe: shingle/band/row/cap come FROM the
            // index's own header (stamped by the admit below), so a
            // restarted chain with drifted config refuses instead of
            // silently probing a foreign key space
            val cross = Dedup.nearDupAgainstIndexAt(spark, priorTexts, winners,
                bandIdxPath, "text", "doc_id", threshold)
              .select(col("doc_new").as("doc_id")).distinct().localCheckpoint()
            val within = Dedup.nearDupPairs(winners, "text", "doc_id",
                shingleN, bands, rows, threshold, bucketCap)
              .select(col("doc_b").as("doc_id")).distinct().localCheckpoint()
            val surv = winners
              .join(cross.unionByName(within).distinct(), Seq("doc_id"), "left_anti")
              .localCheckpoint()
            (cross, within, surv)
          }
          val nCross = crossDrop.count(); val nWithin = withinDrop.count()

          // admit the batch's winners into history AFTER probing:
          // texts into the winner store, capped bands into the index
          val (_, tAdmit) = timed {
            // few-file appends per batch throughout: a growing
            // artifact must not accumulate O(batches x partitions)
            // part files (every later read pays the listing), but the
            // winner store carries full TEXTS, so the file count is
            // sized to the batch's measured text bytes (one aggregate
            // over the already-checkpointed winners) instead of a
            // blanket single-writer funnel
            val winBytes = winners
              .agg(coalesce(sum(octet_length(col("text")).cast("long")), lit(0L)))
              .collect()(0).getLong(0)
            winners.select("doc_id", "text")
              .withColumn("batch_id", lit(batchId))
              .coalesce(fileCount(winBytes, targetAppendBytes))
              // id-clustered layout: the probe fetch pushes candidate
              // ids as a scan predicate (Dedup.verifyAgainst), and
              // sorted row groups give it tight min/max stats to
              // prune against — a sort of one batch, paid once, so
              // every later batch's fetch skips the cold text pages
              .sortWithinPartitions("doc_id")
              .write.mode("append")
              .option("compression", "zstd").parquet(winnersPath)
            StreamingNearDup.appendToIndex(
              Dedup.capBucket(
                Dedup.bandKeys(winners.select(col("doc_id"), col("text").as("__text")),
                  shingleN, bands, rows),
                "band_key", "doc_id", bucketCap),
              bandIdxPath, bucketCap, stampParams = Some((shingleN, bands, rows)))
          }

          // -- stage 3: n-gram decontamination (broadcast grams)
          val (clean1, tGram) = timed {
            val verdicts = StreamingDecontaminate.verdicts(
              ndSurv.select(col("doc_id"), col("text"))
                .as[StreamingDecontaminate.DocRecord],
              benchGrams, n = gramN, minOverlap = minOverlap)
            ndSurv.join(verdicts.filter(col("keep")).select("doc_id"), "doc_id")
              .localCheckpoint()
          }
          val nGramDrop = ndSurv.count() - clean1.count()

          // -- stage 4: semantic decontamination (driver bench index)
          val ((flagged, fin), tSem) = timed {
            val fl = StreamingSemDecontaminate.flags(
              emb.join(clean1.select(col("doc_id").as("vec_id")), "vec_id")
                .select(col("vec_id"), col("embedding"))
                .as[StreamingSemDecontaminate.VecRecord],
              benchIdx, threshold = semThreshold)
              .select(col("vec_id").as("doc_id")).distinct().localCheckpoint()
            (fl, clean1.join(fl, Seq("doc_id"), "left_anti").localCheckpoint())
          }
          val nSem = flagged.count(); val nSurv = fin.count()

          // -- stage 5: substring-span dedup vs the persisted gram
          // index; survivors' grams admitted after
          val (_, tSub) = timed {
            // the index is consumed straight off parquet — a
            // localCheckpoint here would copy the WHOLE (growing)
            // index into executor memory every batch, turning an O(1)
            // stage into O(history); the span write happens before
            // the append, so the join never reads a path being
            // appended to
            val gIdx =
              if (countedGrams)
                StreamingSubstringDedup.countedLiveFor(spark, gramIdxPath, substrK)
              else StreamingSubstringDedup.indexFor(spark, gramIdxPath, substrK)
            // the span frame carries kept_text (near-full document
            // text per survivor), so sizing it from the survivor ROW
            // count re-created the single-writer funnel on text-heavy
            // batches — measure the frame's own bytes instead, off a
            // checkpoint the scoped sweep frees (same posture as the
            // winner-store append above)
            val spans = Curation.substringDedupAgainstIndex(
                gIdx, fin, "text", "doc_id", k = substrK)
              .withColumn("batch_id", lit(batchId))
              .localCheckpoint()
            val spanBytes = spans
              .agg(coalesce(
                sum(octet_length(col("kept_text")).cast("long") + lit(64L)),
                lit(0L)))
              .collect()(0).getLong(0)
            spans.coalesce(fileCount(spanBytes, targetAppendBytes))
              .write.mode("append").option("compression", "zstd")
              .parquet(s"$stateDir/substr_spans")
            if (countedGrams)
              // ownership stamped with the (checkpoint-stable)
              // micro-batch id — the at-least-once retry seam; a
              // decrementCounted landing between batches already took
              // effect in this batch's countedLiveFor probe above
              StreamingSubstringDedup.appendToIndexCounted(
                fin.select("doc_id", "text"), "text", "doc_id", gramIdxPath,
                k = substrK, stampId = batchId)
            else StreamingSubstringDedup.appendToIndex(
              fin.select("doc_id", "text"), "text", "doc_id", gramIdxPath, k = substrK)
          }
          fin.select("doc_id", "content_hash")
            .withColumn("batch_id", lit(batchId))
            .coalesce(fileCount(nSurv * 48L, targetAppendBytes))
            .write.mode("append")
            .option("compression", "zstd").parquet(survivorsPath)

          // artifact growth AFTER this batch (cheap parquet-metadata
          // counts); the scoped sweep frees this batch's checkpoints —
          // named frames AND operator-internal ones alike
          val sizes = Seq(winnersPath, bandIdxPath, gramIdxPath).map(p =>
            readOr(p, spark.range(0).toDF()).count())
          onBatch(BatchMetrics(batchId, nWinners, nCross, nWithin, nGramDrop,
            nSem, nSurv,
            Seq("winners" -> tWin, "neardup" -> tNd, "admit" -> tAdmit,
              "gram_decontam" -> tGram, "semantic" -> tSem, "substring" -> tSub),
            sizes(0), sizes(1), sizes(2)))
        }
      }
      .start()
  }
}
