package graft.streaming

import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming incremental substring-span dedup — the ExactSubstr face
  * of the index-probe streaming family ([[StreamingNearDup]] is the
  * MinHash face): arriving documents are deduplicated against the
  * persisted gram-hash index of everything ingested before them, and
  * the index grows APPEND-ONLY with each micro-batch's new grams.
  *
  * The whole computation runs through foreachBatch: substring dedup
  * needs a global first-occurrence aggregate over the batch's grams,
  * which is illegal inside an append-mode streaming plan — but each
  * completed micro-batch is plain batch data, where the full
  * [[Curation.substringDedupAgainstIndex]] algebra (keep-first
  * aggregate, islands window, positional anti-join) is legal
  * unchanged. No state store and no watermark: the index IS the
  * state, and it only ever gains rows (grams are content-addressed,
  * so admission is idempotent).
  *
  * Ordering contract: micro-batch boundaries define "prior". Two
  * duplicated spans arriving in the SAME micro-batch resolve by the
  * batch operator's (doc_id, pos) keep-first; across batches the
  * earlier batch always owns the gram — the same semantics a daily
  * incremental batch pipeline has, at micro-batch grain.
  */
object StreamingSubstringDedup {
  final case class DocRecord(doc_id: Long, text: String)

  /** Read the persisted gram index (one LONG column `h`); empty frame
    * when nothing has been ingested yet.
    */
  def readIndex(spark: SparkSession, indexPath: String): DataFrame = {
    import spark.implicits._
    // existence through the path's own FileSystem (not java.io): the
    // index lives wherever the pipeline's storage is — on HDFS/S3 a
    // local check is always false and every batch would dedup against
    // an empty index
    val p = new org.apache.hadoop.fs.Path(indexPath)
    if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
      // a header-stamped directory with no data yet (batch admitted 0
      // rows) has nothing to infer a schema from — that IS the empty
      // index
      try spark.read.parquet(indexPath)
      catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty[Long].toDF("h") }
    else Seq.empty[Long].toDF("h")
  }

  /** [[readIndex]] VALIDATED against the artifact's stamped gram
    * length: a k-gram index consumed at a different k silently never
    * matches (every span check misses), so the mismatch refuses
    * loudly instead. A missing path is the empty index (bootstrap); a
    * present-but-headerless one refuses with guidance.
    */
  def indexFor(spark: SparkSession, indexPath: String, k: Int): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)) {
      val hdr = graft.sources.ArtifactHeader.required(spark, indexPath, "grams")
      require(hdr.get("k").contains(k.toString),
        s"gram index at $indexPath was built with k=${hdr.getOrElse("k", "?")}, " +
          s"probed with k=$k — k-gram hashes never match across k; rebuild or " +
          "pass the build-time k")
    }
    readIndex(spark, indexPath)
  }

  /** Append a document batch's grams to the index, new hashes only —
    * history is never rewritten, one parquet append per batch.
    * Materialized (localCheckpoint) before the write: the anti-join
    * reads indexPath, and appending to a path mid-read is undefined.
    *
    * The artifact carries its gram length k as a header
    * ([[graft.sources.ArtifactHeader]]): an index of k-gram hashes
    * consumed at a different k simply never matches — appends at a
    * mismatched k refuse loudly, and [[indexFor]] is the validated
    * read path.
    *
    * @return number of admitted gram hashes
    */
  def appendToIndex(batch: DataFrame, textCol: String, idCol: String,
                    indexPath: String, k: Int = 8): Long = {
    val spark = batch.sparkSession
    graft.sources.ArtifactHeader.validateOrStamp(spark, indexPath, "grams",
      Seq("k" -> k.toString))
    val (_, grams) = Curation.gramTable(batch, textCol, idCol, k)
    val fresh = grams.select("h").distinct()
      .join(readIndex(spark, indexPath), Seq("h"), "left_anti")
      .localCheckpoint()
    val n = fresh.count()
    // ONE file per micro-batch append: the default shuffle fan-out
    // would leave O(batches x partitions) tiny part files, and every
    // later read pays the listing — the small-files failure mode
    // object stores punish hardest (measured: 385 files after 12
    // micro-batches made the substring stage 2.6x slower per batch)
    if (n > 0) fresh.coalesce(1).write.mode("append").parquet(indexPath)
    graft.plans.CheckpointHygiene.free(fresh)
    n
  }

  /** Rebuild the gram index FROM A SURVIVING CORPUS — the
    * rights-removal verb for this artifact. Grams are content-
    * addressed aggregate state (one hash may be owed to many
    * documents), so per-id tombstones are not well-defined here;
    * forgetting a document means re-deriving the index from the
    * corpus that no longer contains it — run AFTER the winner-store
    * fold has made that corpus clean
    * ([[graft.operators.Forget.forgetDocuments]] sequences this).
    *
    * Same posture as the ANN rebuild: derive on tmp, verify the row
    * accounting independently (re-read count == computed count),
    * carry the `grams` header and any foreign sidecars through, then
    * the two-rename atomic swap — a crash leaves the old generation
    * live. Returns (rowsBefore, rowsAfter) in distinct gram hashes.
    *
    * Scale: one shuffle (the gram distinct) over the surviving
    * corpus — the same cost as the initial build, amortized across
    * the forget batch; NOT a per-document cost.
    */
  def rebuildIndex(spark: SparkSession, indexPath: String,
                   surviving: DataFrame, textCol: String, idCol: String): (Long, Long) = {
    val hdr = graft.sources.ArtifactHeader.required(spark, indexPath, "grams")
    val k = hdr("k").toInt
    val rowsBefore = readIndex(spark, indexPath).count()
    val (_, grams) = Curation.gramTable(surviving, textCol, idCol, k)
    val fresh = grams.select("h").distinct().localCheckpoint()
    val expected = fresh.count()
    val sim = graft.operators.Similarity
    val (fs, p) = sim.hadoopFs(spark, indexPath)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".gramrebuild.tmp")
    val old = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".gramrebuild.old")
    fs.delete(tmp, true); fs.delete(old, true)
    // no coalesce(1) here: unlike the per-batch append (tiny deltas
    // accumulating into a listing tax), a full rebuild writes the
    // whole index once — one file per shuffle partition is the right
    // layout at scale, and compactDue owns any later consolidation
    fresh.write.mode("overwrite")
      .option("compression", "zstd").parquet(tmp.toString)
    graft.plans.CheckpointHygiene.free(fresh)
    val rowsAfter = spark.read.parquet(tmp.toString).count()
    if (rowsAfter != expected) {
      fs.delete(tmp, true)
      sys.error(s"rebuildIndex: rewrite of $indexPath has $rowsAfter gram hashes, " +
        s"expected $expected; artifact left untouched")
    }
    sim.carrySidecars(fs, p, tmp, spark.sessionState.newHadoopConf())
    sim.artifactSwap(fs, p, tmp, old, "gram rebuildIndex")
    (rowsBefore, rowsAfter)
  }

  // ------------------------------------------------------------------
  // COUNTED gram index — the O(deleted-docs) rights-removal variant.
  //
  // The plain index stores distinct gram hashes, so removing one
  // document's contribution is undefined (a hash may be owed to many
  // docs) and forgetDocuments must REBUILD it from the surviving
  // corpus — O(corpus) per forget batch. The counted variant stores a
  // delta log of (h, delta, batch_id) OWNER COUNTS instead: ingest
  // appends +counts for each batch's per-doc-distinct grams, and a
  // removal appends -counts derived from the DELETED docs' own texts
  // (fetched from the winner store BEFORE its fold) — O(deleted docs'
  // text), independent of corpus size. A gram is live while its net
  // count is positive, so grams shared with surviving docs survive a
  // removal by construction and grams owned only by removed docs die.
  //
  // Delta-log conventions (the DeltaLogCompaction contract): rows are
  // batch_id-stamped so at-least-once retries dedupe at read
  // (dedupeRetries on (h, batch_id)); INGEST stamps are non-negative
  // micro-batch ids, REMOVAL stamps are negative (derived from the id
  // set), so a forget re-run is idempotent and can never collide with
  // an ingest batch. Probe cost grows with log length between folds —
  // compactCounted() nets the log under the usual maintenance window,
  // the CMS/HLL delta-log posture.
  //
  // DOC REGISTRY: counts are only sound if each document's ownership
  // enters EXACTLY once — an at-least-once upstream that re-delivers a
  // doc in a DIFFERENT micro-batch would double-count it, and a later
  // forget would then under-decrement (the forgotten doc's unique
  // grams stay live: a silent rights-removal failure the plain
  // content-addressed index is immune to). The artifact therefore
  // carries its own doc-ownership delta log at `<indexPath>/_docs`
  // (underscore path — invisible to the parquet read of the gram
  // rows): admission drops doc_ids already registered-live, and
  // removal (a) only decrements docs that ARE registered — so a store
  // superset of the gram corpus can never over-decrement — and (b)
  // unregisters them, making a legitimate post-fold re-ingest
  // admissible again.
  // ------------------------------------------------------------------

  /** Per-doc-distinct gram ownership deltas for a doc frame: one
    * (h, delta, batch_id) row per distinct gram, delta = signed count
    * of owning docs in this frame.
    */
  private def ownerDeltas(docs: DataFrame, textCol: String, idCol: String,
                          k: Int, sign: Int, stampId: Long): DataFrame = {
    val (_, grams) = Curation.gramTable(docs, textCol, idCol, k)
    grams.select(col("doc_id"), col("h")).distinct()
      .groupBy("h").agg((count(lit(1)) * sign).as("delta"))
      .withColumn("batch_id", lit(stampId))
  }

  private def docsRegistryPath(indexPath: String): String = s"$indexPath/_docs"

  /** Raw rows of a delta-log path ((first, delta, batch_id) shape),
    * empty frame when the path is missing or data-less — the shared
    * bootstrap read under both the gram log and its `_docs` registry.
    */
  private def readDeltaRaw(spark: SparkSession, path: String,
                           firstCol: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
      try spark.read.parquet(path)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        Seq.empty[(Long, Long, Long)].toDF(firstCol, "delta", "batch_id") }
    else Seq.empty[(Long, Long, Long)].toDF(firstCol, "delta", "batch_id")
  }

  /** The registered-live doc ids of a counted index (one column
    * `doc_id`): retry-deduped registry rows netted positive.
    */
  private def registeredLive(spark: SparkSession, indexPath: String): DataFrame =
    graft.sources.DeltaLogCompaction.dedupeRetries(
        readDeltaRaw(spark, docsRegistryPath(indexPath), "doc_id"), Seq("doc_id"))
      .groupBy("doc_id").agg(sum(col("delta")).as("__net"))
      .filter(col("__net") > 0L).select("doc_id")

  /** Append a batch's gram ownership counts (+) to the counted index,
    * ADMISSION-FILTERED through the doc registry: doc_ids already
    * registered-live contribute nothing (first delivery wins — an
    * updated document is forget-then-re-ingest, not a second append).
    * `stampId` must be a non-negative id UNIQUE to this logical batch
    * over the artifact's lifetime (the streaming micro-batch id under
    * a checkpoint — NO default: two different batches silently
    * sharing a stamp would max-collapse at read as if they were
    * retries, losing owner counts, the exact under-decrement the
    * registry cannot catch when the docs differ). Retries of the same
    * batch dedupe at read, and the gram deltas land BEFORE the
    * registry rows so a crash between the two writes re-runs into the
    * stamp dedupe, never a double count; a stamp REUSE across
    * different batches is detected (the re-derived rows disagree with
    * the rows already logged under the stamp) and refuses loudly.
    * Returns distinct grams stamped for the admitted docs.
    */
  def appendToIndexCounted(batch: DataFrame, textCol: String, idCol: String,
                           indexPath: String, k: Int,
                           stampId: Long): Long = {
    val spark = batch.sparkSession
    require(stampId >= 0L,
      "appendToIndexCounted: ingest stamps are non-negative (negative ids are " +
        "reserved for removal deltas)")
    graft.sources.ArtifactHeader.validateOrStamp(spark, indexPath, "gramsc",
      Seq("k" -> k.toString))
    val admitted = batch.join(
        registeredLive(spark, indexPath).withColumnRenamed("doc_id", idCol),
        Seq(idCol), "left_anti")
      .localCheckpoint()
    val deltas = ownerDeltas(admitted, textCol, idCol, k, 1, stampId)
      .localCheckpoint()
    val existing = readDeltaRaw(spark, indexPath, "h")
      .filter(col("batch_id") === stampId).select("h", "delta")
      .localCheckpoint()
    try {
      val n = deltas.count()
      if (n > 0) {
        // stamp-collision detector: rows already logged under this stamp
        // are legitimate ONLY for a crash-retry of this same batch, in
        // which case the re-derived rows are IDENTICAL — any symmetric
        // difference means two different batches share a stamp, and the
        // read-time retry collapse would silently lose owner counts.
        // One batch_id-pushdown scan of the log slice, O(stamp's rows).
        val isRetry = existing.count() > 0L
        if (isRetry) {
          val fresh = deltas.select("h", "delta")
          val collides = existing.join(fresh, Seq("h", "delta"), "left_anti")
            .unionByName(fresh.join(existing, Seq("h", "delta"), "left_anti"))
            .limit(1).count() > 0L
          require(!collides,
            s"appendToIndexCounted: stamp $stampId already logged at $indexPath " +
              "with DIFFERENT gram rows — two batches are sharing one stamp, which " +
              "would silently collapse their owner counts at read. Pass a " +
              "per-batch-unique stamp (the checkpointed micro-batch id).")
          // identical rows present -> this IS the crash-retry; the grams
          // are already durable, fall through to (re-)write the registry
          // half the crash may have lost
        }
        else if (stampId > foldedThroughOf(spark, indexPath))
          deltas.coalesce(1).write.mode("append")
            .option("compression", "zstd").parquet(indexPath)
        // else: FOLDED crash-retry. compactCounted nets the ingest side
        // to batch_id NULL (per-batch stamps are erased) and records the
        // max ingest stamp it folded in the gramsc_fold watermark — a
        // stamp at or below it with no surviving rows means this batch's
        // gram write landed and was folded before the retry ran (a
        // micro-batch must commit before the next starts, so the folded
        // max can only reach this stamp through this batch's own write).
        // A second append would double the owner counts the retry
        // collapse can no longer see — skip the gram write, still repair
        // the registry half below.
      }
      val reg = admitted.select(col(idCol).cast("long").as("doc_id")).distinct()
        .withColumn("delta", lit(1L)).withColumn("batch_id", lit(stampId))
        .localCheckpoint()
      if (reg.count() > 0)
        reg.coalesce(1).write.mode("append")
          .option("compression", "zstd").parquet(docsRegistryPath(indexPath))
      graft.plans.CheckpointHygiene.free(reg)
      n
    } finally {
      // refusal paths above throw BEFORE the frees — release the
      // checkpointed blocks on every exit, not just success
      graft.plans.CheckpointHygiene.free(admitted, deltas, existing)
    }
  }

  /** The fold watermark: the highest ingest stamp whose rows a
    * [[compactCounted]] has netted into stampless (batch_id NULL)
    * rows; -1 when no fold ever ran. Appends consult it to recognize
    * a crash-retry whose original write was folded away.
    */
  private def foldedThroughOf(spark: SparkSession, indexPath: String): Long =
    graft.sources.ArtifactHeader.read(spark, indexPath, "gramsc_fold")
      .flatMap(_.get("folded_through")).map(_.toLong).getOrElse(-1L)

  /** Remove gram ownership (-): the O(deleted-docs) forget step.
    * Restricted to docs that ARE registered-live — a caller handing a
    * SUPERSET of the gram corpus (e.g. a winner store whose gram index
    * only admitted post-curation survivors) cannot over-decrement
    * grams that were never counted — and the matched docs are
    * unregistered, so a legitimate post-fold re-ingest of the same id
    * is admissible again. `stampId` must be NEGATIVE and stable for
    * the removal request, so a re-run of the same forget is a
    * read-time no-op (gram deltas land before registry rows — the
    * crash-retry ordering of the append path). Returns distinct grams
    * decremented.
    */
  def decrementCounted(deletedDocs: DataFrame, textCol: String, idCol: String,
                       indexPath: String, stampId: Long): Long = {
    val spark = deletedDocs.sparkSession
    require(stampId < 0L,
      "decrementCounted: removal stamps are negative (non-negative ids are " +
        "the ingest batch space)")
    val hdr = graft.sources.ArtifactHeader.required(spark, indexPath, "gramsc")
    val registered = deletedDocs.join(
        registeredLive(spark, indexPath).withColumnRenamed("doc_id", idCol),
        Seq(idCol), "left_semi")
      .localCheckpoint()
    val regAtStamp = readDeltaRaw(spark, docsRegistryPath(indexPath), "doc_id")
      .filter(col("batch_id") === stampId).select("doc_id")
      .localCheckpoint()
    val deltas = ownerDeltas(registered, textCol, idCol, hdr("k").toInt,
      -1, stampId).localCheckpoint()
    val existing = readDeltaRaw(spark, indexPath, "h")
      .filter(col("batch_id") === stampId).select("h", "delta")
      .localCheckpoint()
    try {
      val thisDocs = registered.select(col(idCol).cast("long").as("doc_id"))
      // completed-removal detector: registry rows land LAST in this
      // verb, so an unregister row already logged under THIS stamp means
      // a prior removal at this stamp ran to completion — and the doc
      // being registered-LIVE again means it was re-ingested since. This
      // call is then a SECOND removal whose gram/registry rows would
      // dedupe against the first's and silently no-op on the gram
      // surface alone (the Forget residual: a stampless store
      // re-ingesting byte-identical content re-derives the same content
      // stamp). Refuse loudly instead of relying on the caller having
      // read that comment. A crash-retry of an UNFINISHED removal never
      // trips this — its registry rows were not yet written.
      val reusedOnLive = regAtStamp.join(thisDocs, Seq("doc_id"), "left_semi")
        .limit(1).count() > 0L
      require(!reusedOnLive,
        s"decrementCounted: removal stamp $stampId already COMPLETED a removal " +
          s"of document(s) that are registered-live again at $indexPath — the " +
          "doc was re-ingested since, and this second removal's rows would " +
          "dedupe against the first's into a silent no-op. Pass a FRESH stamp " +
          "(forgetDocuments: set removalStamp to the removal request's own id).")
      // stamp shared by a DIFFERENT removal: unregister rows logged
      // under this stamp name docs OUTSIDE this call's set. For every
      // gram the two removals share, their identical (h, -1, stamp)
      // rows max-collapse at read into ONE decrement — the gram nets
      // positive with zero live owners and keeps deduping future
      // ingest forever (a rights-removal leak). Refuse. Compared
      // against the caller's FULL deletedDocs set (not the
      // live-filtered one): a retry of a COMPLETED removal hands the
      // same docs — no longer live, still this request's own — and
      // must stay the documented no-op.
      val otherDocs = regAtStamp.join(
          deletedDocs.select(col(idCol).cast("long").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        .limit(1).count() > 0L
      require(!otherDocs,
        s"decrementCounted: removal stamp $stampId already logged unregister " +
          s"rows for DIFFERENT document(s) at $indexPath — two removal requests " +
          "are sharing one stamp, and their gram deltas would collapse at read, " +
          "under-decrementing every shared gram. Pass a per-request-unique " +
          "stamp (forgetDocuments: removalStamp).")
      val n = deltas.count()
      if (n > 0) {
        // gram rows already at this stamp: IDENTICAL re-derived rows are
        // the crash-retry of THIS removal (registry rows land last) —
        // the decrement is durable, skip the duplicate write and repair
        // the registry half below. DIFFERENT rows are an UNFINISHED
        // other removal sharing the stamp — the same collapse leak as
        // above, caught on the gram surface because its registry rows
        // never landed. (Residual: two byte-identical docs removed by
        // two unfinished requests under one stamp produce identical gram
        // rows and pass this check; the registry doc-set check above
        // catches it as soon as either completes.)
        val isRetry = existing.count() > 0L
        if (isRetry) {
          val fresh = deltas.select("h", "delta")
          val collides = existing.join(fresh, Seq("h", "delta"), "left_anti")
            .unionByName(fresh.join(existing, Seq("h", "delta"), "left_anti"))
            .limit(1).count() > 0L
          require(!collides,
            s"decrementCounted: removal stamp $stampId already logged DIFFERENT " +
              s"gram rows at $indexPath — two removal requests are sharing one " +
              "stamp; their deltas would collapse at read, under-decrementing " +
              "every shared gram. Pass a per-request-unique stamp " +
              "(forgetDocuments: removalStamp).")
        }
        else deltas.coalesce(1).write.mode("append")
          .option("compression", "zstd").parquet(indexPath)
      }
      val reg = registered.select(col(idCol).cast("long").as("doc_id")).distinct()
        .withColumn("delta", lit(-1L)).withColumn("batch_id", lit(stampId))
        .localCheckpoint()
      if (reg.count() > 0)
        reg.coalesce(1).write.mode("append")
          .option("compression", "zstd").parquet(docsRegistryPath(indexPath))
      graft.plans.CheckpointHygiene.free(reg)
      n
    } finally {
      // refusal paths throw BEFORE the frees — release on every exit
      graft.plans.CheckpointHygiene.free(registered, regAtStamp, deltas, existing)
    }
  }

  /** The LIVE gram set of a counted index: retry-deduped, net count
    * positive — the drop-in `priorIdx` frame for
    * [[graft.operators.Curation.substringDedupAgainstIndex]]. Empty
    * frame when nothing was ever ingested.
    */
  def countedLive(spark: SparkSession, indexPath: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val raw =
      if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
        try spark.read.parquet(indexPath)
        catch { case _: org.apache.spark.sql.AnalysisException =>
          Seq.empty[(Long, Long, Long)].toDF("h", "delta", "batch_id") }
      else Seq.empty[(Long, Long, Long)].toDF("h", "delta", "batch_id")
    graft.sources.DeltaLogCompaction.dedupeRetries(raw, Seq("h"))
      .groupBy("h").agg(sum(col("delta")).as("__net"))
      .filter(col("__net") > 0L).select("h")
  }

  /** [[countedLive]] validated against the stamped k (the
    * [[indexFor]] twin).
    */
  def countedLiveFor(spark: SparkSession, indexPath: String, k: Int): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)) {
      val hdr = graft.sources.ArtifactHeader.required(spark, indexPath, "gramsc")
      require(hdr.get("k").contains(k.toString),
        s"counted gram index at $indexPath was built with k=" +
          s"${hdr.getOrElse("k", "?")}, probed with k=$k — rebuild or pass " +
          "the build-time k")
    }
    countedLive(spark, indexPath)
  }

  /** Net the delta log's INGEST side (one (h, net, null) row per
    * gram) while preserving REMOVAL rows (negative stamps) verbatim —
    * the maintenance fold that keeps probe cost from growing with log
    * length. Removal rows must survive compaction: a crash-retry of
    * the same forget re-derives the same negative stamp and relies on
    * finding its (h, stamp) rows to dedupe into a no-op — netting
    * them away would turn the retry into a SECOND decrement and kill
    * grams that surviving docs still own. The cost is that a dead
    * gram keeps its one net row plus its removal rows (bounded by
    * removal volume, never by corpus size) instead of vanishing;
    * liveness is unchanged (net over everything > 0). Returns
    * (rowsBefore, rowsAfter).
    */
  def compactCounted(spark: SparkSession, indexPath: String): (Long, Long) = {
    graft.sources.ArtifactHeader.required(spark, indexPath, "gramsc")
    // a header-stamped but data-less artifact is the legitimate state
    // after a zero-admission first batch (validateOrStamp runs before
    // the first data write) — nothing to fold, not a schema error
    val raw =
      try spark.read.parquet(indexPath)
      catch { case _: org.apache.spark.sql.AnalysisException => return (0L, 0L) }
    val before = raw.count()
    val deduped = graft.sources.DeltaLogCompaction.dedupeRetries(raw, Seq("h"))
      .localCheckpoint()
    def netKeepRemovals(df: DataFrame, keyCol: String): DataFrame = {
      val removals = df
        .filter(col("batch_id").isNotNull && col("batch_id") < 0L)
        .select(keyCol, "delta", "batch_id")
      df.filter(col("batch_id").isNull || col("batch_id") >= 0L)
        .groupBy(keyCol).agg(sum(col("delta")).as("delta"))
        .filter(col("delta") =!= 0L)
        .withColumn("batch_id", lit(null).cast("long"))
        .unionByName(removals)
    }
    val netted = netKeepRemovals(deduped, "h").localCheckpoint()
    val after = netted.count()
    // the fold watermark: netting erases per-batch ingest stamps
    // (batch_id NULL), so a crash-retry replayed AFTER this fold can
    // no longer find its rows and would double-append — record the
    // max ingest stamp folded (monotone across folds) so the append
    // path recognizes the folded retry (see appendToIndexCounted)
    val foldedThrough = {
      val row = raw.filter(col("batch_id").isNotNull && col("batch_id") >= 0L)
        .agg(max(col("batch_id"))).collect()(0)
      val m = if (row.isNullAt(0)) -1L else row.getLong(0)
      math.max(m, foldedThroughOf(spark, indexPath))
    }
    val sim = graft.operators.Similarity
    val (fs, p) = sim.hadoopFs(spark, indexPath)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".gramcfold.tmp")
    val old = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".gramcfold.old")
    fs.delete(tmp, true); fs.delete(old, true)
    netted.write.mode("overwrite").option("compression", "zstd")
      .parquet(tmp.toString)
    // the doc registry is a SUBDIR ("_docs") the file-level sidecar
    // carry cannot copy — net it under the same rule and write it
    // into the rewrite before the swap installs one generation
    val regP = new org.apache.hadoop.fs.Path(docsRegistryPath(indexPath))
    val regExpected =
      if (!fs.exists(regP)) -1L
      else {
        val regNetted = netKeepRemovals(
          graft.sources.DeltaLogCompaction.dedupeRetries(
            spark.read.parquet(regP.toString), Seq("doc_id")),
          "doc_id").localCheckpoint()
        val n = regNetted.count()
        regNetted.write.mode("overwrite").option("compression", "zstd")
          .parquet(new org.apache.hadoop.fs.Path(tmp, "_docs").toString)
        graft.plans.CheckpointHygiene.free(regNetted)
        n
      }
    graft.plans.CheckpointHygiene.free(deduped, netted)
    // verify-before-swap (the rebuildIndex/annTombstoneFold
    // convention — this is a destructive rewrite too): independently
    // re-read what was written and compare to the computed
    // expectation; a mismatch deletes tmp and leaves the live
    // artifact untouched. The gram read skips tmp's `_docs` subdir by
    // the underscore-path rule, so both counts are clean.
    val written = spark.read.parquet(tmp.toString).count()
    if (written != after) {
      fs.delete(tmp, true)
      sys.error(s"compactCounted: rewrite of $indexPath has $written rows, " +
        s"expected $after; artifact left untouched")
    }
    if (regExpected >= 0L) {
      val regWritten = spark.read
        .parquet(new org.apache.hadoop.fs.Path(tmp, "_docs").toString).count()
      if (regWritten != regExpected) {
        fs.delete(tmp, true)
        sys.error(s"compactCounted: rewritten _docs registry of $indexPath has " +
          s"$regWritten rows, expected $regExpected; artifact left untouched")
      }
    }
    sim.carrySidecars(fs, p, tmp, spark.sessionState.newHadoopConf())
    // stamp the watermark INTO the rewrite (overwriting any carried
    // older one) so the swap installs rows + watermark atomically — a
    // crash between swap and a post-swap stamp would leave a folded
    // log with a stale-low watermark, exactly the double-append window
    // the watermark closes
    if (foldedThrough >= 0L)
      graft.sources.ArtifactHeader.write(spark, tmp.toString, "gramsc_fold",
        Seq("folded_through" -> foldedThrough.toString))
    sim.artifactSwap(fs, p, tmp, old, "compactCounted")
    (before, after)
  }

  /** [[dedupStream]] over a COUNTED index: per micro-batch, dedup
    * arriving docs against the live gram set, then admit the batch's
    * ownership counts STAMPED WITH THE MICRO-BATCH ID — exactly the
    * at-least-once retry seam the delta-log convention exists for (a
    * replayed batch re-appends identical (h, delta, batch_id) rows,
    * which [[countedLive]] collapses at read; the plain
    * [[dedupStream]] gets the same idempotence from content
    * addressing, the counted form gets it from the stamps). Removal
    * traffic composes live: a [[decrementCounted]] landing between
    * batches takes effect at the next batch's probe, no fold needed.
    */
  def dedupStreamCounted(docs: Dataset[DocRecord], indexPath: String,
                         sink: DataFrame => Unit,
                         k: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    docs.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        graft.sources.ArtifactHeader.validateOrStamp(spark, indexPath, "gramsc",
          Seq("k" -> k.toString))
        // snapshot the live set once: the dedup and the admission
        // must see the same prior state
        val live = countedLive(spark, indexPath).localCheckpoint()
        sink(Curation.substringDedupAgainstIndex(live, batch, "text", "doc_id", k))
        appendToIndexCounted(batch, "text", "doc_id", indexPath, k,
          stampId = batchId)
        graft.plans.CheckpointHygiene.free(live)
      }
      .start()

  /** Run the stream: per micro-batch, dedup arriving docs against the
    * index (and batch-internally), hand the deduped frame to `sink`,
    * then admit the batch's new grams. Index admission happens AFTER
    * the dedup of the same batch, so a batch never dedups against its
    * own grams twice.
    */
  def dedupStream(docs: Dataset[DocRecord], indexPath: String,
                  sink: DataFrame => Unit,
                  k: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    docs.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // snapshot the index once per batch: the dedup and the
        // admission anti-join must see the same prior set
        val idx = readIndex(spark, indexPath).localCheckpoint()
        sink(Curation.substringDedupAgainstIndex(idx, batch, "text", "doc_id", k))
        val (_, grams) = Curation.gramTable(batch, "text", "doc_id", k)
        val fresh = grams.select("h").distinct()
          .join(idx, Seq("h"), "left_anti")
          .localCheckpoint()
        if (fresh.count() > 0) fresh.write.mode("append").parquet(indexPath)
        graft.plans.CheckpointHygiene.free(idx, fresh)
      }
      .start()
}
