package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layer compaction for the append-only DELTA-LOG artifacts
  * the streaming maintainers write (MV partial aggregates, CMS counter
  * deltas, HLL register deltas): rewrite the log to ONE row per key by
  * applying the artifact's own merge algebra, atomically swapping the
  * directory contents. Readers are unchanged — they already re-merge
  * on read, and merging a compacted log is the identical computation
  * over fewer rows (the merge functions are associative, which is
  * exactly why the delta-log design is correct in the first place).
  *
  * Compaction is an OPTIONAL storage job: it bounds artifact size
  * after many micro-batches (n_batches * keys rows -> keys rows), it
  * never changes any answer, and at 100 TB it runs as a periodic
  * partitioned rewrite exactly like any table-maintenance OPTIMIZE.
  *
  * The swap goes through a sibling `.compact.tmp` directory + two
  * renames, so a concurrent reader sees either the old log or the new
  * one, never a half-written mix; a concurrent WRITER must be paused
  * (the streaming maintainers own the artifact — same single-writer
  * contract every table-maintenance job has).
  */
object DeltaLogCompaction {

  /** Exactly-once view of an at-least-once appended STAMPED delta
    * log. foreachBatch delivery is at-least-once: a retry after a
    * partial failure re-runs the same logical batch under the SAME
    * batchId and re-appends identical (batch_id, key, ...) rows —
    * which a sum-merge would silently double-count (max-merged logs
    * like HLL registers are immune; admission-gated artifacts like
    * the band/gram/IVF-PQ indexes anti-join history and are immune
    * too). One dropDuplicates over (batch_id, keys) restores
    * exactly-once — Spark's documented batchId-dedupe pattern, done
    * once at the read seam so every consumer (estimate, rewrite,
    * compaction) inherits it. Rows with no stamp (legacy logs, or
    * compacted rows, which are one-per-key by construction) pass
    * through untouched; a MIXED log written partly before stamping
    * only regains the retry guarantee after compaction.
    *
    * PRECONDITION: batch_id must uniquely identify a LOGICAL batch
    * over the log's lifetime, which holds exactly when the stamping
    * maintainer runs with a checkpointLocation (ids resume across
    * restarts — pass `checkpointDir` to the starters; see
    * [[graft.streaming.StreamingStarters]]). A checkpoint-less
    * maintainer restarted mid-log reuses ids for DIFFERENT batches,
    * and this dedupe would collapse them into an under-count.
    */
  def dedupeRetries(df: org.apache.spark.sql.DataFrame,
                    keys: Seq[String]): org.apache.spark.sql.DataFrame =
    if (!df.columns.contains("batch_id")) df
    else {
      // aggregate form, NOT dropDuplicates: this frame is also
      // injected into already-optimized plans (the MvRewrite rule),
      // where a Deduplicate node can no longer be lowered — max over
      // identical retry copies is the same dedupe as first-row, as a
      // plain Aggregate. Unstamped rows (legacy or compacted — one
      // per key by construction) bypass: distinct legacy batches may
      // legitimately share (null, key).
      val gk = "batch_id" +: keys
      val others = df.columns.filterNot(gk.contains)
      val stamped0 = df.filter(col("batch_id").isNotNull)
      val stamped =
        if (others.isEmpty)
          stamped0.groupBy(gk.map(col): _*)
            .agg(max(lit(1)).as("__one")).drop("__one")
        else
          stamped0.groupBy(gk.map(col): _*)
            .agg(max(col(others.head)).as(others.head),
              others.tail.map(c => max(col(c)).as(c)): _*)
      stamped.select(df.columns.map(col): _*)
        .unionByName(df.filter(col("batch_id").isNull))
    }

  /** Compact `path` to one row per `keys` row, merging every other
    * column with `merges` (e.g. `Map("c" -> sum, "r" -> max)`).
    * Retry-duplicated stamped rows are deduped BEFORE the merge; the
    * compacted rows carry a NULL `batch_id` (unstamped — they are
    * one-per-key by construction), never a real one: a real stamp
    * could collide with a later retry of a batch already folded in.
    * The single-writer pause this job already requires (scaladoc
    * above) is also what makes folding safe at all — a stopped stream
    * has no uncommitted batch left to retry. Returns (rowsBefore,
    * rowsAfter).
    */
  def compact(spark: SparkSession, path: String, keys: Seq[String],
              merges: Map[String, Column => Column]): (Long, Long) = {
    // the counted gram index is a delta log TOO, but NOT this one's
    // algebra: its removal rows (negative stamps) must survive
    // compaction verbatim (a crash-retried forget dedupes against
    // them — netting them away turns the retry into a second
    // decrement) and its `_docs` registry subdir would not survive
    // the swap. Its own fold is
    // [[graft.streaming.StreamingSubstringDedup.compactCounted]];
    // pointing the generic verb at it is always a mistake — refuse.
    require(ArtifactHeader.read(spark, path, "gramsc").isEmpty,
      s"DeltaLogCompaction: $path is a COUNTED gram index (gramsc header) — " +
        "its removal stamps and _docs registry do not survive a generic " +
        "net-per-key rewrite; fold it with StreamingSubstringDedup.compactCounted")
    val df = spark.read.parquet(path)
    val before = df.count()
    val aggs = df.columns.filterNot(keys.contains).map { c =>
      if (c == "batch_id") max(lit(null).cast("long")).as(c)
      else merges.getOrElse(c,
        sys.error(s"DeltaLogCompaction: no merge function for column $c"))(col(c)).as(c)
    }
    val compacted = dedupeRetries(df, keys)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(df.columns.map(col): _*) // original column order
    val after = compacted.count()

    // swap through the path's own Hadoop FileSystem (java.io renames
    // only ever worked on the local disk — the artifact lives wherever
    // the pipeline's storage is)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".compact.tmp")
    val old = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".compact.old")
    fs.delete(tmp, true); fs.delete(old, true)
    compacted.write.mode("overwrite").parquet(tmp.toString)
    // artifact header sidecars (`_graft_<kind>_header` — the CMS/HLL/
    // loghist/MV stamps, plus any foreign sidecar another layer owns)
    // ride inside the artifact directory and would be deleted with
    // `old` below; carry them into the rewrite like every other
    // rewrite path does (ArtifactCompaction.compactFiles, the ANN
    // rebuilds, compactCounted) — losing the header would make the
    // next estimateFrom fail loudly and let a drifted-config writer
    // silently re-stamp, defeating the drift refusal
    graft.operators.Similarity.carrySidecars(fs, p, tmp,
      spark.sessionState.newHadoopConf())
    if (!fs.rename(p, old) || !fs.rename(tmp, p))
      sys.error(s"DeltaLogCompaction: atomic swap failed for $path")
    fs.delete(old, true) // retire the old log
    (before, after)
  }

  /** The three artifact shapes this repo's streaming maintainers
    * write, with their merge algebra.
    */
  def compactHourlyMv(spark: SparkSession, path: String): (Long, Long) =
    compact(spark, path, Seq("hour_bucket", "event_type"),
      Map("cnt" -> (sum(_)), "cents" -> (sum(_))))

  def compactCms(spark: SparkSession, path: String): (Long, Long) =
    compact(spark, path, Seq("row", "col"), Map("c" -> (sum(_))))

  def compactHllRegisters(spark: SparkSession, path: String): (Long, Long) =
    compact(spark, path, Seq("source", "j"), Map("r" -> (max(_))))
}
