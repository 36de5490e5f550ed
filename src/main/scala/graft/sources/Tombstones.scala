package graft.sources

import org.apache.spark.sql.SparkSession

/** Id-tombstone sidecar for persisted index artifacts — the DELETE
  * half of the append/probe/compact/rebuild lifecycle. A deletion
  * never rewrites the artifact inline (the rows live inside
  * immutable, possibly 100 TB-scale parquet); instead the deleted ids
  * ride next to it as a content-hashed [[ArtifactHeader]] sidecar
  * (`_graft_tombstones_header`) that every probe excludes and a
  * maintenance-window fold eventually makes physical
  * ([[graft.operators.Similarity.annTombstoneFold]]).
  *
  * Deliberately BOUNDED, not a parquet delete-log: the set is read on
  * the driver per probe and excluded via an id predicate or a
  * broadcast anti-join, so it must stay small — [[MaxIds]] refuses
  * outright, and the maintainer's `tombstoneFoldDue` budget folds the
  * set long before that. Heavy sustained deletion volume is served by
  * folding more often (the fold is one artifact rewrite — the same
  * cost class as compaction), not by growing the sidecar.
  *
  * Sidecar rules already in place do the rest: `_`-prefixed files are
  * invisible to parquet listings, [[ArtifactCompaction]] carries them
  * through layout rewrites (tombstones survive compaction — correct,
  * compaction is layout-only), and the rebuild paths REFUSE a live
  * tombstone set (fold first — a retrain that silently re-encodes
  * deleted rows would resurrect them).
  *
  * Reference analog: the reference's event graph is append-only with
  * no removal verb at all (crates/esvc-core/src/graph.rs); deletion
  * is an index-lifecycle need (rights-removal / opt-out at training
  * scale) the Spark engine adds.
  */
object Tombstones {
  val Kind = "tombstones"

  /** Hard bound on the live (unfolded) set: the sidecar is one
    * driver-read line and the exclusion a driver-built predicate /
    * broadcast frame, so it must never grow with the corpus. 65536
    * ids ~= 0.6 MB of sidecar — far past any sane fold budget.
    */
  val MaxIds = 65536

  /** The live tombstoned ids, sorted; empty when none were ever
    * recorded (absence IS the empty state). Content-hash corruption
    * refuses via [[ArtifactHeader.read]].
    */
  def read(spark: SparkSession, path: String): Array[Long] =
    ArtifactHeader.read(spark, path, Kind) match {
      case None => Array.empty[Long]
      case Some(kv) =>
        val raw = kv.getOrElse("ids", "")
        val ids = if (raw.isEmpty) Array.empty[Long] else raw.split(',').map(_.toLong)
        require(kv.get("count").exists(_.toLong == ids.length),
          s"tombstones sidecar at $path disagrees with itself: count=" +
            s"${kv.getOrElse("count", "?")} vs ${ids.length} ids")
        ids
    }

  /** Live tombstone count without parsing the id list — the O(1)
    * number a per-batch due check polls.
    */
  def count(spark: SparkSession, path: String): Long =
    ArtifactHeader.read(spark, path, Kind)
      .flatMap(_.get("count")).map(_.toLong).getOrElse(0L)

  /** Merge `ids` into the live set (idempotent — re-deleting is a
    * no-op) and re-stamp the sidecar. Returns the merged live count.
    *
    * Concurrency contract: the stamp is ATOMIC for readers
    * ([[ArtifactHeader.write]]'s rename), so probes under the shared
    * maintenance lock always see a complete old-or-new set — but two
    * CONCURRENT adds are read-modify-write and would lose one
    * another's ids. Deletes are writer-class mutations of the
    * artifact, exactly like appends: serialize them in the one driver
    * that owns the artifact's maintenance loop. Because a lost delete
    * in a rights-removal verb is a SILENT legal failure, there is also
    * a BEST-EFFORT detector: after the stamp the sidecar is re-read
    * and must contain every id just merged — a clobber landing inside
    * this writer's write->verify window refuses loudly with the
    * dropped ids (re-issue the delete, `add` is idempotent). It is a
    * detector, not a serializer: a clobber landing AFTER the re-read
    * still loses silently (classic TOCTOU), which is why the window
    * lock remains the actual contract.
    */
  def add(spark: SparkSession, path: String, ids: Seq[Long]): Long = {
    val merged = (read(spark, path) ++ ids).distinct.sorted
    require(merged.length <= MaxIds,
      s"tombstone set at $path would grow to ${merged.length} ids (bound $MaxIds): " +
        "the live set is driver-held and probe-excluded, so it must stay small — " +
        "fold it physical first (annTombstoneFold / the maintainer's " +
        "tombstoneFoldDue), then delete the next batch")
    if (merged.nonEmpty) {
      ArtifactHeader.write(spark, path, Kind, Seq(
        "ids" -> merged.mkString(","), "count" -> merged.length.toString))
      val now = read(spark, path).toSet
      val lost = merged.filterNot(now)
      require(lost.isEmpty,
        s"tombstone add at $path lost ${lost.length} ids (e.g. ${lost.take(5).mkString(",")}) " +
          "to a concurrent writer: deletes are read-modify-write and must be " +
          "serialized in the artifact's owning driver (route through the " +
          "maintainer's withAccess) — re-issue this delete, it is idempotent")
    }
    merged.length
  }

  /** Drop the sidecar — the fold's final step, after the rows are
    * physically gone.
    */
  def clear(spark: SparkSession, path: String): Unit =
    ArtifactHeader.delete(spark, path, Kind)

  /** The bounded collect shared by the id-frame delete overloads:
    * first column is the id; refuses past [[MaxIds]] BEFORE
    * collecting more than cap+1 rows (the collect is the point —
    * tombstones are driver-held).
    */
  def collectBounded(ids: org.apache.spark.sql.DataFrame,
                     what: String, foldVerb: String): Seq[Long] = {
    import org.apache.spark.sql.functions.col
    val collected = ids.select(col(ids.columns.head).cast("long"))
      .distinct().limit(MaxIds + 1).collect().map(_.getLong(0))
    require(collected.length <= MaxIds,
      s"$what: the id frame exceeds the $MaxIds live-tombstone bound — " +
        s"delete in folded batches ($foldVerb between them)")
    collected.toSeq
  }
}
