package graft.sources

import graft.operators.EventReplay
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layer event-log compaction: rewrite an append-only log as a
  * durable SNAPSHOT (materialized per-entity states at a checkpoint
  * boundary) plus the TAIL (events after the boundary). Readers replay
  * snapshot ∪ tail and get exactly the full-log result; the historical
  * prefix can then be retired from the hot path.
  *
  * This is the durable flavor of [[graft.operators.StateCache]] (which
  * caches in-session) and the batch analog of the reference's frontier
  * compaction — replace an ever-growing history with bounded derived
  * state (exvc main.rs:232-249; REPL >100-frontier compaction). At
  * 100 TB this is the difference between replaying years of log and
  * replaying one checkpoint table + days of tail.
  *
  * Layout written by [[compact]]:
  * {{{
  *   <dir>/snapshot/        per-user (user_id, state_raw, n_events)
  *   <dir>/tail/            events with event_id >= boundary
  *   <dir>/_boundary/       single-row (boundary, n_snapshot_users)
  * }}}
  */
object EventLogCompaction {
  def compact(spark: SparkSession, sfDir: String, outDir: String, boundary: Long): Unit = {
    val ev = EventReplay.loadEvents(spark, sfDir)
    val prefix = ev.filter(col("event_id") < boundary)
    val snapshot = EventReplay.foldStates(prefix)
      .join(prefix.groupBy("user_id").agg(count(lit(1)).as("n_events")), "user_id")
    snapshot.write.mode("overwrite").parquet(s"$outDir/snapshot")
    ev.filter(col("event_id") >= boundary)
      .write.mode("overwrite").parquet(s"$outDir/tail")
    spark.range(1).select(lit(boundary).as("boundary"))
      .write.mode("overwrite").parquet(s"$outDir/_boundary")
  }

  /** Replay the compacted layout: snapshot states re-enter the fold as
    * pseudo-`signup` events ordered before every tail event (same
    * algebra as StateCache.incremental), so this is the SAME operator
    * as full replay — applied to checkpoint ∪ tail.
    */
  def replay(spark: SparkSession, dir: String): DataFrame = {
    val snapshot = spark.read.parquet(s"$dir/snapshot")
    val tail = spark.read.parquet(s"$dir/tail")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    val pseudo = snapshot.select(
      col("user_id"),
      lit(Long.MinValue).as("ts"),
      lit(-1L).as("event_id"),
      lit("signup").as("event_type"),
      col("state_raw").as("value"))
    EventReplay.foldStates(pseudo.unionByName(tail))
  }

  /** Re-compact an already-compacted layout to a later boundary:
    * fold the tail prefix into the snapshot without ever touching the
    * retired history — compaction is incremental forever.
    */
  def advance(spark: SparkSession, dir: String, outDir: String, newBoundary: Long): Unit = {
    val snapshot = spark.read.parquet(s"$dir/snapshot")
    val tail = spark.read.parquet(s"$dir/tail")
    val tailPrefix = tail.filter(col("event_id") < newBoundary)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    val pseudo = snapshot.select(
      col("user_id"),
      lit(Long.MinValue).as("ts"),
      lit(-1L).as("event_id"),
      lit("signup").as("event_type"),
      col("state_raw").as("value"))
    val newSnapshot = EventReplay.foldStates(pseudo.unionByName(tailPrefix))
      .join(
        pseudo.unionByName(tailPrefix).filter(col("event_id") >= 0)
          .groupBy("user_id").agg(count(lit(1)).as("n_new"))
          .join(snapshot.select(col("user_id"), col("n_events")), Seq("user_id"), "full")
          .select(col("user_id"),
            (coalesce(col("n_events"), lit(0L)) + coalesce(col("n_new"), lit(0L))).as("n_events")),
        "user_id")
    newSnapshot.write.mode("overwrite").parquet(s"$outDir/snapshot")
    tail.filter(col("event_id") >= newBoundary)
      .write.mode("overwrite").parquet(s"$outDir/tail")
    spark.range(1).select(lit(newBoundary).as("boundary"))
      .write.mode("overwrite").parquet(s"$outDir/_boundary")
  }
}
