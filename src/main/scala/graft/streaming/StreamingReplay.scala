package graft.streaming

import graft.operators.EventReplay
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event-log record (ts = nanos since epoch, matching the batch
  * reader's `nanosAsLong` view of events.parquet).
  */
final case class EventRecord(event_id: Long, ts: Long, user_id: Long,
                             event_type: String, value: Double)

final case class UserState(user_id: Long, state: Double, n_events: Long)

/** Streaming flavor of the ordered replay: the event log as an
  * append-only stream, per-user materialized `Dat` maintained in
  * `GroupState` — Structured Streaming's shape for the reference's
  * state cache (SURVEY §2 OP-6 streaming flavor; the reference itself
  * is batch-only, its append-only log + derived-state model is what
  * maps here).
  *
  * Within a micro-batch, events are folded in causal order
  * `(ts, event_id)`; across batches the running state is the
  * `GroupState`, exactly like the reference's `WorkCache.sts` entry for
  * the growing per-user prefix (workcache.rs:85-102). Frontier
  * compaction (exvc main.rs:232-249) maps to keeping ONLY the running
  * state, not the event history — constant state per key.
  */
object StreamingReplay {
  def replay(events: Dataset[EventRecord]): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserState](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[EventRecord], gs: GroupState[UserState]) =>
          val prev = gs.getOption.getOrElse(UserState(uid, 0.0, 0L))
          var state = prev.state
          var n = prev.n_events
          // causal order within the micro-batch
          batch.toArray.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            state = EventReplay.command(e.event_type)(state, e.value)
            n += 1
          }
          val next = UserState(uid, state, n)
          gs.update(next)
          Iterator.single(next)
      }
  }

  /** Batch-equivalent source helper: read the events table as a
    * (bounded) stream of [[EventRecord]].
    */
  def eventsRecords(spark: SparkSession, sfDir: String): Dataset[EventRecord] = {
    import spark.implicits._
    EventReplay.loadEvents(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventRecord]
  }
}
