package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the streaming flavor of q_sessionize's
  * 30-minute-gap sessions (batch: lag boundary + running sum).
  *
  * Keyed state holds ONLY the open session per user (id, start, last,
  * count) — constant memory per key, the same bounded-state posture as
  * frontier compaction (reference exvc main.rs:232-249: keep the
  * compressed frontier, not history). A session is emitted exactly
  * once, when the first event beyond its gap closes it; session ids
  * replicate the batch numbering (1-based per user, in time order), so
  * stream output == batch output row-for-row.
  *
  * Requires per-user time-ordered arrival (the staged-ingest contract
  * StreamingIngest establishes: one time-slice per micro-batch).
  */
object StreamingSessionize {
  final case class SessEvent(event_id: Long, user_id: Long, ts_us: Long)
  final case class OpenSession(sessionId: Long, startUs: Long, lastUs: Long, n: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long, duration_us: Long)

  private def foldEvents(uid: Long, evs: Array[SessEvent], state: GroupState[OpenSession],
                         gapUs: Long): Iterator[SessionOut] = {
    val closed = Seq.newBuilder[SessionOut]
    var open = state.getOption.orNull
    // n == 0 is the post-timeout tombstone: no open session, but the
    // per-user numbering continues from sessionId
    var nextId = 1L
    if (open != null && open.n == 0L) { nextId = open.sessionId; open = null }
    evs.foreach { e =>
      if (open == null)
        open = OpenSession(nextId, e.ts_us, e.ts_us, 1L)
      else if (e.ts_us - open.lastUs > gapUs) {
        closed += SessionOut(uid, open.sessionId, open.n, open.lastUs - open.startUs)
        open = OpenSession(open.sessionId + 1, e.ts_us, e.ts_us, 1L)
      } else
        open = open.copy(lastUs = e.ts_us, n = open.n + 1)
    }
    if (open != null) state.update(open)
    closed.result().iterator
  }

  def sessionize(events: Dataset[SessEvent],
                 gapUs: Long = 1800000000L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[OpenSession]) =>
          // micro-batches arrive time-sliced; within one batch sort by
          // (ts, event_id) — the batch query's total order
          foldEvents(uid, it.toArray.sortBy(e => (e.ts_us, e.event_id)), state, gapUs)
      }
  }

  /** Production variant: the open session closes ITSELF once the
    * EVENT-TIME watermark passes its last event + gap — no sentinel
    * events, no unbounded open state. The watermark also bounds how
    * late a stray event may arrive; state per user stays one open
    * session either way.
    */
  def sessionizeEventTime(events: Dataset[SessEvent], gapUs: Long = 1800000000L,
                          lateness: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events.toDF()
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", lateness)
      .as[SessEventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, it, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val open = state.get
            // tombstone (n = 0) keeps the numbering; no timeout armed
            state.update(OpenSession(open.sessionId + 1, 0L, 0L, 0L))
            Iterator.single(SessionOut(uid, open.sessionId, open.n, open.lastUs - open.startUs))
          } else {
            val out = foldEvents(uid,
              it.map(e => SessEvent(e.event_id, e.user_id, e.ts_us)).toArray
                .sortBy(e => (e.ts_us, e.event_id)), state, gapUs)
            // close when the watermark passes last + gap
            state.getOption.foreach { open =>
              if (open.n > 0L)
                state.setTimeoutTimestamp((open.lastUs + gapUs) / 1000L + 1L)
            }
            out
          }
      }
  }

  final case class SessEventT(event_id: Long, user_id: Long, ts_us: Long,
                              event_time: java.sql.Timestamp)
}
