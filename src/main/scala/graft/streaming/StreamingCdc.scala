package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming CDC MERGE apply: the batch
  * [[graft.operators.Dimensions.cdcApply]] contract maintained
  * incrementally over an unbounded change stream. `mapGroupsWithState`
  * holds ONLY the winning change per key — (time, seq, op, value) plus
  * a change counter, constant state per key regardless of stream
  * length — and emits the key's current snapshot row after every
  * micro-batch. Consumers read the latest emission per key (update
  * mode); a key whose winner is a delete tombstone surfaces with
  * `op = "D"` so the sink can retract it.
  *
  * The fold is order-insensitive within and across micro-batches
  * (max over the (time, seq) total order), so the final state equals
  * the batch operator's on the same change set no matter how the
  * stream slices it.
  */
object StreamingCdc {
  final case class Change(k: Long, t: Long, seq: Long, op: String, v: Double)
  final case class CdcRow(k: Long, op: String, last_value: Double, n_changes: Long)
  final case class CdcState(t: Long, seq: Long, op: String, v: Double, n: Long)

  def snapshot(changes: Dataset[Change]): Dataset[CdcRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.k)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: Long, rows: Iterator[Change], st: GroupState[CdcState]) =>
          var cur = st.getOption.getOrElse(
            CdcState(Long.MinValue, Long.MinValue, "", 0.0, 0L))
          rows.foreach { r =>
            val wins = r.t > cur.t || (r.t == cur.t && r.seq > cur.seq)
            cur =
              if (wins) CdcState(r.t, r.seq, r.op, r.v, cur.n + 1)
              else cur.copy(n = cur.n + 1)
          }
          st.update(cur)
          CdcRow(k, cur.op, cur.v, cur.n)
      }
  }
}
