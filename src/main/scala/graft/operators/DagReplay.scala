package graft.operators

import graft.plans.GraphOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** General-DAG distributed replay — OP-4 ∘ OP-6 (`run_foreach_recursively`,
  * /root/reference/crates/esvc-core/src/workcache.rs:110-117) for event
  * logs whose dependency structure is a real DAG, not just a per-entity
  * chain: linearize with Kahn rounds, then fold per entity in
  * deterministic `(round, id)` order — the reference's `(round, hash)`
  * determinism (graph.rs:85-129) with the same one-shuffle streaming
  * fold as [[EventReplay]].
  *
  * [[EventReplay.replayPerUser]] is the degenerate chain case (rounds
  * collapse to the window order); the two are equivalence-tested on
  * chain-shaped edges.
  */
object DagReplay {
  /** Replay `events(entity, id, event_type, value)` whose causal order
    * is given by `edges(id, dep)`. Returns (entity, state_raw).
    */
  def materialize(events: DataFrame, edges: DataFrame,
                  command: String => (Double, Double) => Double = EventReplay.command): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val rounds = GraphOps.topoRounds(events.select(col("id")), edges)
    val ordered = events.join(rounds, "id")
      .select(col("entity"), col("round"), col("id"), col("event_type"), col("value"))
      .repartition(col("entity"))
      .sortWithinPartitions(col("entity"), col("round"), col("id"))
    ordered.mapPartitions { rows: Iterator[Row] =>
      new Iterator[(Long, Double)] {
        private var pending: Option[(Long, Double)] = None
        private var cur = Option.empty[Long]
        private var state = 0.0
        private def advance(): Unit = {
          while (pending.isEmpty && rows.hasNext) {
            val r = rows.next()
            val ent = r.getLong(0)
            if (cur.isEmpty) { cur = Some(ent); state = 0.0 }
            else if (cur.get != ent) { pending = Some((cur.get, state)); cur = Some(ent); state = 0.0 }
            state = command(r.getString(3))(state, r.getDouble(4))
          }
          if (pending.isEmpty && !rows.hasNext && cur.nonEmpty) {
            pending = Some((cur.get, state)); cur = None
          }
        }
        override def hasNext: Boolean = { advance(); pending.nonEmpty }
        override def next(): (Long, Double) = { advance(); val p = pending.get; pending = None; p }
      }
    }.toDF("entity", "state_raw")
  }
}
