package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank, Pregel-shaped.
  *
  * Reference analog: the dependency graph the reference folds over
  * (/root/reference/crates/esvc-core/src/graph.rs `calculate_dependencies`)
  * is exactly the edge relation here; PageRank is the standard
  * "importance over the dep graph" analytic a pipeline runs on such
  * graphs (e.g. ranking documents by duplication-cluster centrality).
  *
  * Scale + determinism design:
  *  - Each iteration is ONE `groupBy(dst)` message aggregate (map-side
  *    partial combine) + one left join back to the node set — the
  *    aggregate-messages shape; no driver-side collect, no adjacency
  *    materialization beyond the edge list it was given.
  *  - Out-degrees are joined onto the edge list ONCE, outside the loop.
  *  - Ranks are BIGINT, scaled by 1e9: `sum` of longs is exact and
  *    partitioning-independent, where float PR differs run-to-run with
  *    the reduction order. Contributions use integer division
  *    (`rank DIV deg`, remainder dropped deterministically), damping is
  *    `base + num * msg DIV den`.
  *  - Dangling-node mass is redistributed UNIFORMLY (standard PR): per
  *    round, the summed rank of nodes with no out-edge becomes a
  *    per-node share `dang DIV n_nodes` added to every node's message.
  *    Both scalars (the dangling sum and the node count) are ONE-ROW
  *    broadcast aggregates cross-joined in — a BroadcastNestedLoopJoin
  *    over a single row, the repo's scalar-join convention — so the
  *    loop stays fully declarative with no driver collect. With
  *    redistribution the total mass is conserved each round up to the
  *    deterministic integer-division remainders (each node drops < deg
  *    units at the contribution split, < den at damping, and the
  *    dangling share drops < n_nodes units globally) — asserted
  *    per-round by the q_pagerank_mass oracle.
  *
  * A fixed iteration count keeps the plan statically known (and the
  * oracle expressible as an unrolled CTE chain).
  */
object PageRank {
  val Scale = 1000000000L

  /** nodes: single column `id`; edges: `src`, `dst`. Returns (id, rank)
    * after `iters` damped rounds, rank in 1e-9 units.
    *
    * Checkpoint hygiene: rounds 1..iters-2 exist only en route to the
    * final frame — once it first materializes they are dead weight
    * (O(iters x nodes) executor storage pinned for callers who never
    * wanted the per-round frames). A self-unregistering
    * QueryExecutionListener frees exactly those blocks after the first
    * completed action over the returned frame; round iters-1's blocks
    * are KEPT because re-running an action on the result recomputes
    * the last round from them (its lineage is truncated — freeing it
    * would break re-use). Construction stays fully lazy.
    */
  def pageRankFixed(nodes: DataFrame, edges: DataFrame, iters: Int,
                    dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    val rounds = pageRankRounds(nodes, edges, iters, dampNum, dampDen)
    val fin = rounds.last
    val transients = rounds.slice(1, rounds.size - 2)
    if (transients.nonEmpty) {
      val spark = fin.sparkSession
      val target = fin.queryExecution.analyzed
      // round iters-1 — fin's only lineage root once its lazy local
      // checkpoint materializes. Freeing is safe exactly when it has:
      // a SECOND pageRankFixed over identical inputs builds an
      // identical (sameResult) plan in the same session, and firing on
      // ITS action must not unpersist THIS instance's not-yet-built
      // blocks. Plan-object identity (eq) proves it was this instance;
      // otherwise the kept round's RDD being checkpointed proves this
      // instance's chain materialized too, so its transients are dead
      // weight either way.
      val keptRdd = rounds(rounds.size - 2).queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
        case _ => None
      }
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
        private def freeIfFinal(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
          if (!done.get() &&
              (qe.analyzed.exists(_ eq target) ||
                (keptRdd.exists(_.isCheckpointed) &&
                  qe.analyzed.exists(_.sameResult(target)))) &&
              done.compareAndSet(false, true)) {
            graft.plans.CheckpointHygiene.free(transients: _*)
            spark.listenerManager.unregister(this)
          }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          freeIfFinal(qe)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, error: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
    }
    fin
  }

  /** Every round's rank frame, r(0) = uniform through r(iters) — the
    * building block shared by [[pageRankFixed]] (which keeps the last)
    * and the mass-conservation audit (which sums each one).
    */
  def pageRankRounds(nodes: DataFrame, edges: DataFrame, iters: Int,
                     dampNum: Long = 85, dampDen: Long = 100): Seq[DataFrame] = {
    val n = nodes.select(col("id"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src")
    val base = (dampDen - dampNum) * Scale / dampDen
    // node count: one-row broadcast scalar, computed once outside the loop
    val nn = broadcast(n.agg(count(lit(1)).as("n_nodes")))
    var ranks = n.withColumn("rank", lit(Scale))
    val out = Seq.newBuilder[DataFrame]
    out += ranks
    for (i <- 1 to iters) {
      // each round's frame is consumed by BOTH next-round aggregates
      // (messages and the dangling sum) and, under pageRankMass, by a
      // per-round total — checkpoint LAZILY so it computes once and
      // the mass audit stays O(iters), not O(iters^2) re-execution
      val msg = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank DIV deg").as("contrib"))
        .groupBy("id").agg(sum(col("contrib")).as("msg"))
      // dangling mass = ranks of nodes that are no edge's src; its
      // uniform share joins every node as ONE one-row broadcast (the
      // node count rides in the same frame — one exchange per round,
      // not two)
      val dang = broadcast(
        ranks.join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("dang"))
          .crossJoin(nn))
      ranks = n.join(msg, Seq("id"), "left").crossJoin(dang)
        .select(col("id"),
          expr(s"${base}L + ${dampNum}L * (coalesce(msg, 0L) + dang DIV n_nodes)" +
            s" DIV ${dampDen}L").as("rank"))
      if (i < iters) ranks = ranks.localCheckpoint(eager = false)
      out += ranks
    }
    out.result()
  }

  /** Per-round total mass (round, total_rank): with dangling
    * redistribution each total stays within the deterministic
    * remainder budget of n_nodes * Scale — the conservation audit the
    * textbook formulation implies, exposed as an oracle-checkable
    * frame.
    */
  def pageRankMass(nodes: DataFrame, edges: DataFrame, iters: Int,
                   dampNum: Long = 85, dampDen: Long = 100): DataFrame =
    pageRankRounds(nodes, edges, iters, dampNum, dampDen).zipWithIndex
      .map { case (r, i) =>
        r.agg(sum(col("rank")).as("total_rank"))
          .select(lit(i.toLong).as("round"), col("total_rank"))
      }
      .reduce(_.unionByName(_))
}
