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
  *  - Dangling-node mass is dropped rather than redistributed (a global
  *    scalar broadcast per round would be easy but is not needed for a
  *    deterministic centrality ranking); documented divergence from
  *    textbook PR.
  *
  * A fixed iteration count keeps the plan statically known (and the
  * oracle expressible as an unrolled CTE chain).
  */
object PageRank {
  val Scale = 1000000000L

  /** nodes: single column `id`; edges: `src`, `dst`. Returns (id, rank)
    * after `iters` damped rounds, rank in 1e-9 units.
    */
  def pageRankFixed(nodes: DataFrame, edges: DataFrame, iters: Int,
                    dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    val n = nodes.select(col("id"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src")
    val base = (dampDen - dampNum) * Scale / dampDen
    var ranks = n.withColumn("rank", lit(Scale))
    for (_ <- 1 to iters) {
      val msg = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank DIV deg").as("contrib"))
        .groupBy("id").agg(sum(col("contrib")).as("msg"))
      ranks = n.join(msg, Seq("id"), "left")
        .select(col("id"),
          expr(s"${base}L + ${dampNum}L * coalesce(msg, 0L) DIV ${dampDen}L").as("rank"))
    }
    ranks
  }
}
