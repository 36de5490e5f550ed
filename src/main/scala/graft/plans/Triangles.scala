package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by degree-ordered edge orientation.
  *
  * Reference analog: the event graph's dependency traversals
  * (/root/reference/crates/esvc-core/src/graph.rs:66-72) are
  * hash-joins of a vertex set against an edge map; triangle counting
  * is the same join algebra applied twice — the canonical graph
  * statistic a corpus/link-analysis pipeline reports alongside
  * PageRank and connected components.
  *
  * Scale design: counting triangles by joining the raw undirected
  * edge list against itself enumerates every wedge at every corner —
  * a hub with degree d contributes d^2 join rows, quadratic on
  * exactly the vertices a web graph has most of. Orienting each edge
  * from its lower-(degree, id) endpoint to the higher one (the
  * classic compact-forward / Latapy ordering) makes every wedge
  * enumerable exactly once, at its lowest-degree corner: out-degrees
  * are bounded by O(sqrt(m)) regardless of hub size, so the wedge
  * join stays near-linear on power-law graphs. Both joins are plain
  * hash-equi-joins Catalyst can shuffle-hash or sort-merge; no
  * driver-side adjacency, no crossJoin.
  */
object Triangles {

  /** Per-vertex triangle participation counts over an undirected edge
    * list `(a, b)`. Self-loops are dropped and duplicate edges (either
    * direction) collapse before counting. Vertices in no triangle are
    * absent from the output.
    */
  def triangleCorners(edges: DataFrame): DataFrame = {
    // the deduped edge list feeds the degree count AND two joins; the
    // oriented list feeds three join sides — materialize each ONCE
    // (slim id pairs) instead of re-deriving the upstream pipeline per
    // consumer (un-checkpointed, the physical plan re-scans the source
    // 30x). Blocks are freed by the session owner (CheckpointHygiene).
    // the caller's edge derivation (json extraction, hashing) rides
    // in this first pre-shuffle stage — spread a too-few-splits scan
    // across the cluster (no-op on production multi-split inputs)
    val und = graft.operators.Par.spread(edges)
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("u").as("x")).union(und.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("x").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("deg").as("dv")), "v")
    // orient low (deg, id) -> high (deg, id); ties cannot survive the
    // comparison because ids are distinct after the self-loop filter
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("src"),
      when(fwd, col("v")).otherwise(col("u")).as("dst"))
      .localCheckpoint()
    // wedge at the lowest corner: src -> mid -> far, closed by src -> far.
    // All three sides descend from the same checkpointed frame, so join
    // on EXPLICIT string aliases — dataframe-column equality here would
    // resolve by Spark's self-join disambiguation heuristic and spam
    // "trivially true predicate 'src == src'" warnings.
    val wedges = oriented.select(col("src"), col("dst").as("mid"))
      .join(oriented.select(col("src").as("mid"), col("dst").as("far")), "mid")
      .as("w")
    val tri = wedges.join(oriented.as("c"),
      col("w.src") === col("c.src") && col("w.far") === col("c.dst"))
      .select(col("w.src").as("x"), col("w.mid").as("y"), col("w.far").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("n_triangles"))
  }
}
