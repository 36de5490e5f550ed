package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches. Companion to the linear-counting
  * distinct sketch (TextAnalysis.distinctSketch): where that estimates
  * set cardinality, the count-min sketch estimates per-item frequency
  * in fixed memory — the heavy-hitter primitive for corpus token
  * monitoring at 100 TB.
  *
  * Scale properties that make CMS the right sketch here:
  *  - The counter table is (row, col, c) with c a plain SUM — built by
  *    one map-side-combined aggregate, mergeable across partitions,
  *    shards, days or streams by ADDITION, and deterministic (no
  *    reduction-order sensitivity, unlike Misra-Gries merges).
  *  - Size is d*w counters regardless of corpus size; estimates are
  *    one-sided (est >= exact always; over-count bounded by eN/w with
  *    probability 1 - exp(-d)).
  *  - Hashes are the repo's md5 parity algebra, so the DuckDB oracle
  *    reproduces every counter bit-for-bit.
  */
object Sketches {
  private def cell(i: Int, w: Int) = struct(
    lit(i).as("row"),
    pmod(conv(substring(md5(concat(lit(s"cms$i|"), col("word"))), 1, 15), 16, 10)
      .cast("long"), lit(w.toLong)).as("col"))

  /** Build the d x w counter table from a (word) column: one explode
    * (d cells per token) + one aggregate. Output (row, col, c).
    */
  def cmsBuild(tok: DataFrame, d: Int, w: Int): DataFrame =
    tok.select(explode(array((0 until d).map(cell(_, w)): _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("c"))

  /** Point-query the sketch for each candidate word: est = min over
    * the word's d cells. The sketch is tiny (d*w rows) — the join
    * broadcasts.
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame, d: Int, w: Int): DataFrame =
    candidates.select(col("word"), explode(array((0 until d).map(cell(_, w)): _*)).as("rc"))
      .select(col("word"), col("rc.row").as("row"), col("rc.col").as("col"))
      .join(broadcast(sketch), Seq("row", "col"))
      .groupBy("word").agg(min(col("c")).as("est_n"))

  /** Join-size estimation from two sketches (the optimizer's
    * cardinality primitive): |A JOIN B on k| = sum_k fA(k)*fB(k),
    * estimated as min over hash rows of the per-row counter inner
    * product (AMS/CMS inner-product estimate — one-sided, est >=
    * exact). Computed FROM THE SKETCHES ALONE: deciding join order /
    * broadcast eligibility for two 100 TB inputs costs d*w integers
    * per side, not a scan. Both sketches must share (d, w) — enforced
    * by construction when both come from [[cmsBuild]] with the same
    * parameters.
    */
  def cmsJoinSize(sketchA: DataFrame, sketchB: DataFrame): DataFrame = {
    // Hash rows where the two sketches share no populated cell have a
    // true inner product of 0 and must participate in the min (a sketch
    // built by cmsBuild from a non-empty input populates every row
    // 0..d-1, so the union of observed rows IS the 0..d-1 spine).
    // Without the spine, a disjoint-key pair would drop rows from the
    // min — or return a single NULL when no cells overlap at all.
    val overlap = sketchA.select(col("row"), col("col"), col("c").as("ca"))
      .join(sketchB.select(col("row"), col("col"), col("c").as("cb")),
        Seq("row", "col"))
      .groupBy("row").agg(sum(col("ca") * col("cb")).as("ip"))
    val spine = sketchA.select(col("row"))
      .union(sketchB.select(col("row"))).distinct()
    spine.join(overlap, Seq("row"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("est_join_n"))
  }
}
