package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join (Jaccard >= tau) via prefix
  * filtering — the PPJoin-family algorithm (Chaudhuri et al. "A
  * Primitive Operator for Similarity Joins", Xiao et al. PPJoin;
  * public literature): where MinHash-LSH (Dedup.nearDupPairs) trades
  * recall for speed, this finds EVERY qualifying pair.
  *
  * Why it scales:
  *  - Two sets with Jaccard >= tau must share a token within the
  *    first `|s| - ceil(tau*|s|) + 1` of their tokens under ANY global
  *    order; ordering by ascending global frequency makes those
  *    prefix tokens the RAREST ones, so candidate buckets (keyed by
  *    prefix token) are small by construction — the frequency order
  *    is itself the hot-bucket guard.
  *  - Candidates carry (id, id) only; token payloads re-join at
  *    verify, and a size filter (tau*|x| <= |y| cross-multiplied)
  *    prunes first.
  *  - The threshold is a RATIONAL tauNum/tauDen and every test is
  *    integer cross-multiplication — no float epsilon, oracle-exact.
  *
  * On duplicate-heavy corpora run exact dedup first (as
  * q_curation_full does before near-dup): k identical docs share all
  * prefix tokens and legitimately produce k*(k-1)/2 result pairs —
  * that is the answer, not a blow-up.
  */
object SetSimJoin {

  /** All pairs (doc_a < doc_b) with |A n B| / |A u B| >= tauNum/tauDen
    * over distinct-token sets of `textCol`. Output: doc_a, doc_b,
    * inter_n, union_n.
    *
    * Composed from package-private stage builders ([[tokStage]] →
    * [[prefixStage]] → [[candStage]] → [[setsStage]]/[[verifyStage]])
    * so the stage-timing diagnostic ([[graft.SetsimProbe]]) times THE
    * SAME DataFrames this operator ships — a probe that re-derived the
    * algebra would silently drift when the operator changes.
    */
  def jaccardJoin(docs: DataFrame, textCol: String, idCol: String,
                  tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, "need 0 < tau <= 1")
    val tok = tokStage(docs, textCol, idCol)
    val pf = prefixStage(tok, tauNum, tauDen)
    val cand = candStage(pf, tauNum, tauDen)
    verifyStage(cand, setsStage(tok), tauNum, tauDen)
  }

  /** Distinct (doc_id, word) token stream. The tokenize+explode is
    * the join's one map-heavy pre-shuffle stage and feeds three
    * consumers — spread a too-few-splits scan (single-row-group
    * files) across the cluster first; no-op on production
    * multi-split inputs.
    */
  private[graft] def tokStage(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    Par.spread(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("word")).distinct()

  /** Prefix-token table (doc_id, word, rn, s): each doc's tokens in
    * the global rarest-first order, kept only within the standalone
    * prefix `|s| - ceil(tau*|s|) + 1`.
    */
  private[graft] def prefixStage(tok: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("s"))
    val fr = tok.groupBy("word").agg(count(lit(1)).as("f"))
    // global rarest-first total order (freq, then token) per doc
    val rk = tok.join(fr, "word")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("f"), col("word"))))
    // prefix length |s| - ceil(tau*|s|) + 1, all integer; keep (rn, s)
    // so the candidate join can test positions and sizes in-place
    rk.join(sz, "doc_id")
      .filter(col("rn") <= col("s") - expr(s"($tauNum * s + ${tauDen - 1}) DIV $tauDen") + 1)
      .select(col("doc_id"), col("word"), col("rn"), col("s"))
  }

  /** Surviving candidate pairs (da < db, sa, sb, alpha, ub) from the
    * prefix table — the PPJoin candidate join plus the positional
    * upper-bound prune.
    *
    * PPJoin refinements, all inside the candidate join so pruned
    * collisions never reach the pair-dedup shuffle:
    *  - length filter (tau*|x| <= |y| both ways; J >= tau implies it)
    *    moved from post-candidate to the join condition,
    *  - pair-tight prefix: with alpha = ceil(tau/(1+tau)*(sa+sb)) the
    *    shared token must sit within the first s - alpha + 1 tokens of
    *    BOTH docs (tighter than each doc's standalone prefix),
    *  - positional filter: a token shared at positions (pa, pb) bounds
    *    the overlap by min(pa-1, pb-1) [tokens before it in the global
    *    order] + 1 + min(sa-pa, sb-pb) [tokens after it]; a pair whose
    *    BEST bound over all prefix collisions is < alpha cannot reach
    *    J >= tau. (rn is a position in the same (f, word) total order
    *    for every doc, so cross-doc position arithmetic is sound.)
    */
  private[graft] def candStage(pf: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    // asymmetric index prefix (PPJoin's self-join refinement): order
    // records by (size, id); the probing side `a` keeps the full
    // prefix, but the indexed (smaller) side `b` only needs
    // |s| - ceil(2*tau/(1+tau)*|s|) + 1 tokens, because any partner at
    // least as large forces alpha >= ceil(2*tau/(1+tau)*|b|). At
    // tau=0.95 that halves the indexed prefix — collision buckets
    // shrink roughly quadratically in the hot templates.
    val pfIdx = pf.filter(col("rn") <=
      col("s") - expr(s"((2 * $tauNum) * s + ${tauNum + tauDen - 1}) DIV ${tauNum + tauDen}") + 1)
    val sa = col("a.s"); val sb = col("b.s")
    val pa = col("a.rn"); val pb = col("b.rn")
    val aId = col("a.doc_id"); val bId = col("b.doc_id")
    val alpha = expr(s"($tauNum * (a.s + b.s) + ${tauNum + tauDen - 1}) DIV ${tauNum + tauDen}")
    val ub = least(pa, pb) + least(sa - pa, sb - pb)
    pf.as("a").join(pfIdx.as("b"),
        col("a.word") === col("b.word") &&
        (sb < sa || (sb === sa && bId < aId)) &&
        lit(tauNum) * sa <= lit(tauDen) * sb &&
        lit(tauNum) * sb <= lit(tauDen) * sa &&
        pa <= sa - alpha + 1 && pb <= sb - alpha + 1)
      .select(
        // output contract stays id-ordered regardless of size order
        when(aId < bId, aId).otherwise(bId).as("da"),
        when(aId < bId, bId).otherwise(aId).as("db"),
        when(aId < bId, sa).otherwise(sb).as("sa"),
        when(aId < bId, sb).otherwise(sa).as("sb"),
        alpha.as("alpha"), ub.as("ub"))
      // the bound holds for EVERY shared token, so the pair's tightest
      // (minimum) bound is valid — prune when even it cannot reach alpha
      .groupBy("da", "db", "sa", "sb", "alpha")
      .agg(min(col("ub")).as("ub"))
      .filter(col("ub") >= col("alpha"))
  }

  /** Per-doc sorted distinct-token arrays for the verify joins. */
  private[graft] def setsStage(tok: DataFrame): DataFrame =
    tok.groupBy("doc_id").agg(sort_array(collect_list(col("word"))).as("ws"))

  /** Exact-Jaccard verification of the candidates: two slim joins
    * (array payload = one doc's distinct tokens), no candidate x token
    * explode, no extra shuffle — ~4x faster than the join-count
    * formulation on a template-heavy corpus. The intersect itself is
    * the native zero-allocation merge walk over the sorted arrays
    * (SortedIntersectExpr) — array_intersect builds a hash set per
    * candidate PAIR, which is the allocation bill the sf10 soak
    * measured dominating the verify stage.
    */
  private[graft] def verifyStage(cand: DataFrame, sets: DataFrame,
                                 tauNum: Int, tauDen: Int): DataFrame =
    cand
      .join(sets.select(col("doc_id").as("da"), col("ws").as("wa")), "da")
      .join(sets.select(col("doc_id").as("db"), col("ws").as("wb")), "db")
      .withColumn("i", graft.functions.SortedIntersectCol(col("wa"), col("wb")))
      // J >= n/d  <=>  (d+n)*i >= n*(|x|+|y|)
      .filter(lit(tauDen + tauNum) * col("i") >= lit(tauNum) * (col("sa") + col("sb")))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("i").as("inter_n"), (col("sa") + col("sb") - col("i")).as("union_n"))
}
