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
    */
  def jaccardJoin(docs: DataFrame, textCol: String, idCol: String,
                  tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, "need 0 < tau <= 1")
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.tokens(col(textCol))).as("word")).distinct()
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("s"))
    val fr = tok.groupBy("word").agg(count(lit(1)).as("f"))
    // global rarest-first total order (freq, then token) per doc
    val rk = tok.join(fr, "word")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("f"), col("word"))))
    // prefix length |s| - ceil(tau*|s|) + 1, all integer
    val pf = rk.join(sz, "doc_id")
      .filter(col("rn") <= col("s") - expr(s"($tauNum * s + ${tauDen - 1}) DIV $tauDen") + 1)
      .select(col("doc_id"), col("word"))
    val cand = pf.as("a").join(pf.as("b"),
        col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val sa = sz.select(col("doc_id").as("da"), col("s").as("sa"))
    val sb = sz.select(col("doc_id").as("db"), col("s").as("sb"))
    // size filter: tau*|x| <= |y| both ways (J >= tau implies it)
    val sized = cand.join(sa, "da").join(sb, "db")
      .filter(lit(tauNum) * col("sa") <= lit(tauDen) * col("sb") &&
        lit(tauNum) * col("sb") <= lit(tauDen) * col("sa"))
    // verify with per-row array_intersect over the two token arrays:
    // two slim joins (array payload = one doc's distinct tokens), no
    // candidate x token explode, no extra shuffle — ~4x faster than
    // the join-count formulation on a template-heavy corpus
    val sets = tok.groupBy("doc_id").agg(sort_array(collect_list(col("word"))).as("ws"))
    sized
      .join(sets.select(col("doc_id").as("da"), col("ws").as("wa")), "da")
      .join(sets.select(col("doc_id").as("db"), col("ws").as("wb")), "db")
      .withColumn("i", size(array_intersect(col("wa"), col("wb"))).cast("long"))
      // J >= n/d  <=>  (d+n)*i >= n*(|x|+|y|)
      .filter(lit(tauDen + tauNum) * col("i") >= lit(tauNum) * (col("sa") + col("sb")))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("i").as("inter_n"), (col("sa") + col("sb") - col("i")).as("union_n"))
  }
}
