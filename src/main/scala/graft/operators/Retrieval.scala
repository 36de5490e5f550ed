package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval algebra over ranked lists: reciprocal-rank fusion
  * of a lexical (BM25) and a dense (embedding) retriever, and offline
  * ranking evaluation (recall / nDCG) of an approximate index against
  * its exact ground truth. Both are pure rank algebra — one join and
  * one window over lists that are tiny per query — so they compose
  * with any retriever pair at any corpus scale: the inputs are already
  * top-k-bounded, never the raw corpus.
  */
object Retrieval {
  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009): each list
    * contributes 1/(rrfK + rank) for the documents it retrieved, and
    * documents are re-ranked by the sum. Contributions are nano-unit
    * fixed point (floor(1e9/(rrfK+rank)) as long) so the fused score
    * is an exact BIGINT sum — ranking cannot depend on join order or
    * partitioning, and the DuckDB oracle reproduces it bit-for-bit.
    *
    * Inputs must expose (query_id, id, rank); a full-outer join keeps
    * documents found by only one retriever (the usual RRF contract).
    */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int, rrfK: Int = 60): DataFrame = {
    def contrib(df: DataFrame, out: String): DataFrame =
      df.select(col("query_id"), col("id"),
        floor(lit(1000000000.0) / (lit(rrfK.toDouble) + col("rank").cast("double")))
          .cast("long").as(out))
    val fused = contrib(lex, "lex_e9")
      .join(contrib(dense, "dense_e9"), Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id"),
        (coalesce(col("lex_e9"), lit(0L)) + coalesce(col("dense_e9"), lit(0L))).as("rrf_e9"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rrf_e9").desc, col("id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("rrf_e9"))
  }

  /** Offline ranking evaluation of an approximate retriever against
    * exact ground truth: per query, recall@k and a graded nDCG@k with
    * harmonic discount (gain (k+1-truth_rank), discount 1/position —
    * log-free so every term is exact integer arithmetic, since ln/log2
    * are the one place two engines' doubles can drift by an ulp and
    * flip a hash compare). All sums are BIGINT; the only division
    * producing a double is the final dcg/idcg of two exact integers,
    * rounded to 6 digits.
    *
    * Both inputs expose (query_id, id, rank); `truth` is the exact
    * top-k, `approx` the index under evaluation.
    */
  def evalRanking(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val t = truth.select(col("query_id"), col("id"),
      col("rank").cast("long").as("trank"))
    val a = approx.select(col("query_id"), col("id"),
      col("rank").cast("long").as("arank"))
    // ideal DCG at this k: positions 1..k filled with the best gains
    val idcgE9: Long = (1 to k).map(i => (k + 1 - i).toLong * 1000000000L / i).sum
    a.join(t, Seq("query_id", "id"), "left")
      .withColumn("rel",
        when(col("trank").isNotNull, lit(k.toLong + 1L) - col("trank")).otherwise(lit(0L)))
      .withColumn("term_e9", expr("(rel * CAST(1000000000 AS BIGINT)) div arank"))
      .groupBy("query_id")
      .agg(sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits"),
        sum(col("term_e9")).as("dcg_e9"))
      .select(col("query_id"), col("hits"),
        expr(s"(hits * CAST(1000000 AS BIGINT)) div ${k}").as("recall_e6"),
        round(col("dcg_e9").cast("double") / lit(idcgE9.toDouble), 6).as("ndcg"))
  }
}
