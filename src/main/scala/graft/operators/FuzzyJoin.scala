package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution) — find name pairs within
  * edit distance `maxDist`, without an all-pairs comparison.
  *
  * Reference analog: `ensure_event`'s content-addressed dedup
  * (/root/reference/crates/esvc-core/src/graph.rs) is EXACT identity;
  * entity resolution is its fuzzy sibling, needed when the same
  * real-world entity arrives with spelling variants.
  *
  * Scale shape, in order of leverage:
  *  1. DISTINCT names first — at corpus scale the distinct-name table
  *     is orders of magnitude smaller than the row count, and carries
  *     a per-name row count so nothing is lost.
  *  2. Blocking — candidates are generated only within a block (here:
  *     a caller-supplied key expression, e.g. the last token). An
  *     edit-distance bound implies shared structure; a block function
  *     consistent with the bound trades recall for the quadratic.
  *  3. Deterministic per-block cap — `row_number() <= cap` (runs as
  *     map-side WindowGroupLimit) bounds any hot block, the same guard
  *     the LSH generators use.
  *  4. Verify with `levenshtein` only on surviving candidates.
  */
object FuzzyJoin {

  /** Distinct-name fuzzy pairs: (name_a, name_b, dist, n_a, n_b) with
    * `name_a < name_b`, levenshtein <= maxDist, blocked by `blockExpr`
    * (a SQL expression over column `name`).
    */
  def fuzzyNamePairs(df: DataFrame, nameCol: String, blockExpr: String,
                     maxDist: Int, blockCap: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("block", expr(blockExpr))
    val capped = names
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("block")).orderBy(col("name"))))
      .filter(col("rn") <= blockCap)
      .drop("rn")
    val a = capped.select(col("block"), col("name").as("name_a"), col("n").as("n_a"))
    val b = capped.select(col("block"), col("name").as("name_b"), col("n").as("n_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }
}
