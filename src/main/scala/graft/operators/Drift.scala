package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution monitoring between dataset snapshots.
  *
  * A pipeline that continuously re-crawls/re-ingests needs to know
  * when the data DISTRIBUTION moved, not just which rows changed
  * (that's Curation.snapshotDiff): a shifted length/quality/language
  * mix silently changes what a model trains on.
  */
object Drift {

  /** Population stability index per stratum between two snapshots,
    * over a bucketed metric: psi = sum_bins (pA - pB) * ln(pA / pB),
    * add-one smoothed over the full bin grid so empty bins are
    * defined.
    *
    * Determinism: per-bin contributions are floored to 1e-9 fixed
    * point (`floor(x * 1e9)` as BIGINT) and SUMMED AS LONGS — the
    * distributed sum is partitioning-independent, the only float ops
    * are one division pair and one ln per (stratum, bin) on identical
    * operands in either engine (the dsir/perplexity precedent).
    *
    * Inputs: (stratum, bin) rows per snapshot. `nBins` fixes the grid
    * [0, nBins). Output: (stratum, psi_fp, n_a, n_b).
    */
  def psi(snapA: DataFrame, snapB: DataFrame, stratum: String, bin: String,
          nBins: Int): DataFrame =
    psiFromCounts(binCounts(snapA, stratum, bin), binCounts(snapB, stratum, bin),
      stratum, bin, nBins)

  /** The persistable side of [[psi]]: one (stratum, bin, n) row per
    * populated cell — the REFERENCE histogram a monitoring deployment
    * stores once and compares every arriving batch against, instead
    * of re-scanning the reference corpus per comparison.
    */
  def binCounts(df: DataFrame, stratum: String, bin: String): DataFrame =
    df.groupBy(col(stratum), col(bin)).agg(count(lit(1)).as("n"))

  /** [[psi]] from two PRE-AGGREGATED [[binCounts]] frames — no raw
    * rows touched, so comparing a batch against a 100 TB reference
    * costs the batch's aggregate plus a kilobyte-scale join. [[psi]]
    * is literally `psiFromCounts(binCounts(a), binCounts(b))`, so the
    * inline and artifact paths cannot drift. PSI is symmetric in its
    * two sides ((pA-pB)ln(pA/pB) is invariant under swap), so which
    * side is "reference" is convention only.
    */
  def psiFromCounts(countsA: DataFrame, countsB: DataFrame, stratum: String,
                    bin: String, nBins: Int): DataFrame = {
    val a = countsA.select(col(stratum), col(bin), col("n").as("na"))
    val b = countsB.select(col(stratum), col(bin), col("n").as("nb"))
    val strata = a.select(col(stratum)).unionByName(b.select(col(stratum))).distinct()
    val grid = strata.select(col(stratum),
      explode(sequence(lit(0L), lit(nBins - 1L))).as(bin))
    val joined = grid
      .join(a, Seq(stratum, bin), "left")
      .join(b, Seq(stratum, bin), "left")
      .withColumn("na", coalesce(col("na"), lit(0L)))
      .withColumn("nb", coalesce(col("nb"), lit(0L)))
    val w = Window.partitionBy(col(stratum))
    val withTot = joined
      .withColumn("ta", sum(col("na")).over(w))
      .withColumn("tb", sum(col("nb")).over(w))
      .withColumn("pa", (col("na") + 1).cast("double") / (col("ta") + nBins).cast("double"))
      .withColumn("pb", (col("nb") + 1).cast("double") / (col("tb") + nBins).cast("double"))
      .withColumn("contrib_fp",
        floor((col("pa") - col("pb")) * log(col("pa") / col("pb")) * 1e9).cast("long"))
    withTot.groupBy(col(stratum))
      .agg(sum(col("contrib_fp")).as("psi_fp"),
        max(col("ta")).as("n_a"), max(col("tb")).as("n_b"))
  }

  /** Markov transition counts over an ordered event stream: for each
    * key, (state, next state) via one lead() window, then one count
    * aggregate — the behavioral fingerprint drift is measured against.
    */
  def transitions(events: DataFrame, key: String, time: String, tiebreak: String,
                  state: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tiebreak))
    events
      .withColumn("to_state", lead(col(state), 1).over(w))
      .filter(col("to_state").isNotNull)
      .groupBy(col(state).as("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
  }
}
