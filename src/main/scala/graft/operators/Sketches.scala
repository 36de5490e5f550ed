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

  /** HyperLogLog registers of a token stream, per stratum: 2^b
    * registers, register j = max over the bucket's items of
    * rho(item) where rho = trailing-zero count + 1 of the hash's
    * upper bits (the geometric observable; Flajolet et al. 2007 use
    * leading zeros — trailing zeros of the same uniform bits is the
    * identical geometric variable, and `h & -h` makes it EXACT
    * integer algebra: no log2/double anywhere, so the DuckDB oracle
    * reproduces every register bit-for-bit).
    *
    * Scale shape: one explode + one map-side-combined max aggregate;
    * the register table is at most 2^b rows per stratum regardless of
    * corpus size, and registers merge across partitions, shards, days
    * or streams by MAX — the property linear counting
    * (TextAnalysis.distinctSketch) lacks once its bitmap saturates.
    * Output (source, j, r), sparse: absent j means r = 0.
    */
  def hllRegisters(tok: DataFrame, strataCol: String, b: Int): DataFrame = {
    val m = 1L << b
    tok.select(col(strataCol).as("source"),
        conv(substring(md5(concat(lit("hll|"), col("word"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      // j = low b bits; w = the remaining 60-b uniform bits; rho is
      // the rank of w's lowest set bit (all-zero w saturates at max)
      .select(col("source"), pmod(col("h"), lit(m)).as("j"),
        expr(s"h div $m").as("w"))
      .select(col("source"), col("j"),
        when(col("w") === 0L, lit(61 - b))
          .otherwise(expr("bit_count((w & -w) - 1) + 1")).as("rho"))
      .groupBy("source", "j").agg(max(col("rho")).as("r"))
  }

  /** Cardinality estimate from a (source, j, r) register table: the
    * harmonic-mean estimator with the standard small-range linear-
    * counting fallback. The indicator sum Z = sum_j 2^(-r_j) is kept
    * EXACT by scaling: 2^(R - r_j) as BIGINT with R = 61-b (the max
    * rank), empty registers contributing 2^R each — the only floats
    * are the two final constant-folded divisions, written identically
    * in the oracle. Returns (source, registers_set, estimate,
    * alpha-corrected raw) rows.
    */
  def hllEstimate(regs: DataFrame, b: Int): DataFrame = {
    val m = 1L << b
    val bigR = 61 - b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // the full numerator alpha * m^2 * 2^R as ONE Scala double — its
    // shortest decimal form is pasted into the oracle SQL, so both
    // engines divide the same constant by the same integer
    val num = alpha * m.toDouble * m.toDouble * math.pow(2.0, bigR)
    regs.groupBy("source")
      .agg(count(lit(1)).as("nz"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($bigR - r AS INT))")).as("s_nz"))
      .select(col("source"), col("nz").as("registers_set"),
        (col("s_nz") + (lit(m) - col("nz")) * lit(1L << bigR)).as("z_scaled"),
        (lit(m) - col("nz")).as("v"))
      .select(col("source"), col("registers_set"),
        round(
          when(col("v") > 0L &&
              lit(num) / col("z_scaled").cast("double") <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
            .otherwise(lit(num) / col("z_scaled").cast("double")), 6)
          .as("estimate"))
  }

  /** The numerator constant [[hllEstimate]] bakes in — exposed so the
    * oracle SQL string interpolates the IDENTICAL double literal.
    */
  def hllNumerator(b: Int): Double = {
    val m = 1L << b
    (0.7213 / (1.0 + 1.079 / m)) * m.toDouble * m.toDouble * math.pow(2.0, 61 - b)
  }

  /** Per-source distinct-cardinality HLL over a text column, plus an
    * `__union__` row estimated from the per-source registers ALONE
    * (max-merge — no second corpus scan): the cross-shard merge path
    * a 100 TB deployment runs nightly, made visible in one result.
    * Exact per-source counts ride along as the accuracy report;
    * the union row's exact count is over all strata.
    */
  def hllDistinct(docs: DataFrame, textCol: String, strataCol: String,
                  b: Int = 10): DataFrame = {
    val tok = docs.select(col(strataCol).as("source"),
      explode(graft.operators.Dedup.tokens(col(textCol))).as("word"))
    val regs = hllRegisters(tok, "source", b)
    val union = regs.groupBy("j").agg(max(col("r")).as("r"))
      .select(lit("__union__").as("source"), col("j"), col("r"))
    val est = hllEstimate(regs.unionByName(union), b)
    val exact = tok.select(col("source"), col("word"))
      .union(tok.select(lit("__union__").as("source"), col("word")))
      .groupBy("source").agg(count_distinct(col("word")).as("n_exact"))
    est.join(exact, "source")
      .select(col("source"), col("registers_set"), col("estimate"), col("n_exact"))
  }

  /** Log-spaced quantile histogram — the RELATIVE-error sibling of
    * [[TextAnalysis.histQuantiles]]'s fixed-width bins: bucket =
    * (binary length of v, next 3 bits), i.e. 8 sub-buckets per octave,
    * so bucket width is <= 12.5% of the value everywhere from 8 to
    * 2^62 — a fixed-width histogram must choose between resolution at
    * the head and coverage of the tail, a log histogram has both
    * (HDR-histogram / DDSketch shape). Values 0..7 get exact unit
    * buckets.
    *
    * Still one map-side-combined aggregate of bounded size (<= 8 + 59
    * octaves * 8 buckets per stratum), mergeable by addition, and —
    * unlike t-digest/GK — deterministic integer algebra end to end:
    * the binary length is `length(bin(v))` in Spark and
    * `length(printf('%b', v))` in DuckDB, the sub-bucket and lower
    * bound use floor-division by an exact power of two, so the oracle
    * reproduces every bucket and every reported quantile edge
    * bit-for-bit. Returns, per stratum and requested per-mille
    * quantile, the lower edge of the bucket holding that rank.
    */
  def logHistQuantiles(rows: DataFrame, valueCol: String, strataCol: String,
                       quantilesPermille: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = rows.select(col(strataCol).as("source"),
        col(valueCol).cast("long").as("v"))
      .filter(col("v") >= 0L)
    val hist = base
      .select(col("source"),
        when(col("v") < 8L, col("v")).otherwise(expr(
          "length(bin(v)) * 8 + CAST(floor(v / power(2, length(bin(v)) - 4)) AS BIGINT) % 8"))
          .as("bucket"),
        when(col("v") < 8L, col("v")).otherwise(expr(
          "(8 + CAST(floor(v / power(2, length(bin(v)) - 4)) AS BIGINT) % 8)" +
            " * CAST(power(2, length(bin(v)) - 4) AS BIGINT)"))
          .as("lo"))
      .groupBy("source", "bucket", "lo").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("total", sum(col("c")).over(Window.partitionBy(col("source"))))
      .localCheckpoint()
    val qs = quantilesPermille.map { p =>
      cum.filter(col("cum") >= expr(s"(total * $p + 999) div 1000"))
        .groupBy("source").agg(min(struct(col("bucket"), col("lo"))).as("b"))
        .select(col("source"), lit(p.toLong).as("p_permille"),
          col("b.lo").as("q_lo"))
    }
    qs.reduce(_.union(_))
  }

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
