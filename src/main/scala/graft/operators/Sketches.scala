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
  // All d cell columns slice ONE md5 (disjoint 7-hex-char windows =
  // independent 28-bit values), instead of d salted md5s: the md5 is a
  // common subexpression, so whole-stage codegen computes it once per
  // token — measured 31 s -> 8 s on the 100x heavy-hitters soak, where
  // ~230M salted digests were the whole bill. Oracles mirror the
  // slicing verbatim.
  private def cell(i: Int, w: Int) = struct(
    lit(i).as("row"),
    pmod(conv(substring(md5(concat(lit("cms|"), col("word"))), 1 + 7 * i, 7), 16, 10)
      .cast("long"), lit(w.toLong)).as("col"))

  // an md5 has 32 hex chars = four disjoint 7-char windows (+4 spare):
  // row 4 would get a 16-bit window and rows >= 5 an EMPTY substring
  // (conv -> null, rows silently vanish from estimate joins), so the
  // public d parameter is hard-bounded rather than silently degraded
  private def requireD(d: Int): Unit =
    require(d >= 1 && d <= 4,
      s"CMS depth d=$d out of range: the single-md5 cell slicing carries exactly " +
        "four independent 28-bit windows (d in 1..4); deeper tables need per-row " +
        "salted digests, which this builder deliberately avoids (one md5 per token)")

  /** Build the d x w counter table from a (word) column: one explode
    * (d cells per token) + one aggregate. Output (row, col, c).
    * Streaming-safe (a single aggregate). For BATCH builds prefer
    * [[cmsBuildCounted]] over a word histogram: counters are sums over
    * words, so aggregating tokens per word FIRST (map-side combine)
    * shrinks the cell explode from per-occurrence to per-distinct-word
    * — measured 25 s -> ~4 s on the 100x heavy-hitters soak.
    */
  def cmsBuild(tok: DataFrame, d: Int, w: Int): DataFrame = {
    requireD(d)
    tok.select(explode(array((0 until d).map(cell(_, w)): _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("c"))
  }

  /** [[cmsBuild]] from an already-aggregated (word, n) histogram —
    * identical counters (cell counts are sums over the cell's words),
    * with the explode bounded by VOCABULARY size instead of corpus
    * token count.
    */
  def cmsBuildCounted(wordCounts: DataFrame, d: Int, w: Int): DataFrame = {
    requireD(d)
    wordCounts.select(explode(array((0 until d).map(cell(_, w)): _*)).as("rc"), col("n"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(sum(col("n")).as("c"))
  }

  /** Merge persisted CMS counter tables — the day-over-day frequency
    * rollup: counters merge by ADDITION, so the merged artifact is
    * bit-identical to one batch build over the combined corpus
    * (what the q_cms_sketch_merge oracle gates against a full-corpus
    * DuckDB rebuild). All inputs must share the (d, w) hash shape —
    * carried by the delta log's header when they come from
    * [[graft.streaming.StreamingCms]] (whose `readSketch` is this
    * merge applied to one artifact's delta rows).
    */
  def cmsMergeSketches(parts: DataFrame*): DataFrame =
    parts.map(_.select(col("row"), col("col"), col("c")))
      .reduce(_.unionByName(_))
      .groupBy("row", "col").agg(sum(col("c")).as("c"))

  /** Point-query the sketch for each candidate word: est = min over
    * the word's d cells. The sketch is tiny (d*w rows) — the join
    * broadcasts.
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame, d: Int, w: Int): DataFrame = {
    requireD(d)
    candidates.select(col("word"), explode(array((0 until d).map(cell(_, w)): _*)).as("rc"))
      .select(col("word"), col("rc.row").as("row"), col("rc.col").as("col"))
      .join(broadcast(sketch), Seq("row", "col"))
      .groupBy("word").agg(min(col("c")).as("est_n"))
  }

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
    * bound use integer division by a shifted power of two (no value
    * ever passes through a double, so the 12.5% width contract holds
    * for the FULL non-negative long range, not just below 2^53), so
    * the oracle reproduces every bucket and every reported quantile
    * edge bit-for-bit. Returns, per stratum and requested per-mille
    * quantile, the lower edge of the bucket holding that rank.
    */
  def logHistQuantiles(rows: DataFrame, valueCol: String, strataCol: String,
                       quantilesPermille: Seq[Int]): DataFrame =
    logHistQuantilesFromSketch(logHistSketch(rows, valueCol, strataCol),
      quantilesPermille)

  /** The PERSISTABLE log-histogram sketch behind [[logHistQuantiles]]:
    * one `(source, bucket, lo, c)` row per populated bucket — at most
    * 8 + 59 octaves * 8 sub-buckets per stratum regardless of input
    * size, so a 100 TB corpus's quantile state is kilobytes on disk.
    * Unlike the CMS/HLL/band artifacts there are NO shape parameters
    * to carry in a header: the bucket algebra is fixed and universal,
    * so any two loghist artifacts over the same measured quantity
    * merge exactly (which quantity/units a sketch describes is the
    * caller's schema contract, as with KMV).
    */
  def logHistSketch(rows: DataFrame, valueCol: String,
                    strataCol: String): DataFrame =
    // the sub-bucket divisor is an integer SHIFT, not a double power:
    // v/power(2,...) casts v to double, whose 53-bit mantissa
    // mis-buckets values >= 2^53 near octave boundaries (v = 2^61-1
    // rounds UP to 2^61 and lands in sub-bucket 0 instead of 7) —
    // with shifts the algebra is exact integers for the full
    // non-negative long range
    rows.select(col(strataCol).as("source"),
        col(valueCol).cast("long").as("v"))
      .filter(col("v") >= 0L)
      .select(col("source"),
        when(col("v") < 8L, col("v")).otherwise(expr(
          "length(bin(v)) * 8 + (v div shiftleft(CAST(1 AS BIGINT), length(bin(v)) - 4)) % 8"))
          .as("bucket"),
        when(col("v") < 8L, col("v")).otherwise(expr(
          "(8 + (v div shiftleft(CAST(1 AS BIGINT), length(bin(v)) - 4)) % 8)" +
            " * shiftleft(CAST(1 AS BIGINT), length(bin(v)) - 4)"))
          .as("lo"))
      .groupBy("source", "bucket", "lo").agg(count(lit(1)).as("c"))

  /** Merge persisted log-histogram sketch artifacts — the
    * day-over-day quantile rollup: counters merge by ADDITION (sum is
    * associative and commutative), so the merged artifact is
    * BIT-IDENTICAL to a sketch built from the combined corpus. That
    * mergeability theorem is what the q_loghist_sketch_merge oracle
    * gates: Spark merges two half-corpus artifacts, DuckDB rebuilds
    * every bucket from the whole corpus. The KMV min-merge convention
    * ([[kmvMergeSketches]]) applied to the quantile family.
    */
  def logHistMergeSketches(parts: DataFrame*): DataFrame =
    parts.map(_.select(col("source"), col("bucket"), col("lo"), col("c")))
      .reduce(_.unionByName(_))
      .groupBy("source", "bucket", "lo").agg(sum(col("c")).as("c"))

  /** Quantile edges from the PERSISTED sketch alone — no corpus scan;
    * [[logHistQuantiles]] is literally
    * `logHistQuantilesFromSketch(logHistSketch(...))`, so the inline
    * and artifact paths cannot drift.
    */
  def logHistQuantilesFromSketch(sketch: DataFrame,
                                 quantilesPermille: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch
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

  /** 2^60, the KMV hash-space size — exactly representable in DOUBLE,
    * so `(k-1) * M / h_k` is a single IEEE division both engines
    * compute identically.
    */
  private val KmvM = 1152921504606846976.0

  /** K-minimum-values distinct sketch per stratum: the k smallest
    * md5-derived 60-bit hash values of the stratum's distinct tokens
    * (Bar-Yossef et al. 2002; the theta-sketch family's base form).
    * Where [[TextAnalysis.distinctSketch]] (linear counting) and
    * [[hllRegisters]] estimate one set's cardinality, the KMV sketch
    * additionally supports SET OPERATIONS between sketches
    * ([[kmvSetOps]]) — k rows per stratum answer "how many distinct
    * tokens do two crawls share" with NO join between the corpora.
    *
    * Scale shape: one explode + distinct, then the rank filter runs as
    * a partial map-side WindowGroupLimit (each map task forwards at
    * most k rows per stratum — the q_sample_k pattern), so the shuffle
    * carries k x strata rows regardless of corpus size. Deterministic
    * (md5, no RNG), so the DuckDB oracle rebuilds every sketch row.
    */
  private def kmvItems(docs: DataFrame, textCol: String, strataCol: String,
                       shingleN: Int): DataFrame =
    // the shingle/token explode + md5 downstream is the sketch's one
    // map-heavy stage — spread it across the cluster when the scan
    // produced fewer splits than slots (single-row-group files);
    // no-op on production multi-split inputs
    Par.spread(docs.select(col(strataCol).as("source"), col(textCol)))
      .select(col("source"),
        explode(if (shingleN > 0) Dedup.shingles(col(textCol), shingleN)
                else Dedup.tokens(col(textCol))).as("word"))

  def kmvSketch(docs: DataFrame, textCol: String, strataCol: String,
                k: Int = 256, shingleN: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    kmvItems(docs, textCol, strataCol, shingleN)
      .select(col("source"),
        conv(substring(md5(concat(lit("kmv|"), col("word"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      // the build-time k RIDES IN the artifact: a sketch's rows alone
      // cannot reveal whether a stratum with n rows is complete (n
      // distinct items) or truncated (n == build k < true cardinality),
      // so a consumer handed only (source, h) must trust its caller —
      // persisting k makes the estimator's precondition checkable
      .select(col("source"), col("h"), col("rn"), lit(k).as("k"))
  }

  /** Set-operation ESTIMATES for every unordered stratum pair from
    * persisted KMV sketch rows ALONE — the artifact path: input is the
    * `(source, h[, rn])` table [[kmvSketch]] emits (persisted
    * yesterday, read back today — the `nearDupAgainst` convention),
    * and NOTHING here touches a corpus. Union cardinality comes from
    * the kth smallest value of the MERGED sketch (`(k-1) * M / h_k`),
    * Jaccard from the fraction of those k present in BOTH sketches,
    * intersection from their product; a merged sketch under k values
    * IS the union hash set and the estimates are exact.
    *
    * Scale shape: every frame here is at most k rows per stratum /
    * per pair — at 100 TB cross-crawl overlap costs a broadcast join
    * over kilobytes, not a corpus scan. Output: (src_a, src_b, est_a,
    * est_b, est_union, est_inter, jaccard_est).
    */
  def kmvSetOpsFromSketches(sketches: DataFrame, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Artifact-k defenses (a k mismatch is SILENT otherwise: a sketch
    // built with k_build < k has every truncated stratum land in the
    // n < k 'exact' branch, reporting k_build as a cardinality):
    //  - `rn` present: subset each stratum to its k smallest — the k
    //    smallest of a (k_build >= k)-sketch ARE a valid k-sketch, so
    //    a SMALLER caller k is exact-by-construction, never an error;
    //  - `k` present (kmvSketch persists it): refuse at execution time
    //    when the artifact's build k is smaller than the caller's (the
    //    un-detectable-from-rows case) or mixed across rows. Bare
    //    (source, h) frames keep the documented caller contract:
    //    caller k must equal build k.
    val trimmed =
      if (sketches.columns.contains("rn")) sketches.filter(col("rn") <= k)
      else sketches
    val hasK = sketches.columns.contains("k")
    val sk = trimmed.select(col("source"), col("h"))
    val srcs = sk.select(col("source")).distinct()
    val pairs = srcs.as("a").join(srcs.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
    // per-source estimate from each sketch's own kth value; the
    // artifact-k columns ride THIS aggregate (one extra pass over an
    // aggregate that exists anyway — a separate guard agg would
    // re-evaluate the caller's whole sketch subtree, measured as
    // ~0.4 s on q_kmv_sketch_only where the sketch derives live from
    // the corpus scan)
    val perAgg = (if (hasK) trimmed.select(col("source"), col("h"), col("k"))
                  else trimmed.select(col("source"), col("h"), lit(k).as("k")))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"),
        min(col("k")).as("kb_min"), max(col("k")).as("kb_max"))
    val per = perAgg.select(col("source"),
      when(col("n") < k, col("n").cast("double"))
        .otherwise(lit((k - 1).toDouble * KmvM) / col("hk").cast("double")).as("est"))
    // one-row guard scalar: refuses a smaller or mixed build k at
    // execution time (attached to the k-row output, not the input).
    // KNOWN LIMIT: the predicate rides the OUTPUT rows, so a run whose
    // estimate/pair output is EMPTY (e.g. a single-stratum sketch has
    // no pairs) never evaluates it and the misuse goes undetected —
    // acceptable because no wrong data is emitted either; uncondi-
    // tional refusal would need an eager driver-side collect of this
    // one-row guard, trading the operator's laziness for it
    val guard =
      if (!hasK) null
      else broadcast(perAgg.agg(
        min(col("kb_min")).as("kb_min"), max(col("kb_max")).as("kb_max")))
    def withGuard(df: DataFrame): DataFrame =
      if (!hasK) df
      else df.crossJoin(guard)
        .filter(
          when(col("kb_min") =!= col("kb_max"),
            raise_error(concat(lit("kmvSetOpsFromSketches: mixed build-k artifact ("),
              col("kb_min"), lit(".."), col("kb_max"), lit(")"))).cast("boolean"))
          .when(col("kb_min") < k,
            raise_error(concat(lit(s"kmvSetOpsFromSketches(k=$k) over an artifact built"
              + " with k="), col("kb_min"),
              lit(": truncated strata would report build-k as exact cardinalities;"
                + " pass the build-time k"))).cast("boolean"))
          .otherwise(lit(true)))
        .drop("kb_min", "kb_max")
    // membership-tagged merge of the two sketches per pair, k smallest
    val va = pairs.join(sk.select(col("source").as("src_a"), col("h")), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("h"), lit(1L).as("ia"), lit(0L).as("ib"))
    val vb = pairs.join(sk.select(col("source").as("src_b"), col("h")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("h"), lit(0L).as("ia"), lit(1L).as("ib"))
    val merged = va.union(vb)
      .groupBy("src_a", "src_b", "h")
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))))
      .filter(col("rn") <= k)
    withGuard(merged.groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"),
        sum(col("ia") * col("ib")).as("c"))
      .select(col("src_a"), col("src_b"), col("c"), col("n"),
        when(col("n") < k, col("n").cast("double"))
          .otherwise(lit((k - 1).toDouble * KmvM) / col("hk").cast("double")).as("u"))
      .join(per.select(col("source").as("src_a"), col("est").as("ea")), "src_a")
      .join(per.select(col("source").as("src_b"), col("est").as("eb")), "src_b"))
      .select(col("src_a"), col("src_b"),
        round(col("ea")).cast("long").as("est_a"),
        round(col("eb")).cast("long").as("est_b"),
        round(col("u")).cast("long").as("est_union"),
        round(col("c") * col("u") / col("n")).cast("long").as("est_inter"),
        round(col("c").cast("double") / col("n").cast("double"), 6).as("jaccard_est"))
  }

  /** Merge two PERSISTED KMV sketch artifacts into one — the
    * day-over-day path: yesterday's crawl sketch + today's, unioned
    * per stratum, distinct, re-cut to the k smallest. KMV min-merge is
    * exact mergeability (the k smallest of A ∪ B are contained in the
    * union of each side's k smallest), so the merged artifact is
    * BIT-IDENTICAL to a sketch built from the combined corpus — which
    * is what the q_kmv_sketch_merge oracle gates: Spark merges two
    * half-corpus artifacts, DuckDB rebuilds from the whole corpus.
    * Same shape as the streaming state's min-merge
    * ([[graft.streaming.StreamingKmv]]); this is its batch-artifact
    * face. Inputs follow the estimator's artifact contract (rn-bearing
    * frames re-cut; a persisted build k smaller than the caller's is
    * refused at execution time through the same one-row guard the
    * estimator uses).
    */
  def kmvMergeSketches(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def prep(df: DataFrame): DataFrame = {
      val t = if (df.columns.contains("rn")) df.filter(col("rn") <= k) else df
      if (df.columns.contains("k")) t.select(col("source"), col("h"), col("k"))
      else t.select(col("source"), col("h"), lit(k).as("k"))
    }
    val u = prep(a).unionByName(prep(b))
    val guard = broadcast(u.groupBy().agg(
      min(col("k")).as("kb_min"), max(col("k")).as("kb_max")))
    u.select(col("source"), col("h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .crossJoin(guard)
      .filter(
        when(col("kb_min") < k,
          raise_error(concat(lit(s"kmvMergeSketches(k=$k) over an artifact built with k="),
            col("kb_min"),
            lit(": a truncated input cannot yield a valid merged k-sketch"))).cast("boolean"))
        .otherwise(lit(true)))
      .select(col("source"), col("h"), col("rn"), lit(k).as("k"))
  }

  /** The AUDITED form: [[kmvSetOpsFromSketches]] over a freshly built
    * sketch, with the exact per-pair overlap joined on as the accuracy
    * report (the cms/join-size convention). This is the calibration
    * run — it scans the corpus BY DESIGN (exact columns cannot come
    * from k rows); steady-state cross-corpus questions should persist
    * [[kmvSketch]] output and use the estimate-only entry point.
    */
  def kmvSetOps(docs: DataFrame, textCol: String, strataCol: String,
                k: Int = 256, shingleN: Int = 0): DataFrame = {
    val sk = kmvSketch(docs, textCol, strataCol, k, shingleN)
      .localCheckpoint(eager = false)
    val est = kmvSetOpsFromSketches(sk, k)
    // exact audit. NOT the per-pair tag-merge: that duplicates every
    // stratum's full item set once per pair (s-1 copies each — at 20
    // sources it 19x'ed the corpus and went quadratic in strata).
    // Instead ONE self-equi-join on the item: per-item bucket size is
    // bounded by the stratum count, so the join emits at most
    // C(strata, 2) rows per item; union comes free by
    // inclusion-exclusion from per-stratum counts.
    val tok = kmvItems(docs, textCol, strataCol, shingleN).distinct()
      .localCheckpoint(eager = false)
    val pairs = est.select(col("src_a"), col("src_b"))
    val interEx = tok.as("a").join(tok.as("b"),
        col("a.word") === col("b.word") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("ei"))
    val ns = tok.groupBy("source").agg(count(lit(1)).as("n"))
    val exact = pairs
      .join(ns.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(ns.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .join(interEx, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("ei"), lit(0L)).as("exact_inter"),
        (col("na") + col("nb") - coalesce(col("ei"), lit(0L))).as("exact_union"))
    est.join(exact, Seq("src_a", "src_b"))
  }
}
