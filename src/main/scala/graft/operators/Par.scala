package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

object Par {
  /** Round-robin repartition when the scan produced far fewer
    * partitions than the cluster has slots. The driver testdata ships
    * single-row-group parquet files, which Spark cannot split, so every
    * downstream map stage would otherwise run on ONE core regardless of
    * `local[32]`. On production inputs (many files / row groups) the
    * condition is false and this is a no-op — no extra shuffle.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  /** Skew-salted equi-join: replicate each `right` row `salt` times and
    * scatter `left` rows across the salted keys, so one hot key spreads
    * over `salt` tasks instead of melting a single reducer. Use when a
    * handful of keys dominate (AQE's skew-join handles sort-merge
    * cases; salting also covers aggregations-after-join and pre-AQE
    * shuffles).
    */
  def saltedJoin(lhs: DataFrame, rhs: DataFrame, key: String, salt: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val saltedLeft = lhs.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val saltedRight = rhs.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-filter bit words over a key set — the build side of a
    * runtime semi-join filter. Deterministic md5 positions (the repo's
    * oracle-mirrorable hash algebra), 60-bit words so `shiftleft`
    * stays positive in both engines. The result is FIXED size
    * (mBits/60 longs) regardless of build cardinality — that is the
    * entire point: deciding which fact rows can possibly join costs a
    * broadcast of ~8 KB at the default 2^16 bits, not a shuffle of
    * the fact.
    */
  def bloomBits(keys: DataFrame, keyCol: String, mBits: Int = 1 << 16,
                k: Int = 3, salt: String = "bjp"): Array[Long] = {
    import org.apache.spark.sql.functions._
    val words = keys.select(col(keyCol).cast("string").as("__key")).distinct()
      .select(explode(array((0 until k).map(j =>
        pmod(conv(substring(md5(concat(lit(s"$salt$j|"), col("__key"))), 1, 15), 16, 10)
          .cast("long"), lit(mBits.toLong))): _*)).as("p"))
      .select(expr("p div 60").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 60 AS INT))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("bits"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    Array.tabulate((mBits + 59) / 60)(words.getOrElse(_, 0L))
  }

  /** Might-contain probe against [[bloomBits]] as a PURE projection:
    * the word array rides into the plan as one array literal
    * (Spark's own runtime bloom filter broadcasts the same way), so
    * the fact-side prefilter is whole-stage-codegen arithmetic — no
    * join, no shuffle, no exchange on the 100 TB side. False
    * positives pass (the later exact join removes them); false
    * negatives are impossible — every build key set its bits in the
    * SAME deterministic positions the probe reads.
    */
  def bloomMightContain(bits: Array[Long], key: Column, mBits: Int = 1 << 16,
                        k: Int = 3, salt: String = "bjp"): Column = {
    import org.apache.spark.sql.functions._
    val arr = lit(bits)
    (0 until k).map { j =>
      val p = pmod(conv(substring(md5(concat(lit(s"$salt$j|"), key.cast("string"))), 1, 15), 16, 10)
        .cast("long"), lit(mBits.toLong))
      // 1L << (p % 60) without functions.shiftleft (whose shift must be
      // a static Int): powers of two are exact doubles through 2^59
      val mask = pow(lit(2.0), (p % 60).cast("double")).cast("long")
      (element_at(arr, floor(p / 60).cast("int") + 1).bitwiseAND(mask) =!= 0L)
    }.reduce(_ && _)
  }
}
