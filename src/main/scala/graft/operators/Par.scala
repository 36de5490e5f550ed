package graft.operators

import org.apache.spark.sql.DataFrame

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
}
