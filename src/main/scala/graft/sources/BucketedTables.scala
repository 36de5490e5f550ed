package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the pre-shuffle trade
  * that removes the join exchange entirely: write both fact tables
  * bucketed + sorted by the join key once, and every subsequent
  * equi-join on that key is a zero-shuffle sort-merge join. At 100 TB
  * this converts the dominant recurring cost (shuffling lineitem per
  * query) into a one-time write cost.
  */
object BucketedTables {
  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .option("compression", "zstd")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. When both sides are
    * bucketed the same way, the plan contains NO Exchange (asserted in
    * BucketedJoinSpec).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True iff the physical plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
