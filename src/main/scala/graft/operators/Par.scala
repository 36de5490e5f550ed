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
}
