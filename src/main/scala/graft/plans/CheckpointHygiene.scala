package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** `localCheckpoint()` pins lineage-truncated RDD blocks in the block
  * manager until session end. Iterative operators checkpoint every
  * round, so a long session (or a 32-query bench run) accumulates dead
  * blocks that crowd the storage pool and drag GC. Two remedies:
  *
  *  - operators free *superseded* rounds in-loop via [[free]] — safe
  *    only once nothing live references the frame (lineage is cut, so
  *    the blocks are unrecoverable afterwards);
  *  - session owners (Bench/Verify) call [[releaseAll]] between
  *    queries, after each result is fully consumed.
  */
object CheckpointHygiene {
  /** Unpersist the block-manager blocks behind localCheckpoint'd
    * frames. No-op for frames that are not checkpoint leaves.
    */
  def free(dfs: DataFrame*): Unit = dfs.foreach { df =>
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }

  /** Drop every persistent RDD in the session — checkpoint blocks and
    * caches alike. Only between queries, once results are consumed.
    */
  def releaseAll(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
}
