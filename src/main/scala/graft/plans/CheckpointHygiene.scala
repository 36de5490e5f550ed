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

  /** Free every checkpoint/cache CREATED inside `body`, keeping
    * pre-existing ones — the batch-scoped form of [[releaseAll]] for
    * foreachBatch loops: a micro-batch's chain may checkpoint inside
    * OPERATORS it calls (e.g. the candidate frame in
    * `Dedup.verifyAgainst`, the probe side in `nearDupAgainstIndex`)
    * where the caller holds no handle to [[free]]; without a sweep a
    * sustained ingest accumulates one dead block set per batch until
    * the driver GC's ContextCleaner gets around to them. Only sound
    * when `body` fully CONSUMES everything it builds (counts/writes) —
    * exactly the foreachBatch contract.
    */
  def scoped[T](spark: SparkSession)(body: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val r = body
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id)) rdd.unpersist(blocking = false)
    }
    r
  }
}
