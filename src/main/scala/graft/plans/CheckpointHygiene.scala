package graft.plans

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
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
    * caches alike. Only between queries, once results are consumed,
    * and only by a session owner: this sweep is session-GLOBAL (the
    * batch-scoped form for shared sessions is [[scoped]]).
    */
  def releaseAll(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

  /** Local property carried by every job this scope's thread launches;
    * the listener uses it to attribute persisted RDDs to the scope.
    */
  private val ScopeProp = "graft.ckpt.scope"
  private val MarkerProp = "graft.ckpt.marker"

  /** Free every checkpoint/cache CREATED AND USED inside `body`,
    * keeping everything else — the batch-scoped form of [[releaseAll]]
    * for foreachBatch loops: a micro-batch's chain may checkpoint
    * inside OPERATORS it calls (e.g. the candidate frame in
    * `Dedup.verifyAgainst`, the probe side in `nearDupAgainstIndex`)
    * where the caller holds no handle to [[free]]; without a sweep a
    * sustained ingest accumulates one dead block set per batch until
    * the driver GC's ContextCleaner gets around to them.
    *
    * Attribution, not a global diff: the first cut diffed the
    * SparkContext-wide persistent-RDD set before/after `body`, which
    * swept checkpoints persisted CONCURRENTLY by any other query on
    * the same session — and unpersisting a localCheckpoint another
    * query still needs is unrecoverable (lineage is truncated). This
    * version tags the scope's jobs via a thread-local Spark property
    * (NOT the job group — streaming owns that for query cancellation)
    * and a listener records which RDD ids the tagged jobs touched;
    * the sweep frees only RDDs that are (a) newly persistent since
    * scope entry AND (b) touched by this scope's own jobs. Two
    * concurrent scopes — or a scope beside an untagged query — leave
    * each other's blocks alone (spec-held, CheckpointScopeSpec). The
    * one remaining hazard is a frame another thread persists DURING
    * the window that this scope's jobs also read: attribution can't
    * distinguish shared ownership, so don't hand a mid-flight foreign
    * checkpoint into a scoped body.
    *
    * The listener bus is async and LOSSY under overflow
    * (`spark.scheduler.listenerbus.eventqueue.capacity`, default
    * 10000): a dropped body-job start loses that job's attribution.
    * The failure direction is deliberately conservative — the sweep
    * frees only (new AND attributed) RDDs, so a drop can only make it
    * free LESS (the un-attributed blocks leak to ContextCleaner, the
    * pre-scoped() behavior), never free a concurrent query's blocks.
    * A dropped drain MARKER surfaces as a logged bounded wait, not a
    * silent stall; and the whole sweep is best-effort — a failure in
    * it (e.g. the marker job refused by a stopping SparkContext after
    * `body` threw) is logged and swallowed so it can never mask the
    * body's own exception.
    *
    * Only sound when `body` fully CONSUMES everything it builds
    * (counts/writes) — exactly the foreachBatch contract. Lazy
    * checkpoints (`eager = false`) are attributed when first
    * materialized, which the consume-everything contract guarantees
    * happens inside the body.
    */
  def scoped[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val tag = "ckpt-scope-" + java.util.UUID.randomUUID().toString
    val touched = ConcurrentHashMap.newKeySet[Int]()
    val markerSeen = new CountDownLatch(1)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val props = Option(js.properties)
        if (props.exists(p => p.getProperty(ScopeProp) == tag))
          js.stageInfos.foreach(_.rddInfos.foreach(ri => touched.add(ri.id)))
        if (props.exists(p => p.getProperty(MarkerProp) == tag))
          markerSeen.countDown()
      }
    }
    sc.addSparkListener(listener)
    val prevTag = sc.getLocalProperty(ScopeProp)
    sc.setLocalProperty(ScopeProp, tag)
    try {
      val r = body
      r
    } finally {
      sc.setLocalProperty(ScopeProp, prevTag)
      try {
        try {
          // the listener bus is async: drain it by running one empty
          // marker job AFTER the body — events are FIFO per listener,
          // so once the marker's JobStart arrives, every job the body
          // launched has been attributed. ~1 ms of driver work.
          sc.setLocalProperty(MarkerProp, tag)
          try sc.parallelize(Seq(0), 1).count()
          finally sc.setLocalProperty(MarkerProp, null)
          val drained = markerSeen.await(10, TimeUnit.SECONDS)
          if (!drained)
            // overloaded bus dropped the marker event; attribution may
            // be incomplete. Still safe to sweep what WAS attributed
            // (under-attribution only leaks), but say so.
            System.err.println("CheckpointHygiene.scoped: drain marker not " +
              "delivered in 10 s (listener bus overloaded?) — sweeping the " +
              "attributed subset; unattributed batch blocks leak to ContextCleaner")
          sc.getPersistentRDDs.foreach { case (id, rdd) =>
            if (!before.contains(id) && touched.contains(id))
              rdd.unpersist(blocking = false)
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            // hygiene must never mask the body's own failure: if body
            // threw and the context is coming down, the marker job
            // throws IllegalStateException here — log, leave the dead
            // blocks to ContextCleaner, and let the ORIGINAL exception
            // propagate from the outer try.
            System.err.println("CheckpointHygiene.scoped: sweep skipped (" +
              e.getClass.getSimpleName + ": " + e.getMessage + ") — dead " +
              "batch blocks left to ContextCleaner")
        }
      } finally sc.removeSparkListener(listener)
    }
  }
}
