package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Skew-proof replay for AFFINE command algebras.
  *
  * [[EventReplay.replayPerUser]] folds each entity inside one
  * partition — correct for any engine, but a single whale entity with
  * more events than a partition holds becomes the straggler (and
  * salting is impossible for a non-commutative fold). When every
  * command is an affine map `s -> a*s + b` (true for the events
  * command set: signup = (0,v), purchase = (1,v), click = (1,1),
  * view/error = (1,0)), the fold is still non-commutative but
  * ASSOCIATIVE under composition:
  *
  *   (a2, b2) . (a1, b1) = (a2*a1, a2*b1 + b2)
  *
  * so replay parallelizes as a two-level ordered reduction: each
  * range-partitioned, in-order slice composes its events into ONE
  * (a, b) summary, and the few per-slice summaries compose in slice
  * order. A 1e9-event entity costs 1e9/parallelism, not 1e9.
  *
  * This is the parallel-prefix (scan) treatment of replay; the general
  * engine keeps the sequential fold, and the two are equivalence-tested.
  */
object AffineReplay {
  /** The events command set as affine coefficients. */
  def coeffs(eventType: String, value: Double): (Double, Double) = eventType match {
    case "signup" => (0.0, value)
    case "purchase" => (1.0, value)
    case "click" => (1.0, 1.0)
    case _ => (1.0, 0.0)
  }

  /** Replayed state per user, computed by composed affine summaries
    * over range-partitioned slices. Output matches
    * [[EventReplay.replayPerUser]] up to float association error
    * (exact here: the per-slice composition applies the same
    * multiplications the sequential fold would).
    */
  def replayPerUser(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = EventReplay.loadEvents(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      // range partitioning keeps each slice a contiguous causal run,
      // even when one user spans MANY slices
      .repartitionByRange(col("user_id"), col("ts"), col("event_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))

    // per slice: one composed (a, b) per user-run, tagged with the
    // slice id and the run's first key for deterministic re-ordering
    val summaries = ev.mapPartitions { rows: Iterator[Row] =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long, Double, Double)]
      var cur = Option.empty[Long]
      var a = 1.0
      var b = 0.0
      var firstTs = 0L
      var firstId = 0L
      def flush(): Unit = cur.foreach { uid => out += ((uid, pid, firstTs, firstId, a, b)) }
      rows.foreach { r =>
        val uid = r.getLong(0)
        if (!cur.contains(uid)) { flush(); cur = Some(uid); a = 1.0; b = 0.0; firstTs = r.getLong(1); firstId = r.getLong(2) }
        val (ca, cb) = coeffs(r.getString(3), r.getDouble(4))
        // compose (ca, cb) after (a, b)
        a = ca * a
        b = ca * b + cb
      }
      flush()
      out.iterator
    }.toDF("user_id", "slice", "first_ts", "first_id", "a", "b")

    // compose the (few) per-slice summaries in causal slice order
    summaries
      .groupByKey(r => r.getAs[Long]("user_id"))
      .mapGroups { (uid, it) =>
        val parts = it.toArray.sortBy(r => (r.getAs[Long]("first_ts"), r.getAs[Long]("first_id")))
        var a = 1.0
        var b = 0.0
        parts.foreach { r =>
          val (pa, pb) = (r.getAs[Double]("a"), r.getAs[Double]("b"))
          a = pa * a
          b = pa * b + pb
        }
        (uid, a * 0.0 + b) // initial state 0.0
      }
      .toDF("user_id", "state_raw")
      .select(col("user_id"), col("state_raw").cast("decimal(18,2)").cast("double").as("state"))
  }
}
