package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed ordered replay — the reference's `run_deps` fold
  * (/root/reference/crates/esvc-core/src/workcache.rs:68-108) lifted to
  * per-entity causal chains: each event hard-depends on the same
  * entity's previous event (the lag edge), so linearization degenerates
  * to an order-by within the entity and replay is an ordered,
  * NON-COMMUTATIVE fold.
  *
  * Why not an `Aggregator`: Spark aggregates must merge partial buffers
  * commutatively; replay must see events in causal order. The scalable
  * shape is repartition-by-key + sortWithinPartitions + a streaming
  * per-partition fold (constant memory per partition, no per-group
  * buffering, one shuffle — survives groups of any size at 100 TB).
  */
object EventReplay {
  /** Command registry for the events table — the `Engine` contract
    * (`cmd -> (arg, dat) -> dat`, esvc-traits/src/lib.rs:15-28) with
    * `Dat = Double` running state, commands keyed by event_type:
    * signup resets the state to the event value; purchase accumulates
    * the value; click increments; view/error leave state unchanged.
    */
  def command(eventType: String): (Double, Double) => Double = eventType match {
    case "signup" => (_, v) => v
    case "purchase" => (s, v) => s + v
    case "click" => (s, _) => s + 1.0
    case _ => (s, _) => s
  }

  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    // ts layout varies across driver testdata generations: timestamp[ns]
    // parquet (which the vectorized reader would reject without the
    // nanosAsLong escape hatch) vs timestamp[us]. Either way, downstream
    // sites assume an int64 nanosecond epoch — normalize at this single
    // load point.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Restore the int64-nanosecond-epoch `ts` contract regardless of the
    * physical parquet layout. int64/timestamp[ns]-via-nanosAsLong pass
    * through; timestamp[us] becomes `unix_micros(ts) * 1000`. NTZ
    * timestamps are interpreted in the session time zone, which every
    * entry point pins to UTC — matching the DuckDB oracles' epoch_us(ts).
    */
  def normalizeTs(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    events.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case None | Some(LongType) => events
      case Some(TimestampType) =>
        events.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        events.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported events.ts type: $other")
    }
  }

  /** Final replayed state per user over the full event log. One shuffle
    * (hash partition by user), in-partition sort, streaming fold.
    */
  def replayPerUser(spark: SparkSession, sfDir: String): DataFrame =
    foldStates(loadEvents(spark, sfDir))
      .select(col("user_id"), col("state_raw").cast("decimal(18,2)").cast("double").as("state"))

  /** The raw ordered fold: (user_id, state_raw) from any frame with
    * `user_id, ts, event_id, event_type, value` columns.
    */
  def foldStates(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    val folded = ev
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { rows: Iterator[Row] =>
        new Iterator[(Long, Double)] {
          private var pending: Option[(Long, Double)] = None
          private var cur = Option.empty[Long]
          private var state = 0.0
          private def advance(): Unit = {
            while (pending.isEmpty && rows.hasNext) {
              val r = rows.next()
              val uid = r.getLong(0)
              if (cur.isEmpty) { cur = Some(uid); state = 0.0 }
              else if (cur.get != uid) { pending = Some((cur.get, state)); cur = Some(uid); state = 0.0 }
              state = command(r.getString(3))(state, r.getDouble(4))
            }
            if (pending.isEmpty && rows.isEmpty && cur.nonEmpty) {
              pending = Some((cur.get, state)); cur = None
            }
          }
          override def hasNext: Boolean = { advance(); pending.nonEmpty }
          override def next(): (Long, Double) = { advance(); val p = pending.get; pending = None; p }
        }
      }
    folded.toDF("user_id", "state_raw")
  }

  /** Per-entity deterministic linearization — `calculate_dependencies`
    * (graph.rs:85-129) for the per-entity chain case, where the topo
    * order degenerates to a window order-by.
    */
  def linearize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    loadEvents(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("seq", row_number().over(w))
      .select(col("event_id"), col("user_id"), col("seq"))
  }
}
