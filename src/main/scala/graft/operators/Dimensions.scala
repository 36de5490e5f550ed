package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal dimension modeling over an event log: SCD2 history build
  * and ordered funnel progression.
  *
  * Reference analog: the event graph IS a versioned state history —
  * `fold_state` (/root/reference/crates/esvc-core/src/graph.rs) walks
  * it event-by-event; these operators materialize the standard
  * warehouse views of the same timeline (validity intervals, ordered
  * milestone progression) declaratively, in one window/aggregate pass
  * per step.
  */
object Dimensions {

  /** SCD2 (type-2 slowly-changing dimension) build: version rows with
    * `[valid_from, valid_to)` intervals from a change-event stream.
    * One window over (key, time) — lead() closes each interval, the
    * open version keeps valid_to = null. ONE shuffle; no self-join.
    */
  def scd2(changes: DataFrame, key: String, time: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(time))
      .withColumn("valid_to", lead(col(time), 1).over(w))
      .drop(time)
  }

  /** Time-series gap filling: expand each key's bucket range
    * [min, max] into a dense grid (sequence + explode — the grid never
    * exists on the driver) and left-join the actuals back; missing
    * buckets surface as nulls for the caller to zero-fill or
    * carry-forward. Grid size is span-bounded per key, so the explode
    * fan-out is the resampled series itself, nothing bigger.
    */
  def gapFill(actual: DataFrame, key: String, bucket: String): DataFrame = {
    val span = actual.groupBy(col(key))
      .agg(min(col(bucket)).as("__lo"), max(col(bucket)).as("__hi"))
    val grid = span.select(col(key),
      explode(sequence(col("__lo"), col("__hi"))).as(bucket))
    grid.join(actual, Seq(key, bucket), "left")
  }

  /** Cohort retention: day-grain activity joined to each key's first
    * activity day (the cohort); output (cohort_day, day_offset,
    * n_users) for offsets within `horizon`. Two aggregates + one
    * co-partitioned join — the activity table carries (key, day) only.
    */
  def retention(events: DataFrame, key: String, day: String,
                horizon: Int): DataFrame = {
    val act = events.select(col(key), col(day)).distinct()
    val cohort = act.groupBy(col(key)).agg(min(col(day)).as("cohort_day"))
    act.join(cohort, key)
      .withColumn("day_offset", col(day) - col("cohort_day"))
      .filter(col("day_offset").between(0, horizon))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col(key)).as("n_users"))
  }

  /** CDC upsert/delete apply (MERGE-INTO compaction): collapse an
    * ordered change log to final table state — last writer wins per
    * key, a trailing delete (`op = "D"`) removes the row entirely.
    * The pattern every warehouse runs to turn a Debezium/binlog-style
    * change stream back into a queryable snapshot.
    *
    * Scale shape: ONE aggregate on the key — `max_by` over the
    * (time, seq) struct picks the winning change (partial buffers
    * merge commutatively because (time, seq) is a total order). The
    * struct ordering makes Spark plan a partial SortAggregate rather
    * than hash, but the property that matters at scale holds: the
    * shuffle carries one partial row per key per map task, never the
    * change log, and no global window sort exists. No self-join
    * against the prior snapshot is needed: applying to a base table is
    * the same operator with the base unioned in as seq -infinity
    * upserts.
    */
  def cdcApply(changes: DataFrame, key: String, time: String, seq: String,
               op: String, valueCol: String): DataFrame =
    changes.groupBy(col(key))
      .agg(count(lit(1)).as("n_changes"),
        // ONE max_by over a packed (op, value) struct: even if (time,
        // seq) ties (the total order is documented, not enforced), op
        // and value always come from the SAME winning row — two
        // independent max_by calls could split a tie across rows.
        max_by(struct(col(op).as("o"), col(valueCol).as("v")),
          struct(col(time), col(seq))).as("__win"))
      .filter(col("__win.o") === "U")
      .select(col(key), col("__win.v").as("last_value"), col("n_changes"))

  /** Ordered funnel: for each key, the first `stages(0)` time, then the
    * first `stages(1)` STRICTLY AFTER it, and so on. Each stage is one
    * filtered aggregate joined on the key — all stages co-partition on
    * the same key, so after the first shuffle the rest are cheap; no
    * per-key collect, no UDAF holding the whole timeline.
    *
    * Input: (key, time, stage). Output: key, t1..tN (BIGINT-friendly
    * `time`s; later stages null once progression stops).
    */
  def funnel(events: DataFrame, key: String, time: String, stage: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val first = events.filter(col(stage) === stages.head)
      .groupBy(col(key)).agg(min(col(time)).as("t1"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (st, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val next = events.filter(col(stage) === st)
        .join(acc.select(col(key), col(prev)), key)
        .filter(col(time) > col(prev))
        .groupBy(col(key)).agg(min(col(time)).as(cur))
        .select(col(key), col(cur))
      acc.join(next, Seq(key), "left")
    }
  }
}
