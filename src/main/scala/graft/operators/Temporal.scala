package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for, in the shapes
  * that survive 100 TB.
  *
  * Reference analog: the event graph is a timeline per entity
  * (/root/reference/crates/esvc-core/src/workcache.rs:68-108 replays
  * strictly in causal order); these operators answer the
  * point-in-time questions a training-data pipeline asks of such
  * timelines — "what was the entity's state when this sample was
  * taken" (as-of), "what happened within the window opened by this
  * event" (range), "how active was the entity just before this
  * moment" (rolling) — without ever materializing a time-range cross
  * product.
  */
object Temporal {

  /** As-of join: attach to each left row the latest right `valueCol`
    * with `right.time <= left.time` for the same key — the
    * point-in-time feature join (no future leakage).
    *
    * Shape: tag both sides, union, one running `last(ignoreNulls)`
    * window. ONE shuffle on the key, in-partition sort, no range
    * explosion, no per-key driver loop — the canonical large-scale
    * as-of (a sort-merge ASOF would need a custom SparkPlan for at
    * best the same shuffle). Right side must be unique per
    * (key, time); ties at equal time resolve right-before-left, so
    * "at or before" includes same-instant right rows.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               valueCol: String, asofCol: String): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val payload = left.columns.toSeq.filterNot(c => c == key || c == time)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(vType))
    val r = payload.foldLeft(
      right.select(col(key), col(time), lit(0).as("__side"), col(valueCol).as("__rv"))
    )((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val ordered = Seq(key, time, "__side", "__rv") ++ payload
    val u = l.select(ordered.map(col): _*).unionByName(r.select(ordered.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(asofCol, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }

  /** Key + bounded-range join: all pairs with `l.key == r.key` and
    * `r.time` in `[l.time, l.time + width)`, returned as left columns
    * + `rPrefix`-renamed right columns.
    *
    * Bucketing by `floor(time / width)` turns the inequality into an
    * equi-join where each left row probes exactly TWO buckets and each
    * right row lands in exactly one (so no dedup pass). Shuffle volume
    * scales with the data, never with the time span — unlike the
    * broadcast-nested-loop plan Spark picks for a raw `BETWEEN` join
    * predicate.
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                        ltime: String, rtime: String, width: Long,
                        rPrefix: String = "r_"): DataFrame = {
    require(width > 0, "width must be positive")
    val r = right.columns.foldLeft(right)((df, c) =>
      if (c == key) df else df.withColumnRenamed(c, rPrefix + c))
    val lBucket = expr(s"`$ltime` DIV ${width}L")
    val lb = left.withColumn("__b", explode(array(lBucket, lBucket + 1)))
    val rb = r.withColumn("__b", expr(s"`$rPrefix$rtime` DIV ${width}L"))
    lb.join(rb, Seq(key, "__b"))
      .filter(col(rPrefix + rtime) >= col(ltime) &&
        col(rPrefix + rtime) < col(ltime) + width)
      .drop("__b")
  }

  /** Interval-interval overlap join: pairs (l, r) with l.key == r.key
    * and [lStart, lEnd) overlapping [rStart, rEnd). Both sides explode
    * over the width-`width` buckets they span; a candidate pair can
    * share MANY buckets, so instead of a distinct pass each pair is
    * reported exactly once — at the bucket where the LATER interval
    * starts (`bucket == greatest(floor(lStart/w), floor(rStart/w))`,
    * the standard spatial-join dedup trick: that bucket provably
    * exists for every overlapping pair and is unique).
    *
    * Fan-out = interval length / width per row — pick `width` near the
    * typical interval length so each row lands in O(1) buckets.
    */
  def intervalJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                           lStart: String, lEnd: String,
                           rStart: String, rEnd: String, width: Long,
                           rPrefix: String = "r_"): DataFrame = {
    require(width > 0, "width must be positive")
    val r = right.columns.foldLeft(right)((df, c) =>
      if (c == key) df else df.withColumnRenamed(c, rPrefix + c))
    val rs = rPrefix + rStart
    val re = rPrefix + rEnd
    def buckets(s: String, e: String) =
      sequence(expr(s"`$s` DIV ${width}L"),
        expr(s"(`$e` - 1) DIV ${width}L")) // end exclusive
    val lb = left.filter(col(lEnd) > col(lStart))
      .withColumn("__b", explode(buckets(lStart, lEnd)))
    val rb = r.filter(col(re) > col(rs))
      .withColumn("__b", explode(buckets(rs, re)))
    lb.join(rb, Seq(key, "__b"))
      .filter(col(lStart) < col(re) && col(rs) < col(lEnd))
      .filter(col("__b") === greatest(expr(s"`$lStart` DIV ${width}L"),
        expr(s"`$rs` DIV ${width}L")))
      .drop("__b")
  }

  /** Rolling point-in-time aggregates: for every row, aggregates of
    * the same key's rows with time in `[time - span, time)` (strictly
    * before — no self/future leakage). `aggs` maps output column name
    * to an aggregate Column; pass integer-typed aggregates (counts,
    * cents) for cross-engine bit parity — a float sum over a sliding
    * frame is evaluation-order-sensitive.
    *
    * One shuffle + in-partition sort; the RANGE frame is evaluated in
    * a single pass per partition.
    */
  def rollingFeatures(df: DataFrame, key: String, time: String, span: Long,
                      aggs: Map[String, Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time))
      .rangeBetween(-span, -1)
    aggs.foldLeft(df) { case (d, (name, agg)) => d.withColumn(name, agg.over(w)) }
  }
}
