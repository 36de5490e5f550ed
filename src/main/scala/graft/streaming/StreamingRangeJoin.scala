package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming flavor of the bounded range join (batch:
  * `operators/Temporal.rangeJoinBucketed`, q_range_join): clicks
  * arriving within a window opened by each signup, as a native
  * Spark stream-stream inner join.
  *
  * Structured Streaming handles the state bounding that the batch
  * bucketing handles spatially: BOTH sides carry event-time
  * watermarks, and the join condition's time band lets Spark derive
  * how long each side's rows must be retained (signups: width +
  * lateness; clicks: lateness) — state is evicted as the watermark
  * advances, so an unbounded stream joins in bounded memory. Same
  * declarative plan a batch join would use; no custom state code.
  */
object StreamingRangeJoin {

  /** left: (event_id, user_id, s_time TIMESTAMP); right: (c_user_id,
    * c_time TIMESTAMP, cents). Emits pairs with c_time in
    * [s_time, s_time + widthSec).
    */
  def clicksWithinWindow(signups: DataFrame, clicks: DataFrame,
                         widthSec: Long, lateness: String = "1 minute"): DataFrame =
    signups.withWatermark("s_time", lateness)
      .join(clicks.withWatermark("c_time", lateness),
        expr(s"""user_id = c_user_id
                |AND c_time >= s_time
                |AND c_time < s_time + INTERVAL $widthSec SECONDS""".stripMargin))
      .select(col("event_id"), col("user_id"), col("c_time"), col("cents"))
}
