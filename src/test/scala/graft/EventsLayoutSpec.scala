package graft

import java.nio.file.Files

import graft.operators.EventReplay
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift armor for the events table (VERDICT r07: the driver
  * regenerated testdata with `ts: timestamp[us]` where earlier
  * generations carried int64-ns, and every downstream int64-ns
  * assumption broke). This spec writes the SAME logical event log in
  * every layout a generator has shipped — int64 nanoseconds,
  * timestamp (LTZ micros parquet), and timestamp_ntz — and asserts
  * `EventReplay.loadEvents` restores an identical int64-ns `ts`
  * column and an identical replay result from each.
  */
class EventsLayoutSpec extends AnyFunSuite with SharedSpark {

  // ns values chosen micro-representable (multiples of 1000) so the
  // timestamp layouts can carry them exactly
  private val rows = Seq(
    (1L, 1700000000000000000L, 10L, "signup", 5.0),
    (2L, 1700000001000000000L, 10L, "purchase", 2.5),
    (3L, 1700000002000000000L, 10L, "click", 0.0),
    (4L, 1700000000500000000L, 20L, "signup", 1.0),
    (5L, 1700000003000000000L, 20L, "purchase", 4.0))

  private def baseDf(): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4, r._5, "{}")).asJava, schema)
  }

  private def writeLayout(dir: String, tsExpr: DataFrame => DataFrame): Unit =
    tsExpr(baseDf()).write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def load(dir: String): DataFrame = EventReplay.loadEvents(spark, dir)

  private def replayed(dir: String): Map[Long, Double] =
    EventReplay.replayPerUser(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("loadEvents restores the int64-ns ts contract from every layout") {
    val root = Files.createTempDirectory("graft_events_layout").toString
    val longDir = s"$root/long"
    val ltzDir = s"$root/ltz"
    val ntzDir = s"$root/ntz"
    writeLayout(longDir, identity)
    writeLayout(ltzDir,
      _.withColumn("ts", timestamp_micros(expr("ts DIV 1000"))))
    writeLayout(ntzDir,
      _.withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz")))

    for (dir <- Seq(longDir, ltzDir, ntzDir)) {
      val ev = load(dir)
      assert(ev.schema("ts").dataType === LongType, s"layout $dir")
      val got = ev.select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === rows.map(r => r._1 -> r._2).toMap, s"layout $dir")
    }
  }

  test("replay result is layout-independent") {
    val root = Files.createTempDirectory("graft_events_layout2").toString
    writeLayout(s"$root/long", identity)
    writeLayout(s"$root/ltz",
      _.withColumn("ts", timestamp_micros(expr("ts DIV 1000"))))
    val a = replayed(s"$root/long")
    val b = replayed(s"$root/ltz")
    assert(a === b)
    // signup 5.0 -> +2.5 -> click +1 = 8.5; signup 1.0 -> +4.0 = 5.0
    assert(a === Map(10L -> 8.5, 20L -> 5.0))
  }

  test("driver testdata layout loads to ns-longs matching epoch micros") {
    val dir = "/root/testdata/sf0.001"
    val ev = load(dir)
    assert(ev.schema("ts").dataType === LongType)
    // every ns value must be an exact multiple of 1000 (micros source)
    assert(ev.filter(expr("ts % 1000 != 0")).count() === 0L)
    assert(ev.filter(col("ts") <= 0L).count() === 0L)
  }
}
