package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventReplay
import graft.plans.MvRewrite

/** Materialized-view rewrite: the optimizer rule must (a) re-target a
  * covered day-grain aggregate onto the persisted hourly rollup with
  * identical results, (b) leave uncovered shapes — unregistered
  * grains, filters, foreign measures — untouched.
  */
class MvRewriteSpec extends AnyFunSuite with SharedSpark {
  private val dir = "/root/testdata/sf0.001"
  private val mvPath = "/tmp/graft_mv_spec"

  private def dayQuery(base: DataFrame): DataFrame =
    base.groupBy(expr("ts DIV 86400000000000").as("day_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").as("cents"))

  private def leafPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      case _ => Nil
    }

  test("covered day-grain aggregate is re-targeted onto the MV with identical results") {
    MvRewrite.clear()
    val base = EventReplay.loadEvents(spark, dir)
    val plain = dayQuery(base).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    MvRewrite.materializeHourlyMv(spark, base, s"$dir/events.parquet", mvPath,
      rewriteGrains = Set(86400000000000L))
    val rewritten = dayQuery(base)
    val leaves = leafPaths(rewritten)
    assert(leaves.exists(_.contains("graft_mv_spec")), s"expected MV scan, got $leaves")
    assert(!leaves.exists(_.contains("events.parquet")), s"base scan survived: $leaves")
    val got = rewritten.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == plain)
    MvRewrite.clear()
  }

  test("uncovered shapes keep scanning the base table") {
    MvRewrite.clear()
    val base = EventReplay.loadEvents(spark, dir)
    MvRewrite.materializeHourlyMv(spark, base, s"$dir/events.parquet", mvPath,
      rewriteGrains = Set(86400000000000L))
    // hour grain not registered for rewriting (it is the build grain)
    val hour = base.groupBy(expr("ts DIV 3600000000000").as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(leafPaths(hour).exists(_.contains("events.parquet")))
    // a filter under the aggregate means the rollup may not cover the rows
    val filtered = dayQuery(base.filter(col("value") > 0))
    assert(leafPaths(filtered).exists(_.contains("events.parquet")))
    // an uncovered measure (sum of raw doubles is not re-aggregable exactly)
    val foreign = base.groupBy(expr("ts DIV 86400000000000").as("d"))
      .agg(sum(col("value")).as("v"))
    assert(leafPaths(foreign).exists(_.contains("events.parquet")))
    MvRewrite.clear()
  }
}
