package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Automatic aggregate rewrite over a materialized rollup — the
  * optimizer feature that turns a repeated 100 TB fact-table scan into
  * an MB-scale artifact read. A registered MV is an hourly
  * (bucket, dims) rollup persisted to parquet; any later aggregate
  * over the SAME base relation at a coarser registered grain, with
  * measures the rollup covers, is rewritten by a `Rule[LogicalPlan]`
  * (installed via `spark.experimental.extraOptimizations`) to
  * re-aggregate the artifact instead: count(*) becomes sum(cnt),
  * sum(m) becomes sum(sum_m) — valid because both measures are
  * integer sums, so re-aggregation is exact, not approximate.
  *
  * Safety contract: the rule rewrites ONLY when every grouping
  * expression and every aggregate maps onto the rollup (dimensions by
  * name, the time bucket by integer-division algebra
  * `ts DIV n == (ts DIV grain) DIV (n/grain)` for `grain | n`,
  * measures by optimized-SQL-text equality against a template that
  * went through the identical optimizer pipeline). Anything
  * unmatched — a filter under the aggregate, an uncovered measure, an
  * unregistered grain — leaves the plan untouched, so the rule can
  * never change results, only the access path. Coarser grains must be
  * listed explicitly in `rewriteGrains`: the hour-grain query that
  * BUILDS the rollup must keep scanning the base table, and
  * bench-tracked queries shouldn't silently switch plans because some
  * other query registered an MV.
  */
object MvRewrite {
  /** A registered rollup: where its base lives (path suffix match),
    * where the artifact lives, and how query expressions map onto it.
    */
  final case class MvDef(
      baseSuffix: String,
      mvPath: String,
      tsCol: String,
      tsSql: Option[String],
      grain: Long,
      rewriteGrains: Set[Long],
      bucketCol: String,
      dims: Set[String],
      countCol: String,
      sumBySql: Map[String, String])

  @volatile private[graft] var defs: List[MvDef] = Nil

  def clear(): Unit = defs = Nil

  private def norm(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** Build the hourly rollup of `base` (count + exact cents sum per
    * (hour, event_type)), persist it to `mvPath`, and register it for
    * rewriting at the listed coarser grains. The measure matcher is
    * self-calibrating: it records the OPTIMIZED SQL text of the
    * template's Sum children, so it compares like with like when a
    * user query arrives through the same optimizer.
    */
  def materializeHourlyMv(spark: SparkSession, base: DataFrame, baseSuffix: String,
                          mvPath: String, rewriteGrains: Set[Long]): Unit = {
    hourlyRollup(base).write.mode("overwrite").parquet(mvPath)
    registerHourlyMv(spark, base, baseSuffix, mvPath, rewriteGrains)
  }

  /** The canonical hourly rollup of an events table — shared by the
    * batch MV build above and the streaming delta maintainer
    * ([[graft.streaming.StreamingMvMaintain]]), so the artifact schema
    * and measure algebra cannot drift between the two writers.
    */
  def hourlyRollup(base: DataFrame): DataFrame = {
    val grain = 3600000000000L
    base.groupBy(expr(s"ts DIV $grain").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").as("cents"))
  }

  /** Register an ALREADY-persisted hourly rollup at `mvPath` for
    * rewriting — the path a streaming maintainer uses: it appends
    * partial-aggregate delta rows to the artifact itself, then calls
    * this (no rebuild, no base scan; `base` is only the calibration
    * template for the measure matcher). Correct because the rewrite
    * re-aggregates the artifact: sums of integer partials equal the
    * total regardless of how many delta rows a bucket has.
    */
  def registerHourlyMv(spark: SparkSession, base: DataFrame, baseSuffix: String,
                       mvPath: String, rewriteGrains: Set[Long]): Unit = {
    val grain = 3600000000000L
    val mv = hourlyRollup(base)
    var countCol = "cnt"
    var sums = Map.empty[String, String]
    var tsSql = Option.empty[String]
    mv.queryExecution.optimizedPlan.collectFirst { case a: Aggregate =>
      a.aggregateExpressions.foreach {
        case Alias(child, name) => child.foreach {
          case ae: AggregateExpression => ae.aggregateFunction match {
            case s: Sum => sums += norm(s.child.sql) -> name
            case _: Count => countCol = name
            case _ => ()
          }
          case _ => ()
        }
        case _ => ()
      }
      // self-calibrating ts matcher: when the base's `ts` is itself a
      // derived expression (e.g. the timestamp[us] -> ns-long
      // normalization in EventReplay.normalizeTs), the optimizer inlines
      // it into the grouping Project — record its optimized SQL text so
      // user queries arriving through the same pipeline compare equal.
      a.child.foreach {
        case Project(pl, _) => pl.foreach {
          case Alias(idv: IntegralDivide, _) if tsSql.isEmpty => idv.right match {
            case Literal(g: Long, LongType) if g == grain =>
              tsSql = Some(norm(idv.left.sql))
            case _ => ()
          }
          case _ => ()
        }
        case _ => ()
      }
    }
    val d = MvDef(baseSuffix, mvPath, tsCol = "ts", tsSql = tsSql, grain = grain,
      rewriteGrains = rewriteGrains, bucketCol = "hour_bucket",
      dims = Set("event_type"), countCol = countCol, sumBySql = sums)
    defs = d :: defs.filterNot(_.baseSuffix == d.baseSuffix)
    ensureRule(spark)
  }

  def ensureRule(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[MvRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewriteRule(spark)
  }

  case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (defs.isEmpty) plan
      else plan.transformUp { case a: Aggregate => rewrite(a).getOrElse(a) }
    }

    private def relOf(p: LogicalPlan): Option[MvDef] = p match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation =>
          defs.find(d => h.location.rootPaths.exists(_.toString.endsWith(d.baseSuffix)))
        case _ => None
      }
      case _ => None
    }

    /** The optimizer pulls non-trivial grouping expressions into a
      * Project below the Aggregate (`_groupingexpression` aliases), so
      * the shape to rewrite is Aggregate(attrs, aggs, Project(list,
      * Relation)) — the Project's aliases carry the time-bucket
      * algebra, its bare attributes are dimensions or measure inputs.
      * The rewrite keeps every output exprId (aliases re-created with
      * the original ids over MV-side expressions), swaps aggregate
      * functions for their re-aggregation forms, and finally refuses
      * unless every remaining reference is provided by the MV — any
      * unmapped column (an unregistered grain, a foreign measure, a
      * grouping the rollup doesn't carry) falls through untouched.
      */
    private def rewrite(a: Aggregate): Option[LogicalPlan] = {
      val (projList, relDef) = a.child match {
        case Project(pl, rel) => (pl, relOf(rel))
        case other => (other.output, relOf(other))
      }
      relDef.flatMap { d =>
        // fresh relation per rewrite: two rewritten aggregates in one
        // query must not share attribute ids. The streaming-maintained
        // delta log is read through the retry-dedupe seam (its
        // partials re-aggregate by SUM, so an at-least-once
        // foreachBatch retry would double-count) and the stamp column
        // is dropped so the rewrite sees the batch-built schema.
        val mvPlan = graft.sources.DeltaLogCompaction.dedupeRetries(
            spark.read.parquet(d.mvPath), d.bucketCol +: d.dims.toSeq.sorted)
          .drop("batch_id")
          .queryExecution.analyzed
        val mvAttr: Map[String, Attribute] =
          mvPlan.output.map(at => norm(at.name) -> at).toMap

        // the time expression matches either as the bare base column or
        // as the recorded normalization template (SQL-text equality, the
        // same discipline as the Sum matcher)
        def isTs(e: Expression): Boolean = e match {
          case ar: AttributeReference => norm(ar.name) == norm(d.tsCol)
          case other => d.tsSql.contains(norm(other.sql))
        }

        def mapGrouping(e: Expression): Option[Expression] = e match {
          case ar: AttributeReference if d.dims.contains(norm(ar.name)) =>
            mvAttr.get(norm(ar.name))
          case idv: IntegralDivide => (idv.left, idv.right) match {
            case (ts, Literal(n: Long, LongType))
                if isTs(ts) && d.rewriteGrains.contains(n) && n % d.grain == 0 =>
              val b = mvAttr(norm(d.bucketCol))
              Some(if (n == d.grain) b else IntegralDivide(b, Literal(n / d.grain)))
            case _ => None
          }
          case _ => None
        }

        var ok = true
        val newProj = scala.collection.mutable.ListBuffer[NamedExpression]()
        projList.foreach {
          case al: Alias => mapGrouping(al.child) match {
            case Some(m) =>
              newProj += Alias(m, al.name)(exprId = al.exprId)
            case None => ok = false
          }
          case ar: AttributeReference if d.dims.contains(norm(ar.name)) =>
            newProj += Alias(mvAttr(norm(ar.name)), ar.name)(exprId = ar.exprId)
          case _: AttributeReference => () // measure input: must vanish after agg rewrite
          case _ => ok = false
        }

        val passThrough = scala.collection.mutable.LinkedHashMap[String, Attribute]()
        def need(colName: String): Attribute = {
          val at = mvAttr(norm(colName))
          passThrough.getOrElseUpdate(norm(colName), at)
        }
        // transformUp: children first, so the replacement nodes (which
        // contain fresh AggregateExpressions over MV columns) are never
        // themselves revisited by the rewrite patterns
        val newAggs: Seq[NamedExpression] = a.aggregateExpressions.map { ne =>
          ne.transformUp {
            case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
              ae.aggregateFunction match {
                case c: Count if c.children.forall(_.foldable) =>
                  Coalesce(Seq(ae.copy(aggregateFunction = Sum(need(d.countCol))),
                    Literal(0L)))
                case s: Sum => d.sumBySql.get(norm(s.child.sql)) match {
                  case Some(cname) => ae.copy(aggregateFunction = Sum(need(cname)))
                  case None => ok = false; ae
                }
                case _ => ok = false; ae
              }
            case ae: AggregateExpression => ok = false; ae
          }.asInstanceOf[NamedExpression]
        }

        if (!ok) None else {
          val np = Project((newProj ++ passThrough.values).toSeq, mvPlan)
          val candidate = a.copy(aggregateExpressions = newAggs, child = np)
          if ((candidate.references -- np.outputSet).isEmpty) Some(candidate) else None
        }
      }
    }
  }
}
