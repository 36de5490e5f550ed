package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL front end for the engine's state-materialization surface — the
  * `MATERIALIZE STATE` syntax SURVEY §7.3 deferred from v1. A
  * delegating [[ParserInterface]]: graft statements parse to the same
  * logical plans the DataFrame API builds (one code path, so the SQL
  * surface can never drift from the tested operators); everything else
  * passes through to Spark's parser verbatim.
  *
  * Grammar (case-insensitive; single-quoted dir is the sf parquet dir):
  *
  *   MATERIALIZE STATE FROM '<dir>' [FOR USER <id>]
  *     -> per-user final replayed state (run_foreach_recursively over
  *        the per-user event log; reference crates/esvc-core/src/
  *        state.rs run_foreach_recursively analog)
  *   LINEARIZE EVENTS FROM '<dir>'
  *     -> per-user replay order (calculate_dependencies linearization,
  *        reference workcache.rs topological order analog)
  *
  * The plan is BUILT at parse time but executed lazily by the caller
  * (`spark.sql(...)` analyzes/executes the returned plan) — identical
  * contract to Spark's own parser.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface) extends ParserInterface {

  private val Materialize =
    """(?is)\s*MATERIALIZE\s+STATE\s+FROM\s+'([^']+)'(?:\s+FOR\s+USER\s+(\d+))?\s*;?\s*""".r
  private val Linearize =
    """(?is)\s*LINEARIZE\s+EVENTS\s+FROM\s+'([^']+)'\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Materialize(dir, user) =>
      val df = graft.operators.EventReplay.replayPerUser(session, dir)
      val scoped = if (user == null) df else df.filter(col("user_id") === user.toLong)
      scoped.queryExecution.logical
    case Linearize(dir) =>
      graft.operators.EventReplay.linearize(session, dir).queryExecution.logical
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = sqlText match {
    case Materialize(_, _) | Linearize(_) => parsePlan(sqlText)
    case _ => delegate.parseQuery(sqlText)
  }

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}
