package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object IntDot {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }
}

/** Native Catalyst expression for the integer dot product over two
  * ARRAY<BIGINT> columns — the quantized-similarity kernel
  * (`Similarity.topKQuantized`).
  *
  * Tier (b) of the custom-operator ladder: the HOF
  * `aggregate(zip_with(...))` tree ran INTERPRETED outside
  * whole-stage codegen (measured 2-7x slower, PLANS.md), and a Scala
  * UDF pays serialization + breaks the codegen span; this expression
  * is null-safe, reads `ArrayData` in place (primitive `getLong`, no
  * boxing, no Seq materialization) and generates a static call, so
  * the candidate-scoring projection stays one fused codegen stage.
  * Integer sums are order-exact, so the result is bit-identical to
  * the oracle's unrolled algebra.
  */
case class IntDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_dot"

  private def ok(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_int_dot requires two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    IntDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntDot.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): IntDotExpr =
    copy(left = newLeft, right = newRight)
}

object IntDotCol {
  /** Column-API surface for library code (no session registration
    * needed).
    */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(IntDotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
