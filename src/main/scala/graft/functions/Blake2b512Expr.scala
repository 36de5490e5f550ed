package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native Catalyst expression for Blake2b-512 — the reference's event
  * content hash (/root/reference/crates/esvc-core/src/hash.rs:77-85).
  * A real `Expression` (not a UDF): null-safe, codegen'd via a static
  * call, so it stays inside whole-stage codegen in the hot path.
  */
case class Blake2b512Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "blake2b512"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"blake2b512 requires BINARY input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Blake2b.hash512(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Blake2b.hash512($c)")

  override protected def withNewChildInternal(newChild: Expression): Blake2b512Expr =
    copy(child = newChild)
}

