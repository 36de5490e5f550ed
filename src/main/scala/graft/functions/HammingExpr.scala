package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object Hamming {
  /** Positional mismatch count over the common prefix plus the length
    * difference — for equal-length simhash bit strings this is the
    * hamming distance; total on any input. Positions are Unicode CODE
    * POINTS (so this and the `graft_hamming` UDF agree on arbitrary
    * strings); pure-ASCII inputs — the simhash '0'/'1' hot path — take
    * an allocation-free byte scan, where byte == code point.
    */
  def dist(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < ab.length) { if (ab(i) < 0) ascii = false; i += 1 }
    i = 0
    while (ascii && i < bb.length) { if (bb(i) < 0) ascii = false; i += 1 }
    if (!ascii) codePointDist(a.toString, b.toString)
    else {
      val n = math.min(ab.length, bb.length)
      var d = 0
      i = 0
      while (i < n) { if (ab(i) != bb(i)) d += 1; i += 1 }
      d + math.abs(ab.length - bb.length)
    }
  }

  /** Code-point comparison path, shared with the UDF surface. */
  def codePointDist(a: String, b: String): Int = {
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    val n = math.min(ca.length, cb.length)
    var i = 0
    var d = 0
    while (i < n) { if (ca(i) != cb(i)) d += 1; i += 1 }
    d + math.abs(ca.length - cb.length)
  }
}

/** Native Catalyst expression for the hamming distance between two
  * simhash bit strings — the verify kernel of `Dedup.simhashNearDup`.
  *
  * Same tier-(b) rationale as [[IntDotExpr]]: the HOF
  * `zip_with(split...)` tree materializes two 64-element arrays per
  * pair outside whole-stage codegen, and the Scala UDF boxes both
  * UTF8Strings to java.lang.String per call; this expression reads the
  * UTF8String bytes in place (simhash strings are pure ASCII '0'/'1',
  * so byte compare == char compare) and generates a static call,
  * keeping the candidate-verify projection in one fused codegen stage.
  */
case class HammingExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hamming requires two STRING inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    Hamming.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Hamming.dist($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): HammingExpr =
    copy(left = newLeft, right = newRight)
}

object HammingCol {
  /** Column-API surface for library code (no session registration
    * needed).
    */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(HammingExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
