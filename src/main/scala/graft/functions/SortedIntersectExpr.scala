package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static kernel shared by interpreted eval and generated code. */
object SortedIntersect {
  /** |A ∩ B| of two arrays SORTED ascending by Spark's binary string
    * order (`sort_array` output) with distinct elements — a single
    * merge walk over in-place `UTF8String` views: zero allocation, no
    * per-call hash set, O(|A| + |B|). Null ELEMENTS are skipped
    * defensively (a null never matches anything, so skipping preserves
    * the intersection count on otherwise-valid input and keeps a SQL
    * caller's stray null from NPE-ing inside codegen); `sort_array`
    * places nulls first, so the skip is a prefix walk.
    */
  def interSize(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }
}

/** Native Catalyst expression: intersection size of two SORTED
  * distinct ARRAY<STRING> columns (the set-similarity verify kernel —
  * `SetSimJoin.jaccardJoin` scores every candidate pair with it).
  *
  * Tier (b) of the custom-operator ladder, same rationale as
  * [[IntDotExpr]]: built-in `size(array_intersect(...))` builds a hash
  * set per ROW (per candidate pair — hundreds of millions of rows in a
  * soak), which is allocation-bound exactly where the query is
  * hottest; the inputs are already `sort_array`ed, so a merge walk
  * needs zero allocation and stays inside whole-stage codegen.
  * `UTF8String.compareTo` is the same binary ordering `sort_array`
  * sorts by, so the walk is exact. PRECONDITION (callers'): both
  * arrays sorted ascending, elements distinct and non-null —
  * `sort_array(collect_list(...))` over a distinct stream satisfies
  * it. Counts match `size(array_intersect)` exactly on such inputs,
  * so oracle parity is untouched.
  */
case class SortedIntersectExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_n"

  private def ok(t: DataType) = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect_n requires two ARRAY<STRING> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.interSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SortedIntersect.interSize($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersectExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCol {
  /** Column-API surface for library code (no session registration
    * needed).
    */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
