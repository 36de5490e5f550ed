package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: makes the native functions available
  * to any session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * deployment-config path, complementing the programmatic
  * [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL front end: MATERIALIZE STATE / LINEARIZE EVENTS (delegating
    // parser — non-graft statements hit Spark's parser untouched)
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    ext.injectFunction((
      FunctionIdentifier("blake2b512"),
      new ExpressionInfo(classOf[Blake2b512Expr].getName, "blake2b512"),
      (exprs: Seq[Expression]) => Blake2b512Expr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_int_dot"),
      new ExpressionInfo(classOf[IntDotExpr].getName, "graft_int_dot"),
      (exprs: Seq[Expression]) => IntDotExpr(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming_native"),
      new ExpressionInfo(classOf[HammingExpr].getName, "graft_hamming_native"),
      (exprs: Seq[Expression]) => HammingExpr(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_n"),
      // the PRECONDITION is part of the SQL surface: a caller that
      // skips sort_array gets a silent undercount, so the contract
      // must be visible in DESCRIBE FUNCTION, not only in Scaladoc
      new ExpressionInfo(classOf[SortedIntersectExpr].getName, null,
        "graft_sorted_intersect_n",
        "graft_sorted_intersect_n(a, b) - Intersection size of two ARRAY<STRING> " +
          "columns. PRECONDITION: both arrays must be sorted ascending in Spark's " +
          "binary string order with distinct elements (sort_array(collect_set(...)) " +
          "or sort_array(collect_list(...)) over a distinct stream); unsorted input " +
          "silently undercounts. Null elements are skipped.",
        "> SELECT graft_sorted_intersect_n(array('a','b','c'), array('b','c','d'));\n   2"),
      (exprs: Seq[Expression]) => SortedIntersectExpr(exprs.head, exprs(1))))
  }
}
