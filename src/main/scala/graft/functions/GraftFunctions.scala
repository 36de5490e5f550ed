package graft.functions

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** SQL registration for the library's scalar primitives, so a pure-SQL
  * user (spark.sql / Thrift / notebook) can reach the engine's
  * fingerprinting algebra without the Scala column API:
  *
  * {{{
  * GraftFunctions.registerAll(spark)
  * spark.sql("SELECT doc_id, graft_simhash64(text) FROM docs")
  * }}}
  *
  * `blake2b512` is separate: it is a native Catalyst expression and is
  * injected by [[GraftExtensions]] (`spark.sql.extensions=graft.functions.GraftExtensions`),
  * which keeps it inside whole-stage codegen. The functions here are
  * the imperative scalar UDFs whose HOF-expression equivalents
  * measured 2-7x slower outside codegen (see PLANS.md) — for them the
  * UDF IS the fast path.
  */
object GraftFunctions {
  /** Register `blake2b512(binary) -> binary` with the session so SQL
    * and `expr(...)` can use it; the reference text form is then
    * `concat('blake2b512:', <base64url no-pad>)`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "blake2b512",
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Blake2b512Expr(exprs.head),
      "built-in")
    // integer dot product over two ARRAY<BIGINT> — native, codegen'd
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_int_dot",
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        IntDotExpr(exprs.head, exprs(1)),
      "built-in")
    // hamming distance — native, codegen'd (the UDF twin below keeps
    // the original graft_hamming name)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hamming_native",
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HammingExpr(exprs.head, exprs(1)),
      "built-in")
  }

  /** Register every scalar primitive (including blake2b512). */
  def registerAll(spark: SparkSession): Unit = {
    register(spark)
    // 64-bit content simhash of whitespace-tokenized text
    spark.udf.register("graft_simhash64", Dedup.simhash64)
    // hamming distance between two equal-length bit strings
    spark.udf.register("graft_hamming", Dedup.hammingFast)
    // word n-gram shingles of text (array<string>) — same algebra as
    // the column-API path (shared shingleArr core); total on null
    // (empty set, matching graft_winnow_fps's convention)
    spark.udf.register("graft_shingles",
      (text: String, n: Int) =>
        if (text == null) Array.empty[String]
        else Dedup.shingleArr(text.toLowerCase.split(" +").filter(_.nonEmpty).toSeq, n))
    // winnowing fingerprint set (MOSS): k-char grams, w-window minima
    spark.udf.register("graft_winnow_fps", Dedup.winnowUdf)
  }
}
