package graft.operators

import graft.exvc.{Address, Command, CommandKind, ExvcEngine}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level flavor of the exvc editor engine
  * (/root/reference/crates/exvc/src/en.rs:105-188): the same
  * address/command semantics applied to an `ArrayType(StringType)`
  * "lines" column via codegen'd array functions — one edit script runs
  * over billions of documents in a single projection, with Catalyst
  * caching literal regex compilation (the reference keeps a process-wide
  * regex cache for the same reason, en.rs:8-10).
  *
  * Span semantics (en.rs:105-156): numeric/`$` addresses select ONE
  * contiguous span (slice/concat); a regex address makes every line its
  * own span (per-element transform). The driver-side `Vector[String]`
  * engine ([[graft.exvc.ExvcEngine]]) is the semantic spec; this is its
  * distributed execution, and the two are property-tested against each
  * other.
  */
object ExvcColumns {
  private def litLines(ls: Vector[String]): Column =
    if (ls.isEmpty) array().cast("array<string>") else array(ls.map(lit): _*)

  /** Apply one exvc command to a lines-array column. */
  def apply(arr: Column, cmd: Command): Column = {
    // empty-data rule (en.rs:107-114): only `0,` and `$` select, as one
    // empty span -> the command runs once on an empty span
    val emptyResult: Column = cmd.addr match {
      case Address.RngF(0) | Address.Last => litLines(ExvcEngine.runCommand(cmd.kind, Vector.empty))
      case _ => array().cast("array<string>")
    }
    val nonEmpty = cmd.addr match {
      case Address.Rgx(pat) => perLine(arr, pat, cmd.kind)
      case a => contiguous(arr, a, cmd.kind)
    }
    when(size(arr) === 0, emptyResult).otherwise(nonEmpty)
  }

  /** Regex address: each line is its own span (en.rs:143-148). */
  private def perLine(arr: Column, pat: String, kind: CommandKind): Column = {
    import CommandKind._
    flatten(transform(arr, elem => {
      val sel = elem.rlike(pat)
      val spanResult: Column = kind match {
        case Append(ls) => concat(array(elem), litLines(ls))
        case Insert(ls) => concat(litLines(ls), array(elem))
        case Change(ls) => litLines(ls)
        case Delete => array().cast("array<string>")
        case Substitute(p, r) => array(regexp_replace(elem, p, r))
      }
      when(sel, spanResult).otherwise(array(elem))
    }))
  }

  /** Numeric / `$` address: one contiguous selected span
    * (en.rs:116-142, 149-154), realized as slice + command + concat.
    */
  private def contiguous(arr: Column, addr: Address, kind: CommandKind): Column = {
    import CommandKind._
    val n = size(arr)
    // (hasSelection, spanStart inclusive, spanEnd exclusive), 0-based
    val (hasSel, start, end) = addr match {
      case Address.Rng(s, e) =>
        if (s >= e) (lit(false), lit(0), lit(0))
        else (lit(s) < n, lit(s), least(lit(e), n))
      case Address.RngF(s) => (lit(s) <= n, lit(s), n)
      case Address.Last => (n > 0, n - 1, n)
      case Address.Rgx(_) => throw new IllegalArgumentException("regex handled by perLine")
    }
    val span = slice(arr, start + 1, greatest(end - start, lit(0)))
    val spanResult: Column = kind match {
      case Append(ls) => concat(span, litLines(ls))
      case Insert(ls) => concat(litLines(ls), span)
      case Change(ls) => litLines(ls)
      case Delete => array().cast("array<string>")
      case Substitute(p, r) => transform(span, x => regexp_replace(x, p, r))
    }
    when(!hasSel, arr).otherwise(
      concat(
        slice(arr, lit(1), start),
        spanResult,
        slice(arr, end + 1, greatest(n - end, lit(0)))))
  }

  /** Apply a whole edit script left-to-right. */
  def applyScript(arr: Column, cmds: Seq[Command]): Column =
    cmds.foldLeft(arr)((acc, c) => apply(acc, c))

  /** The sear/substitute text operator on a plain string column — the
    * reference's canonical demo transform (OP-21,
    * wasm-crates/example-sear/src/lib.rs:4-11), literally a Spark
    * built-in.
    */
  def sear(text: Column, search: String, replacement: String): Column =
    regexp_replace(text, java.util.regex.Pattern.quote(search),
      java.util.regex.Matcher.quoteReplacement(replacement))
}
