package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the contract-enforcement pass a
  * pipeline runs before publishing a dataset (uniqueness, referential
  * integrity, domain/range rules), reported as one violations summary.
  *
  * Reference analog: the reference refuses structurally invalid
  * inserts one event at a time (`ensure_event` collision + dep checks,
  * /root/reference/crates/esvc-core/src/graph.rs); at table scale the
  * same guarantees become set-level checks.
  *
  * Scale shape: every check is ONE aggregate (or one anti-join) over
  * the table, each independently parallel; results union into a tiny
  * (check_name, n_violations) frame. Nothing ever collects; a failing
  * check's violating rows can be re-derived by filtering with the same
  * predicate.
  */
object QualityChecks {

  /** Duplicate-key violations: rows beyond the first per key. */
  def uniqueCheck(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Referential integrity: child rows whose fk has no parent pk
    * (null fks are not violations — use notNullCheck for that).
    * Anti-join; Catalyst broadcasts the parent key set when small.
    */
  def fkCheck(child: DataFrame, fk: String, parent: DataFrame, pk: String,
              name: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Rows violating an arbitrary row-level predicate (range, domain,
    * not-null, regexp...): one codegen'd conditional count at scan
    * speed.
    */
  def predicateCheck(df: DataFrame, name: String, mustHold: Column): DataFrame =
    df.agg(coalesce(sum(when(mustHold, 0L).otherwise(1L)), lit(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Union a batch of checks into the summary frame. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_))
}
