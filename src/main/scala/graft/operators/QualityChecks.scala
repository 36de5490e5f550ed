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

  /** Per-stratum winsorization report: clamp a metric to its
    * [loPermille, hiPermille] order statistics and report the outlier
    * counts plus the clamped total — the robust-statistics sibling of
    * the anomaly flags (a fat-tailed metric otherwise lets one whale
    * dominate every mean).
    *
    * Cross-engine exactness by construction: the metric is quantized
    * to integer cents FIRST, and the cutoffs are exact rank-k order
    * statistics over (cents, seq) — max(1, n*lo DIV 1000) and
    * min(n, n*hi DIV 1000 + 1) — never interpolated percentiles,
    * whose float formula (and hence the clamp boundary) is
    * engine-specific. One shuffle: ranks, per-stratum totals and the
    * cutoff broadcast all ride the same window partitioning, then one
    * co-partitioned aggregate.
    */
  def winsorizedStats(rows: DataFrame, strataCol: String, valueCol: String,
                      seqCol: String, loPermille: Int = 50,
                      hiPermille: Int = 950): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(strataCol))
      .orderBy(col("__c"), col(seqCol))
    val wAll = Window.partitionBy(col(strataCol))
    val loRk = greatest(lit(1L), expr(s"__n * $loPermille DIV 1000"))
    val hiRk = least(col("__n"), expr(s"__n * $hiPermille DIV 1000") + lit(1L))
    rows
      .withColumn("__c", round(col(valueCol) * 100).cast("long"))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__lo", max(when(col("__rn") === loRk, col("__c"))).over(wAll))
      .withColumn("__hi", max(when(col("__rn") === hiRk, col("__c"))).over(wAll))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__c") < col("__lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("__c") > col("__hi"), 1L).otherwise(0L)).as("n_above"),
        sum(greatest(least(col("__c"), col("__hi")), col("__lo"))).as("clamped_cents"),
        max(col("__lo")).as("lo_cents"),
        max(col("__hi")).as("hi_cents"))
  }
}
