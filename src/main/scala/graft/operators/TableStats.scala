package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style per-column statistics collection — the optimizer-
  * feeding scan an engine runs over every table it manages (row
  * counts, null counts, NDV, min/max drive join ordering, broadcast
  * decisions and file skipping).
  *
  * Shape: melt the requested columns into (column_name, value) rows
  * with ONE scan (posexplode of a per-row struct array, column-pruned
  * to exactly the requested columns), then one groupBy(column_name)
  * aggregate with map-side combine. NDV is exact (count distinct);
  * at petabyte scale you'd swap in a sketch, but stats feeding an
  * optimizer at these cardinalities (stats rows = #columns) shuffle
  * almost nothing either way.
  */
object TableStats {

  /** Exact stats for numeric columns: one row per column with
    * (column_name, n, n_null, ndv, min_v, max_v); values go through
    * DOUBLE so mixed numeric types fit one output schema.
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val melted = df.select(posexplode(array(
      cols.map(c => struct(lit(c).as("column_name"), col(c).cast("double").as("v"))): _*)))
      .select(col("col.column_name"), col("col.v"))
    melted.groupBy("column_name")
      .agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col("v"))).as("n_null"),
        countDistinct(col("v")).as("ndv"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
  }
}
