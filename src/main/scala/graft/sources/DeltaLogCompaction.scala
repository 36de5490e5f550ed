package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layer compaction for the append-only DELTA-LOG artifacts
  * the streaming maintainers write (MV partial aggregates, CMS counter
  * deltas, HLL register deltas): rewrite the log to ONE row per key by
  * applying the artifact's own merge algebra, atomically swapping the
  * directory contents. Readers are unchanged — they already re-merge
  * on read, and merging a compacted log is the identical computation
  * over fewer rows (the merge functions are associative, which is
  * exactly why the delta-log design is correct in the first place).
  *
  * Compaction is an OPTIONAL storage job: it bounds artifact size
  * after many micro-batches (n_batches * keys rows -> keys rows), it
  * never changes any answer, and at 100 TB it runs as a periodic
  * partitioned rewrite exactly like any table-maintenance OPTIMIZE.
  *
  * The swap goes through a sibling `.compact.tmp` directory + two
  * renames, so a concurrent reader sees either the old log or the new
  * one, never a half-written mix; a concurrent WRITER must be paused
  * (the streaming maintainers own the artifact — same single-writer
  * contract every table-maintenance job has).
  */
object DeltaLogCompaction {
  /** Compact `path` to one row per `keys` row, merging every other
    * column with `merges` (e.g. `Map("c" -> sum, "r" -> max)`).
    * Returns (rowsBefore, rowsAfter).
    */
  def compact(spark: SparkSession, path: String, keys: Seq[String],
              merges: Map[String, Column => Column]): (Long, Long) = {
    val df = spark.read.parquet(path)
    val before = df.count()
    val aggs = df.columns.filterNot(keys.contains).map { c =>
      merges.getOrElse(c,
        sys.error(s"DeltaLogCompaction: no merge function for column $c"))(col(c)).as(c)
    }
    val compacted = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(df.columns.map(col): _*) // original column order
    val after = compacted.count()

    // swap through the path's own Hadoop FileSystem (java.io renames
    // only ever worked on the local disk — the artifact lives wherever
    // the pipeline's storage is)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".compact.tmp")
    val old = new org.apache.hadoop.fs.Path(p.getParent, p.getName + ".compact.old")
    fs.delete(tmp, true); fs.delete(old, true)
    compacted.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(p, old) || !fs.rename(tmp, p))
      sys.error(s"DeltaLogCompaction: atomic swap failed for $path")
    fs.delete(old, true) // retire the old log
    (before, after)
  }

  /** The three artifact shapes this repo's streaming maintainers
    * write, with their merge algebra.
    */
  def compactHourlyMv(spark: SparkSession, path: String): (Long, Long) =
    compact(spark, path, Seq("hour_bucket", "event_type"),
      Map("cnt" -> (sum(_)), "cents" -> (sum(_))))

  def compactCms(spark: SparkSession, path: String): (Long, Long) =
    compact(spark, path, Seq("row", "col"), Map("c" -> (sum(_))))

  def compactHllRegisters(spark: SparkSession, path: String): (Long, Long) =
    compact(spark, path, Seq("source", "j"), Map("r" -> (max(_))))
}
