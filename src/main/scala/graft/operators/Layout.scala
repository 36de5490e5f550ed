package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout keys: Z-order (Morton) interleaving for
  * multi-dimension data clustering.
  *
  * Why this is a 100 TB operator: parquet file skipping prunes on
  * per-file min/max ranges, which only helps on the ordering key.
  * Sorting by the Morton interleave of TWO keys keeps both roughly
  * range-clustered, so predicates on either dimension skip most
  * files — the standard lakehouse layout trick (Delta/Iceberg
  * OPTIMIZE ZORDER). Implemented as pure column bit-algebra
  * (shiftleft/and/or folds) so it runs inside whole-stage codegen and
  * is mirror-able in the oracle SQL bit-for-bit.
  */
object Layout {

  /** Spread the low 16 bits of `x` so bit i lands at bit 2i
    * (the classic mask-shift doubling chain, 64-bit safe).
    */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys: x at even bits, y at odd. */
  def zvalue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Spread the low 31 bits of `x` so bit i lands at bit 2i — the
    * 64-bit doubling chain (one more mask-shift level than
    * [[spread16]]). 31 bits per dimension, not 32, so the interleaved
    * key stays NON-NEGATIVE in a signed 64-bit BIGINT: range
    * partitioning, min/max pruning and the proportional file split all
    * compare signed in both engines, and a sign-flipped z would
    * cluster the largest keys before the smallest.
    */
  def spread31(x: Column): Column = {
    val a = x.bitwiseAND(lit(0x7FFFFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val d = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x3333333333333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 62-bit Morton code of two 31-bit keys: x at even bits, y at odd.
    * The wide variant of [[zvalue]] — coordinates above 2^31-1 are
    * masked (16-bit [[zvalue]] masked at 65,535, which collided
    * z-keys exactly at the scales z-ordering exists for: row ids,
    * order keys and file offsets routinely exceed 16 bits at 100 TB;
    * 2^31 covers them with the key still a plain positive BIGINT).
    */
  def zvalue64(x: Column, y: Column): Column =
    spread31(x).bitwiseOR(shiftleft(spread31(y), 1))

  /** Rewrite `df` clustered by the Morton code of (xCol, yCol):
    * range-partition + in-partition sort on the z-value, so each
    * output file covers a compact z-range (tight min/max on BOTH
    * dimensions). The sort is the shuffle; nothing else moves.
    */
  def zOrderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  partitions: Int = 0): DataFrame = {
    val withZ = df.withColumn("__z", zvalue(col(xCol), col(yCol)))
    val sorted =
      (if (partitions > 0) withZ.repartitionByRange(partitions, col("__z"))
       else withZ.repartitionByRange(col("__z")))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
    sorted.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Zone-map audit of a z-ordered layout: bucket rows into `nFiles`
    * equal z-ranges (`z * nFiles / (max_z + 1)` — the proportional
    * range split a z-ordered write produces), compute each file's
    * min/max on BOTH dimensions, and report which files a predicate
    * `xCol BETWEEN pruneLo AND pruneHi` would actually scan.
    *
    * This is the query-side half of [[zOrderWrite]]'s 100 TB story:
    * parquet footers keep exactly these min/max stats, and the scan
    * planner skips any file whose range misses the predicate. The
    * audit makes the skip rate measurable (and oracle-checkable) as
    * pure BIGINT algebra — `n_rows`/`would_scan` per file. The only
    * non-scan-local step is the max-z scalar (broadcast one-row join),
    * then one shuffle for the per-file aggregate.
    */
  def zoneMap(df: DataFrame, xCol: String, yCol: String,
              nFiles: Int = 64, pruneLo: Long = 0L, pruneHi: Long = 0L): DataFrame = {
    val base = df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("z", zvalue(col("x"), col("y")))
    val maxZ = base.agg(max(col("z")).as("max_z"))
    base.join(broadcast(maxZ))
      .withColumn("file_id", expr(s"(z * $nFiles) DIV (max_z + 1)"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .withColumn("would_scan",
        !(col("max_x") < pruneLo || col("min_x") > pruneHi))
  }

  /** [[zoneMap]] over the 62-bit [[zvalue64]] key (31-bit
    * coordinates). The proportional split changes shape: `z * nFiles`
    * overflows BIGINT once z exceeds 2^57, so the wide variant
    * buckets by `z DIV (max_z DIV nFiles + 1)` — same equal-z-range
    * intent, overflow-free at any key width, and still pure BIGINT
    * algebra the oracle mirrors bit-for-bit.
    */
  def zoneMap64(df: DataFrame, xCol: String, yCol: String,
                nFiles: Int = 64, pruneLo: Long = 0L, pruneHi: Long = 0L): DataFrame = {
    val base = df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("z", zvalue64(col("x"), col("y")))
    val maxZ = base.agg(max(col("z")).as("max_z"))
    base.join(broadcast(maxZ))
      .withColumn("file_id", expr(s"z DIV ((max_z DIV $nFiles) + 1)"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .withColumn("would_scan",
        !(col("max_x") < pruneLo || col("min_x") > pruneHi))
  }
}
