package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink surface: the engine stores its tables as zstd parquet
  * (the reference's zstd-bincode persistence, columnar), but every
  * Spark batch format round-trips the same frames — this module pins
  * that contract and the partition-layout conventions.
  */
object Formats {
  /** Write `df` in the given format (parquet/orc/json/csv). */
  def write(df: DataFrame, path: String, format: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (format match {
      case "csv" => w.option("header", "true")
      case "parquet" | "orc" => w.option("compression", "zstd")
      case _ => w
    }).save(path)
  }

  def read(spark: SparkSession, path: String, format: String): DataFrame = {
    val r = spark.read.format(format)
    (format match {
      case "csv" => r.option("header", "true").option("inferSchema", "true")
      case _ => r
    }).load(path)
  }

  /** Raw-media file ingestion: `binaryFile` reads each file as one row
    * (path, modificationTime, length, content) — the entry path for
    * image/audio corpora that arrive as FILES on a store rather than
    * as rows in a table. Downstream decode is the same per-partition
    * MediaCodec parser the parquet-payload path uses
    * ([[graft.operators.Multimodal.extractFeatures]]); at scale
    * `spark.sql.files.maxPartitionBytes` packs many small files per
    * task, so a billion-file corpus does not mean a billion tasks.
    */
  def readBinary(spark: SparkSession, dir: String,
                 glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Write the event log partitioned by a low-cardinality column so
    * per-partition predicates prune whole directories at the scan
    * (PartitionFilters — asserted in FormatsSpec).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCol)
      .option("compression", "zstd")
      .parquet(path)
}
