package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, processed by batch-shaped
  * per-partition decoders — the Spark-side pattern for image/audio
  * feature extraction. The reference's analog is the WASM engine's
  * byte-opaque `Dat = Vec<u8>` contract
  * (/root/reference/crates/esvc-wasm/src/lib.rs:11-15).
  *
  * The actual media decode is STUBBED (this container ships no
  * image/audio codecs): [[FakeDecoder]] is a deterministic stand-in
  * with the same signature a real decoder (e.g. via JNI/FFI or a
  * Python `mapInPandas` stage) would have. Everything around it —
  * schema, binary payload handling, partition-batched iteration,
  * constant-memory streaming — is real and tested.
  */
object Multimodal {
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("payload_sha256", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  /** STUB media decoder: deterministic fake dimensions derived from the
    * payload bytes. A real implementation decodes the image header /
    * audio frames here; the call shape (bytes -> typed features) and
    * everything upstream/downstream of it is production-real.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (320 + (n % 320), 240 + (n % 240), if (n % 2 == 0) 3 else 1)
    }
  }

  /** Attach a binary payload column (here: the utf-8 bytes of the text,
    * standing in for a real media blob read from object storage).
    */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Batch feature extraction over the binary column: one decoder
    * instance per partition, streaming row-at-a-time (constant memory —
    * no per-partition materialization), hash + metadata out.
    */
  def extractFeatures(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      it.map { case (id, payload) =>
        val (w, h, c) = FakeDecoder.decode(payload)
        val digest = sha.digest(payload).map("%02x".format(_)).mkString
        sha.reset()
        (id, payload.length.toLong, digest, w, h, c)
      }
    }.toDF("doc_id", "n_bytes", "payload_sha256", "width", "height", "channels")
  }
}
