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
  * Decoding is REAL from-spec container parsing ([[MediaCodec]]:
  * PNG IHDR, BMP BITMAPINFOHEADER, WAV RIFF/fmt — pure-JVM byte
  * parsing, since the container ships no codec libraries). Payloads
  * the parser does not recognize surface as kind `unknown` with
  * sentinel-0 metadata rather than failing the pipeline. Full
  * pixel/sample decode of compressed codecs (JPEG/MP3/H.264) would
  * slot into the same per-partition decoder via JNI/FFI or a Python
  * `mapInPandas` stage.
  */
object Multimodal {
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("payload_sha256", StringType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bit_depth", IntegerType)))

  /** Attach a binary payload column (here: the utf-8 bytes of the text,
    * standing in for a real media blob read from object storage).
    */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Attach a VALID media payload per document — the text bytes packed
    * into a PNG, BMP, WAV or JPEG container (by doc_id mod 4) with
    * dimensions derived from the byte length. Exercises the real
    * [[MediaCodec]] writers; the derivation formulas are plain integer
    * algebra so a SQL oracle can predict exactly what the parser must
    * recover from the bytes (construct -> parse round-trip check).
    */
  def withMediaPayload(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val mk = udf { (id: Long, text: String) =>
      val content = Option(text).getOrElse("").getBytes("UTF-8")
      val n = math.max(content.length, 1)
      (id % 4) match {
        case 0 =>
          val w = (n - 1) % 512 + 1
          MediaCodec.png(content, w, (n + w - 1) / w)
        case 1 =>
          val w = (n - 1) % 256 + 1
          MediaCodec.bmp24(content, w, (n + 3 * w - 1) / (3 * w))
        case 2 =>
          MediaCodec.wav8(content, 8000 + n % 8000)
        case _ =>
          val w = (n - 1) % 192 + 1
          Jpeg.jpeg(content, w, (n + w - 1) / w)
      }
    }
    docs.withColumn("payload", mk(col(idCol).cast("long"), col(textCol)))
  }

  /** Media transform stage: REAL pixel/sample manipulation per payload
    * kind — PNG/BMP/JPEG half-resize (nearest neighbor; JPEG via full
    * entropy decode -> sample -> re-encode), WAV 2x sample decimation;
    * unknown passes through. Per-partition streaming, same
    * constant-memory shape as [[extractFeatures]].
    */
  def transformMedia(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val out = MediaCodec.decode(payload).kind match {
          case "png" => MediaCodec.pngResizeHalf(payload)
          case "bmp" => MediaCodec.bmpResizeHalf(payload)
          case "wav" => MediaCodec.wavDownsample(payload, 2)
          case "jpeg" => Jpeg.resizeHalf(payload)
          case _ => payload
        }
        (id, out)
      }).toDF(idCol, "payload")
  }

  /** Batch feature extraction over the binary column: one decoder +
    * digest instance per partition, streaming row-at-a-time (constant
    * memory — no per-partition materialization), hash + parsed
    * container metadata out.
    */
  def extractFeatures(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      it.map { case (id, payload) =>
        val m = MediaCodec.decode(payload)
        val digest = sha.digest(payload).map("%02x".format(_)).mkString
        sha.reset()
        (id, payload.length.toLong, digest, m.kind, m.width, m.height, m.channels, m.sampleRate, m.bitDepth)
      }
    }.toDF("doc_id", "n_bytes", "payload_sha256", "kind",
      "width", "height", "channels", "sample_rate", "bit_depth")
  }
}
