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
  * PNG IHDR, BMP BITMAPINFOHEADER, WAV RIFF/fmt, and full baseline
  * [[Jpeg]] entropy decode — pure-JVM byte parsing, since the
  * container ships no codec libraries). Payloads the parser does not
  * recognize surface as kind `unknown` with sentinel-0 metadata
  * rather than failing the pipeline.
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
          // half the JPEG docs are baseline, half progressive (SOF2) —
          // the ~10%-of-the-web flavor; identical dimension formulas,
          // so the oracle's metadata algebra covers both sub-cases and
          // the progressive ones exercise the full G.2 decode path in
          // q_media_decode (frameHeader) AND q_media_transform
          // (entropy decode -> resample -> re-encode)
          if (id % 8 == 7) Jpeg.jpegProgressive(content, w, (n + w - 1) / w)
          else Jpeg.jpeg(content, w, (n + w - 1) / w)
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

  /** Perceptual difference hash (dHash) of an image payload: decode the
    * luma plane, box-resize to a 9x8 grid, emit 64 bits = "is cell
    * brighter than its right neighbor" per row. Robust to re-encoding,
    * scaling and small edits — the standard image near-dup fingerprint.
    * Supported payloads: JPEG (baseline or progressive, via
    * [[Jpeg.decodePixels]]) and BMP; everything else — including PNG,
    * whose IDAT inflate is deliberately out of scope for
    * [[MediaCodec]] — returns None and drops out of the band join.
    */
  private[operators] def dhashOf(payload: Array[Byte]): Option[String] = {
    val luma: Option[(Int, Int, Array[Byte])] = MediaCodec.decode(payload).kind match {
      case "jpeg" => Jpeg.decodePixels(payload)
      case "bmp" => bmpLuma(payload)
      case _ => None
    }
    luma.filter { case (w, h, _) => w >= 9 && h >= 8 }.map { case (w, h, px) =>
      // 9x8 box means (integer arithmetic — deterministic everywhere)
      val cells = Array.ofDim[Long](8, 9)
      val cnts = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val cy = math.min(y * 8 / h, 7)
        var x = 0
        while (x < w) {
          val cx = math.min(x * 9 / w, 8)
          cells(cy)(cx) += px(y * w + x) & 0xff
          cnts(cy)(cx) += 1
          x += 1
        }
        y += 1
      }
      val sb = new StringBuilder(64)
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          // compare mean brightness via cross-multiplication (exact)
          val l = cells(r)(c) * cnts(r)(c + 1)
          val rt = cells(r)(c + 1) * cnts(r)(c)
          sb.append(if (l > rt) '1' else '0')
          c += 1
        }
        r += 1
      }
      sb.result()
    }
  }

  // 24bpp bottom-up BMP -> luma plane (BT.601 on B,G,R byte order)
  private def bmpLuma(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val m = MediaCodec.decode(p)
    if (m.kind != "bmp" || m.bitDepth != 24 || m.width <= 0 || m.height <= 0) return None
    val w = m.width; val h = m.height
    val rowSize = (w * 3 + 3) / 4 * 4
    if (54 + rowSize.toLong * h > p.length) return None
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = 54 + (h - 1 - y) * rowSize + 3 * x // bottom-up rows
        val b = p(o) & 0xff; val g = p(o + 1) & 0xff; val r = p(o + 2) & 0xff
        out(y * w + x) = math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
          .min(255).max(0).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  val dhash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) => if (payload == null) None else dhashOf(payload) }

  /** Image near-duplicate pairs over a binary payload column: dHash
    * fingerprints, Manku-banded into `chunks` substrings, hot buckets
    * capped, codegen'd hamming verify. The image analog of
    * [[Dedup.simhashNearDup]] — candidates exist only inside a band
    * bucket, never all-pairs.
    *
    * RECALL CONTRACT (not a guarantee when maxHamming >= chunks): a
    * pair with hamming < `chunks` always shares an unchanged band; a
    * pair with hamming in [chunks, maxHamming] is caught only if its
    * differing bits leave some band untouched. To narrow that gap
    * without the candidate blow-up of 16 narrow bands, a SECOND
    * banding over the half-band-rotated fingerprint shifts the band
    * boundaries, so bit spreads that straddle every primary band
    * usually leave a rotated band clean. Pairs whose >= chunks
    * differing bits dodge both gratings are still missed — the same
    * recall/cost trade [[Dedup.simhashNearDup]] makes; lower
    * `maxHamming` toward `chunks - 1` when recall must be exact.
    */
  def imageNearDup(docs: DataFrame, payloadCol: String, idCol: String,
                   chunks: Int = 4, maxHamming: Int = 10,
                   bucketCap: Int = 128): DataFrame =
    bandedFingerprintPairs(
      docs.select(col(idCol).cast("long").as("doc_id"),
        dhash64(col(payloadCol)).as("dh")),
      chunks, maxHamming, bucketCap)

  /** Shared back half of the perceptual near-dup family (image dHash,
    * audio energy fingerprint): Manku banding of a 64-bit fingerprint
    * string with a second half-band-rotated grating, hot buckets
    * capped, codegen'd hamming verify on candidates only. Input must
    * carry (doc_id, dh); null fingerprints drop out of the band join.
    */
  private def bandedFingerprintPairs(fps: DataFrame, chunks: Int, maxHamming: Int,
                                     bucketCap: Int): DataFrame = {
    val width = 64 / chunks
    val dh = fps.filter(col("dh").isNotNull).localCheckpoint()
    // primary grating + half-band-rotated grating (distinct key spaces
    // via the "r" prefix); same shuffle key, one extra explode row set
    val rot = concat(substring(col("dh"), width / 2 + 1, 64 - width / 2),
      substring(col("dh"), 1, width / 2))
    val banded = Dedup.capBucket(
      dh.select(col("doc_id"), explode(array(
        (0 until chunks).map(c =>
          concat(lit(s"$c:"), substring(col("dh"), c * width + 1, width))) ++
        (0 until chunks).map(c =>
          concat(lit(s"r$c:"), substring(rot, c * width + 1, width))): _*)).as("chunk")),
      "chunk", "doc_id", bucketCap)
    val cand = banded.as("l").join(banded.as("r"), Seq("chunk"))
      .filter(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(dh.select(col("doc_id").as("doc_a"), col("dh").as("dh_a")), "doc_a")
      .join(dh.select(col("doc_id").as("doc_b"), col("dh").as("dh_b")), "doc_b")
      .withColumn("hamming",
        graft.functions.HammingCol(col("dh_a"), col("dh_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Energy-difference audio fingerprint of an 8-bit mono PCM WAV
    * payload — the Haitsma-Kalker robust-hash shape reduced to one
    * band: samples split into 65 equal frames, per-frame energy =
    * integer sum of squared deviations from the 128 bias, 64 bits =
    * "is frame i's energy > frame i+1's". Robust to uniform amplitude
    * jitter and resampling; pure integer algebra (deterministic
    * everywhere). None for non-WAV / non-8-bit / too-short payloads.
    */
  private[operators] def afpOf(payload: Array[Byte]): Option[String] = {
    val m = MediaCodec.decode(payload)
    if (m.kind != "wav" || m.channels != 1 || m.bitDepth != 8) return None
    // our writer's layout: data chunk header at 36 — verify, don't trust
    if (payload.length < 44 ||
        !(payload(36) == 'd' && payload(37) == 'a' && payload(38) == 't' && payload(39) == 'a'))
      return None
    val len = ((payload(40) & 0xff) | ((payload(41) & 0xff) << 8) |
      ((payload(42) & 0xff) << 16) | ((payload(43) & 0xff) << 24))
    if (len < 65 || 44 + len > payload.length) return None
    val frames = 65
    val energies = new Array[Long](frames)
    var f = 0
    while (f < frames) {
      // frame f covers samples [f*len/frames, (f+1)*len/frames)
      var j = f * len / frames
      val end = (f + 1) * len / frames
      var e = 0L
      while (j < end) {
        val d = (payload(44 + j) & 0xff) - 128
        e += d.toLong * d
        j += 1
      }
      energies(f) = e
      f += 1
    }
    val sb = new StringBuilder(64)
    var i = 0
    while (i < 64) { sb.append(if (energies(i) > energies(i + 1)) '1' else '0'); i += 1 }
    Some(sb.result())
  }

  val audioFp64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) => if (payload == null) None else afpOf(payload) }

  /** Audio near-duplicate pairs over a binary payload column: energy
    * fingerprints through the same banded-hamming machinery as
    * [[imageNearDup]] — candidates exist only inside a band bucket,
    * never all-pairs, with the identical recall contract.
    */
  def audioNearDup(docs: DataFrame, payloadCol: String, idCol: String,
                   chunks: Int = 4, maxHamming: Int = 10,
                   bucketCap: Int = 128): DataFrame =
    bandedFingerprintPairs(
      docs.select(col(idCol).cast("long").as("doc_id"),
        audioFp64(col(payloadCol)).as("dh")),
      chunks, maxHamming, bucketCap)

  /** Temporal-energy video fingerprint of a y4m payload: the first 65
    * frames' luma energy (integer sum of squared deviations from the
    * 128 mid-level), 64 bits = "is frame i's energy > frame i+1's" —
    * the Haitsma-Kalker shape of [[afpOf]] lifted from audio frames to
    * video frames. Streams one luma plane at a time (constant memory
    * regardless of clip length). None for non-y4m payloads or streams
    * shorter than 65 frames.
    */
  private[operators] def vfpOf(payload: Array[Byte]): Option[String] =
    Y4m.header(payload).flatMap { hdr =>
      val energies = new Array[Long](65)
      var n = 0
      val it = Y4m.lumaFrames(payload, hdr)
      while (it.hasNext && n < 65) {
        val f = it.next()
        var e = 0L
        var i = 0
        while (i < f.length) {
          val d = (f(i) & 0xff) - 128
          e += d.toLong * d
          i += 1
        }
        energies(n) = e
        n += 1
      }
      if (n < 65) None
      else {
        val sb = new StringBuilder(64)
        var i = 0
        while (i < 64) { sb.append(if (energies(i) > energies(i + 1)) '1' else '0'); i += 1 }
        Some(sb.result())
      }
    }

  val videoFp64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) => if (payload == null) None else vfpOf(payload) }

  /** Video near-duplicate pairs over a binary y4m payload column:
    * temporal-energy fingerprints through the same banded-hamming
    * machinery as [[imageNearDup]]/[[audioNearDup]] — candidates exist
    * only inside a band bucket, never all-pairs, identical recall
    * contract.
    */
  def videoNearDup(docs: DataFrame, payloadCol: String, idCol: String,
                   chunks: Int = 4, maxHamming: Int = 10,
                   bucketCap: Int = 128): DataFrame =
    bandedFingerprintPairs(
      docs.select(col(idCol).cast("long").as("doc_id"),
        videoFp64(col(payloadCol)).as("dh")),
      chunks, maxHamming, bucketCap)

  /** Deterministic planted video corpus for the oracle-gated video
    * near-dup pipeline: `n` y4m clips in `n/2` pairs — the video analog
    * of [[plantedAudio]], with the identical integer-energy algebra
    * moved from audio frames to 8x8 luma frames. Each even id is 65
    * frames whose alternate pixels sit at 128±amp with per-frame amp an
    * LCG-derived level in {20,40,60,80} (adjacent frames forced >= 20
    * apart, so inter-frame energy gaps are >= 64*(40^2-20^2) = 76800);
    * id+1 is the same clip with +1 amplitude jitter on an LCG-chosen
    * frame subset (energy delta <= 64*161 per frame — an order of
    * magnitude under every gap, so no comparison flips). Pairs mix
    * container flavors (even = C420jpeg with grey chroma, odd = Cmono),
    * so the pipeline proves both colorspace decode paths reconstruct
    * the same luma. TRUE pairs are exactly (2i, 2i+1) by construction.
    */
  def plantedVideo(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val mk = udf { (id: Long) =>
      val base = id / 2
      val jittered = id % 2 == 1
      def mix(a: Long, b: Long, c: Long): Long = {
        var x = a * 6364136223846793005L + b * 1442695040888963407L + c + 0x9e3779b97f4a7c15L
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
        x & Long.MaxValue
      }
      val frames = 65; val w = 8; val h = 8
      val amps = new Array[Int](frames)
      var i = 0
      while (i < frames) {
        var a = 20 * (1 + (mix(base, i, 19) % 4)).toInt // 20..80
        if (i > 0 && a == amps(i - 1)) a = if (a + 20 <= 80) a + 20 else a - 20
        amps(i) = a
        i += 1
      }
      if (jittered) {
        i = 0
        while (i < frames) {
          if (mix(base, i * 23L, 29) % 3 == 0) amps(i) += 1
          i += 1
        }
      }
      val planes = (0 until frames).map { f =>
        val luma = new Array[Byte](w * h)
        var j = 0
        while (j < w * h) {
          luma(j) = (if (j % 2 == 0) 128 + amps(f) else 128 - amps(f)).toByte
          j += 1
        }
        luma
      }
      if (jittered) Y4m.y4mMono(planes, w, h) else Y4m.y4m420(planes, w, h)
    }
    spark.range(n).select(col("id").as("doc_id"), mk(col("id")).as("payload"))
  }

  /** Deterministic planted image corpus for the oracle-gated image
    * near-dup pipeline: `n` images in `n/2` pairs. Each even id is a
    * 9x8 grid of 8x8-pixel blocks with LCG-derived intensities
    * (horizontal neighbors forced >= 30 levels apart); id+1 is the
    * same image with +3 jitter on an LCG-chosen block subset (one
    * direction only — enough to perturb without flipping any >= 30
    * level dHash comparison). By
    * construction (i, i+1) are dHash-identical-or-near and distinct
    * bases are ~32 bits apart, so the TRUE near-dup pairs are exactly
    * the planted ones — an integer-algebra fact a SQL oracle states
    * directly, while the engine must earn it through the full
    * encode -> decode -> dhash -> band-join pipeline.
    */
  /** Deterministic planted audio corpus for the oracle-gated audio
    * near-dup pipeline: `n` WAVs in `n/2` pairs. Each even id is 65
    * frames of 64 square-wave samples whose per-frame amplitude is an
    * LCG-derived level in {20,40,60,80} (adjacent frames forced >= 20
    * apart, so inter-frame energy gaps are >= 20*(A+A')*64 ~ 76k);
    * id+1 is the same signal with +1 amplitude jitter on an LCG-chosen
    * frame subset (energy delta <= 64*161 per frame — an order of
    * magnitude under every gap, so no energy comparison flips). The
    * TRUE near-dup pairs are exactly (2i, 2i+1) by integer algebra;
    * the engine must earn them through encode -> decode -> fingerprint
    * -> band join.
    */
  def plantedAudio(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val mk = udf { (id: Long) =>
      val base = id / 2
      val jittered = id % 2 == 1
      def mix(a: Long, b: Long, c: Long): Long = {
        var x = a * 6364136223846793005L + b * 1442695040888963407L + c + 0x9e3779b97f4a7c15L
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
        x & Long.MaxValue
      }
      val frames = 65; val perFrame = 64
      val amps = new Array[Int](frames)
      var i = 0
      while (i < frames) {
        var a = 20 * (1 + (mix(base, i, 11) % 4)).toInt // 20..80
        if (i > 0 && a == amps(i - 1)) a = if (a + 20 <= 80) a + 20 else a - 20
        amps(i) = a
        i += 1
      }
      if (jittered) {
        i = 0
        while (i < frames) {
          if (mix(base, i * 17L, 13) % 3 == 0) amps(i) += 1
          i += 1
        }
      }
      val content = new Array[Byte](frames * perFrame)
      i = 0
      while (i < frames) {
        var j = 0
        while (j < perFrame) {
          content(i * perFrame + j) =
            (if (j % 2 == 0) 128 + amps(i) else 128 - amps(i)).toByte
          j += 1
        }
        i += 1
      }
      MediaCodec.wav8(content, 8000)
    }
    spark.range(n).select(col("id").as("doc_id"), mk(col("id")).as("payload"))
  }

  def plantedImages(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val mk = udf { (id: Long) =>
      val base = id / 2
      val jittered = id % 2 == 1
      def mix(a: Long, b: Long, c: Long): Long = {
        var x = a * 6364136223846793005L + b * 1442695040888963407L + c + 0x9e3779b97f4a7c15L
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
        x & Long.MaxValue
      }
      val w = 72; val h = 64
      val vals = Array.ofDim[Int](8, 9)
      var cy = 0
      // pass 1: base grid + equal-neighbor fixup — IDENTICAL for both
      // members of a pair, so the pair differs only by the jitter
      while (cy < 8) {
        var cx = 0
        while (cx < 9) {
          var v = (30 * (1 + (mix(base, cx, cy * 131) % 7))).toInt // 30..210
          if (cx > 0 && v == vals(cy)(cx - 1)) v = if (v + 30 <= 210) v + 30 else v - 30
          vals(cy)(cx) = v
          cx += 1
        }
        cy += 1
      }
      if (jittered) {
        cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 9) {
            if (mix(base, cx * 17, cy * 257 + 1) % 3 == 0) vals(cy)(cx) += 3
            cx += 1
          }
          cy += 1
        }
      }
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = vals(y / 8)(x / 8).toByte
          val i = (y * w + x) * 3
          rgb(i) = v; rgb(i + 1) = v; rgb(i + 2) = v
          x += 1
        }
        y += 1
      }
      // jittered copies are PROGRESSIVE (SOF2) encodes: each pair mixes
      // container flavors, so the near-dup pipeline proves the two
      // decode paths reconstruct the same pixels (they are bit-identical
      // by construction — same quantized coefficients)
      if (jittered) Jpeg.jpegProgressiveColor420(rgb, w, h)
      else Jpeg.jpegColor420(rgb, w, h)
    }
    spark.range(n).select(col("id").as("doc_id"), mk(col("id")).as("payload"))
  }
}
