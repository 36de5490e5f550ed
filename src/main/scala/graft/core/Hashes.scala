package graft.core

import graft.functions.Blake2b
import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.immutable.SortedMap

/** Content-hash codec for event ids.
  *
  * Text form mirrors the reference: `"blake2b512:" + base64url(64 bytes,
  * no padding)` — /root/reference/crates/esvc-core/src/hash.rs:16-26.
  * Parsing validates prefix and decoded length (hash.rs:47-74).
  */
object Hashes {
  val Prefix = "blake2b512:"
  private val b64enc = java.util.Base64.getUrlEncoder.withoutPadding
  private val b64dec = java.util.Base64.getUrlDecoder

  /** blake2b512 digest of raw bytes, rendered in the reference text form. */
  def contentHash(dat: Array[Byte]): String =
    Prefix + b64enc.encodeToString(Blake2b.hash512(dat))

  def contentHash(s: String): String = contentHash(s.getBytes(StandardCharsets.UTF_8))

  /** Parse + validate the text form; Left(error) mirrors hash.rs:50-73. */
  def parse(s: String): Either[String, Array[Byte]] =
    if (!s.startsWith(Prefix)) {
      val p = s.indexOf(':') match { case -1 => s; case i => s.substring(0, i) }
      Left(s"invalid hash prefix '$p'")
    } else {
      val body = s.substring(Prefix.length)
      try {
        val raw = b64dec.decode(body)
        if (raw.length != 64) Left(s"concrete hash part is too short (got ${body.length}, expected 64)")
        else Right(raw)
      } catch {
        case e: IllegalArgumentException => Left(s"base64 decoding error: ${e.getMessage}")
      }
    }

  /** Canonical byte encoding of an event `(cmd, arg, deps)`.
    *
    * The reference hashes `bincode(Event)` and pins the layout forever
    * (/root/reference/crates/esvc-core/src/graph.rs:5-7, 140-141). We keep
    * the same contract — a deterministic, stable layout — with our own
    * format: little-endian lengths, deps sorted by key (SortedMap
    * guarantees order), bool as one byte.
    */
  def canonicalEncode(cmd: Int, arg: Array[Byte], deps: SortedMap[String, Boolean]): Array[Byte] = {
    var size = 4 + 8 + arg.length + 8
    deps.foreach { case (k, _) => size += 8 + k.length + 1 }
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(cmd)
    buf.putLong(arg.length.toLong)
    buf.put(arg)
    buf.putLong(deps.size.toLong)
    deps.foreach { case (k, hard) =>
      val kb = k.getBytes(StandardCharsets.UTF_8)
      buf.putLong(kb.length.toLong)
      buf.put(kb)
      buf.put(if (hard) 1.toByte else 0.toByte)
    }
    buf.array()
  }

  def eventHash(cmd: Int, arg: Array[Byte], deps: SortedMap[String, Boolean]): String =
    contentHash(canonicalEncode(cmd, arg, deps))
}
