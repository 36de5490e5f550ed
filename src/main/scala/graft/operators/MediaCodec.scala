package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{CRC32, Deflater}

/** From-spec media header codecs — pure-JVM byte parsing, no codec
  * libraries. Containers parsed:
  *
  *  - PNG  (RFC 2083 / W3C PNG spec): 8-byte signature, IHDR chunk —
  *    width/height as big-endian u32 at offsets 16/20, bit depth at 24,
  *    color type at 25.
  *  - BMP  (Windows BITMAPINFOHEADER): "BM" magic, little-endian i32
  *    width/height at offsets 18/22 (height may be negative =
  *    top-down), u16 bits-per-pixel at 28.
  *  - WAV  (RIFF): "RIFF"...."WAVE", then a chunk scan for "fmt " —
  *    u16 channel count, u32 sample rate, u16 bits-per-sample.
  *
  * Writers emit fully valid files (PNG includes CRC-32 chunk checksums
  * and a zlib-deflated IDAT; BMP pads rows to 4 bytes; WAV carries
  * 8-bit PCM), so the parsers are exercised against genuine payloads,
  * not hand-crafted header fragments. The reference's analog is the
  * byte-opaque module contract
  * (/root/reference/crates/esvc-wasm/src/lib.rs:11-15): media stays an
  * opaque binary column until a typed decode step.
  */
object MediaCodec {
  /** Parsed container metadata. Sentinel 0 (not null) for fields the
    * container lacks, so downstream schemas stay non-nullable INT —
    * a deliberate choice for byte-stable oracle comparison.
    */
  final case class Meta(kind: String, width: Int, height: Int,
                        channels: Int, sampleRate: Int, bitDepth: Int)

  val Unknown: Meta = Meta("unknown", 0, 0, 0, 0, 0)

  private val PngSig = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  // ---- readers -------------------------------------------------------

  def decode(p: Array[Byte]): Meta =
    if (p == null) Unknown
    else if (isPng(p)) decodePng(p)
    else if (isBmp(p)) decodeBmp(p)
    else if (isWav(p)) decodeWav(p)
    else if (Jpeg.isJpeg(p)) decodeJpeg(p)
    else Unknown

  private def decodeJpeg(p: Array[Byte]): Meta =
    Jpeg.frameHeader(p) match {
      case Some((prec, h, w, nc)) => Meta("jpeg", w, h, nc, 0, prec)
      case None => Unknown
    }

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 33 && (0 until 8).forall(i => p(i) == PngSig(i))

  private def isBmp(p: Array[Byte]): Boolean =
    p.length >= 54 && p(0) == 'B' && p(1) == 'M'

  private def isWav(p: Array[Byte]): Boolean =
    p.length >= 44 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  private def be32(p: Array[Byte], o: Int): Int =
    ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) | ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)

  private def le32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) | ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)

  private def le16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)

  private def decodePng(p: Array[Byte]): Meta = {
    // first chunk must be IHDR: length(4) type(4) at offset 8
    if (!(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')) return Unknown
    val w = be32(p, 16)
    val h = be32(p, 20)
    val bitDepth = p(24) & 0xff
    val channels = (p(25) & 0xff) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // indexed
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => 0
    }
    Meta("png", w, h, channels, 0, bitDepth)
  }

  private def decodeBmp(p: Array[Byte]): Meta = {
    val w = le32(p, 18)
    val h = math.abs(le32(p, 22)) // negative = top-down row order
    val bpp = le16(p, 28)
    Meta("bmp", w, h, math.max(bpp / 8, 1), 0, bpp)
  }

  private def decodeWav(p: Array[Byte]): Meta = {
    // RIFF chunk scan: [id(4) size(4) data(size, word-aligned)]*
    var o = 12
    while (o + 8 <= p.length) {
      val size = le32(p, o + 4)
      if (size < 0) return Unknown // corrupted size: no backward/stalled scan
      if (p(o) == 'f' && p(o + 1) == 'm' && p(o + 2) == 't' && p(o + 3) == ' ' && o + 8 + 16 <= p.length) {
        val channels = le16(p, o + 10)
        val rate = le32(p, o + 12)
        val bits = le16(p, o + 22)
        return Meta("wav", 0, 0, channels, rate, bits)
      }
      o += 8 + size + (size & 1)
    }
    Unknown
  }

  // ---- writers -------------------------------------------------------

  /** Greyscale 8-bit PNG (color type 0): `content` laid out
    * row-major as pixel bytes, zero-padded/truncated to width*height.
    */
  def png(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    val ihdr = new Array[Byte](13)
    wbe32(ihdr, 0, width); wbe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: greyscale
    chunk(out, "IHDR", ihdr)
    // scanlines: filter byte 0 + width pixels per row
    val raw = new Array[Byte]((width + 1) * height)
    var r = 0
    while (r < height) {
      var c = 0
      while (c < width) {
        val i = r * width + c
        raw(r * (width + 1) + 1 + c) = if (i < content.length) content(i) else 0
        c += 1
      }
      r += 1
    }
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** 24-bit bottom-up BMP: `content` as BGR byte triples row-major,
    * zero-padded to width*height*3, rows padded to 4-byte boundaries.
    */
  def bmp24(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val rowSize = (width * 3 + 3) / 4 * 4
    val fileSize = 54 + rowSize * height
    val p = new Array[Byte](fileSize)
    p(0) = 'B'; p(1) = 'M'
    wle32(p, 2, fileSize)
    wle32(p, 10, 54) // pixel data offset
    wle32(p, 14, 40) // BITMAPINFOHEADER size
    wle32(p, 18, width)
    wle32(p, 22, height)
    wle16(p, 26, 1) // planes
    wle16(p, 28, 24) // bpp
    var r = 0
    while (r < height) {
      var b = 0
      while (b < width * 3) {
        val i = r * width * 3 + b
        p(54 + r * rowSize + b) = if (i < content.length) content(i) else 0
        b += 1
      }
      r += 1
    }
    p
  }

  /** Mono 8-bit PCM WAV at `sampleRate`: `content` bytes are the
    * samples.
    */
  def wav8(content: Array[Byte], sampleRate: Int): Array[Byte] = {
    val p = new Array[Byte](44 + content.length)
    def tag(o: Int, s: String): Unit = { val b = s.getBytes(US_ASCII); System.arraycopy(b, 0, p, o, 4) }
    tag(0, "RIFF"); wle32(p, 4, 36 + content.length); tag(8, "WAVE")
    tag(12, "fmt "); wle32(p, 16, 16)
    wle16(p, 20, 1) // PCM
    wle16(p, 22, 1) // mono
    wle32(p, 24, sampleRate)
    wle32(p, 28, sampleRate) // byte rate = rate * channels * bits/8
    wle16(p, 32, 1) // block align
    wle16(p, 34, 8) // bits per sample
    tag(36, "data"); wle32(p, 40, content.length)
    System.arraycopy(content, 0, p, 44, content.length)
    p
  }

  // ---- transforms (real pixel/sample manipulation, not stubs) -------

  /** Nearest-neighbor half-resize of a 24bpp bottom-up BMP: keep every
    * even-indexed pixel/row -> ceil(w/2) x ceil(h/2). Non-BMP or
    * foreign BMP flavors pass through unchanged.
    */
  def bmpResizeHalf(p: Array[Byte]): Array[Byte] = {
    if (!isBmp(p)) return p
    val w = le32(p, 18); val h = le32(p, 22); val bpp = le16(p, 28)
    if (w <= 0 || h <= 0 || bpp != 24) return p
    val rowSize = (w * 3 + 3) / 4 * 4
    if (54 + rowSize.toLong * h > p.length) return p
    val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
    val content = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = 54 + (2 * y) * rowSize + 3 * (2 * x)
        val dst = (y * w2 + x) * 3
        content(dst) = p(src); content(dst + 1) = p(src + 1); content(dst + 2) = p(src + 2)
        x += 1
      }
      y += 1
    }
    bmp24(content, w2, h2)
  }

  /** Nearest-neighbor half-resize of an 8-bit greyscale filter-0 PNG
    * (the flavor [[png]] emits): inflate the scanlines, keep every
    * even pixel/row, re-emit a valid PNG. Other PNG flavors (or
    * non-PNG) pass through — resampling filtered/interlaced/color
    * PNGs needs a full decoder.
    */
  def pngResizeHalf(p: Array[Byte]): Array[Byte] = {
    if (!isPng(p)) return p
    val m = decodePng(p)
    if (m.kind != "png" || m.bitDepth != 8 || m.channels != 1 || m.width <= 0 || m.height <= 0) return p
    // collect IDAT payloads (chunk walk from the first chunk)
    val idat = new ByteArrayOutputStream()
    var o = 8
    var ok = true
    while (ok && o + 8 <= p.length) {
      val len = be32(p, o)
      if (len < 0 || o + 12 + len > p.length) ok = false
      else {
        val typ = new String(p, o + 4, 4, US_ASCII)
        if (typ == "IDAT") idat.write(p, o + 8, len)
        o += 12 + len
        if (typ == "IEND") o = p.length
      }
    }
    if (!ok) return p
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte]((m.width + 1) * m.height)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return p // truncated stream
        got += n
      }
    } finally inf.end()
    if (got != raw.length) return p // unexpected layout: leave untouched
    // verify filter-0 rows, then sample even pixels of even rows
    var r = 0
    while (r < m.height) {
      if (raw(r * (m.width + 1)) != 0) return p
      r += 1
    }
    val w2 = (m.width + 1) / 2; val h2 = (m.height + 1) / 2
    val content = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        content(y * w2 + x) = raw((2 * y) * (m.width + 1) + 1 + 2 * x)
        x += 1
      }
      y += 1
    }
    png(content, w2, h2)
  }

  /** Sample decimation of our 8-bit mono PCM WAV: keep every
    * `factor`-th sample, divide the sample rate — the audio analog of
    * frame sampling. Non-WAV (or non-8-bit/mono) passes through.
    */
  def wavDownsample(p: Array[Byte], factor: Int): Array[Byte] = {
    if (!isWav(p) || factor <= 1) return p
    val m = decodeWav(p)
    if (m.kind != "wav" || m.channels != 1 || m.bitDepth != 8) return p
    // our writer puts the data chunk at 36; verify before trusting it
    if (!(p(36) == 'd' && p(37) == 'a' && p(38) == 't' && p(39) == 'a')) return p
    val len = le32(p, 40)
    if (len < 0 || 44 + len > p.length) return p
    val out = new Array[Byte]((len + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = p(44 + i * factor); i += 1 }
    wav8(out, m.sampleRate / factor)
  }

  private def wbe32(p: Array[Byte], o: Int, v: Int): Unit = {
    p(o) = (v >>> 24).toByte; p(o + 1) = (v >>> 16).toByte
    p(o + 2) = (v >>> 8).toByte; p(o + 3) = v.toByte
  }
  private def wle32(p: Array[Byte], o: Int, v: Int): Unit = {
    p(o) = v.toByte; p(o + 1) = (v >>> 8).toByte
    p(o + 2) = (v >>> 16).toByte; p(o + 3) = (v >>> 24).toByte
  }
  private def wle16(p: Array[Byte], o: Int, v: Int): Unit = {
    p(o) = v.toByte; p(o + 1) = (v >>> 8).toByte
  }

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); wbe32(len, 0, data.length); out.write(len, 0, 4)
    val t = typ.getBytes(US_ASCII)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    val c = new Array[Byte](4); wbe32(c, 0, crc.getValue.toInt); out.write(c, 0, 4)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new ByteArrayOutputStream()
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }
}
