package graft.operators

import java.io.ByteArrayOutputStream

/** From-spec baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman
  * entropy coding) — pure JVM, no codec libraries, same posture as the
  * PNG/BMP/WAV codecs in [[MediaCodec]]: media is an opaque binary
  * column until a typed decode step (the reference's byte-opaque module
  * contract, /root/reference/crates/esvc-wasm/src/lib.rs:11-15).
  *
  * Encoder: 8-bit greyscale, one 8x8-block component, self-describing
  * canonical Huffman tables written into DHT (12 DC symbols at code
  * length 4; all 162 run/size AC symbols at code length 8 — valid
  * canonical codes, no all-ones code, so any compliant decoder reads
  * the stream; compression is mildly worse than the Annex K tables,
  * which is irrelevant here).
  *
  * Decoder: generic baseline — parses DQT (8/16-bit), DHT (spec F.2.2.3
  * MINCODE/MAXCODE/VALPTR decode), SOF0/SOF1, DRI + RSTn restart
  * markers, byte-stuffed entropy data; full pixel reconstruction for
  * single-component non-subsampled scans (the flavor the encoder
  * emits), header-only metadata for everything else. Corrupted or
  * truncated input returns None / Unknown — never throws.
  */
object Jpeg {

  /** Natural (row-major) index of each zigzag position, T.81 Figure A.6. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Flat-ish luminance quantization table (natural order): DC and low
    * frequencies at 1 (near-exact round trip for the oracle's pixel
    * checks), mild high-frequency rounding. Kept deliberately gentle so
    * the encode->decode error bound stays small and testable.
    */
  private val Quant: Array[Int] = {
    val q = new Array[Int](64)
    var v = 0
    while (v < 8) { var u = 0; while (u < 8) { q(v * 8 + u) = 1 + ((u + v) >> 2); u += 1 }; v += 1 }
    q
  }

  // cosine basis c(x)(u) = cos((2x+1) u pi / 16), shared by FDCT/IDCT
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16)
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  // ---- canonical Huffman tables the encoder writes ------------------

  // DC: symbols 0..11 (magnitude categories), all at code length 4
  private val DcSymbols: Array[Int] = (0 to 11).toArray
  // AC: EOB, ZRL, then (run<<4 | size) for run 0..15, size 1..10 — the
  // complete baseline symbol set, all at code length 8
  private val AcSymbols: Array[Int] =
    Array(0x00, 0xf0) ++ (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)

  private val DcCode: Array[Int] = Array.tabulate(12)(identity) // canonical: 0..11 at len 4
  private val AcCode: Map[Int, Int] = AcSymbols.zipWithIndex.toMap // canonical: 0..161 at len 8

  // ---- encoder -------------------------------------------------------

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { put(0xff, 8 - nbits) } // pad with 1s
  }

  private def magnitude(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode `content` bytes as the pixels of a width x height 8-bit
    * greyscale baseline JPEG (row-major, zero-padded/truncated —
    * mirrors [[MediaCodec.png]]'s packing contract).
    */
  def jpeg(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg: non-positive dimensions")
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m); val n = body.length + 2
      out.write((n >> 8) & 0xff); out.write(n & 0xff); out.write(body, 0, body.length)
    }
    marker(0xd8) // SOI
    // DQT: Pq=0 (8-bit), Tq=0, 64 values in zigzag order
    seg(0xdb, Array[Byte](0) ++ Array.tabulate(64)(i => Quant(Zigzag(i)).toByte))
    // SOF0: precision 8, 1 component id=1, sampling 1x1, quant table 0
    seg(0xc0, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      1, 1, 0x11, 0))
    // DHT: DC class 0 id 0 (12 symbols at length 4), AC class 1 id 0
    // (162 symbols at length 8)
    val dcBits = new Array[Byte](16); dcBits(3) = 12
    seg(0xc4, Array[Byte](0x00) ++ dcBits ++ DcSymbols.map(_.toByte))
    val acBits = new Array[Byte](16); acBits(7) = 162.toByte
    seg(0xc4, Array[Byte](0x10) ++ acBits ++ AcSymbols.map(_.toByte))
    // SOS: 1 component, DC/AC table 0, full spectral selection
    seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))

    val bw = new BitWriter(out)
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var pred = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        // load block with edge replication (T.81 recommended padding:
        // repeat last sample so padding adds no high-frequency energy)
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, height - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, width - 1)
            val i = sy * width + sx
            val s = if (i < content.length) content(i) & 0xff else 0
            block(y * 8 + x) = s - 128.0
            x += 1
          }
          y += 1
        }
        // FDCT + quantize, directly into zigzag order
        var zi = 0
        while (zi < 64) {
          val nat = Zigzag(zi)
          val u = nat & 7; val v = nat >> 3
          var sum = 0.0
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              sum += block(yy * 8 + xx) * Cos(xx)(u) * Cos(yy)(v)
              xx += 1
            }
            yy += 1
          }
          val cu = if (u == 0) InvSqrt2 else 1.0
          val cv = if (v == 0) InvSqrt2 else 1.0
          coef(zi) = math.round(sum * cu * cv / (4.0 * Quant(nat))).toInt
          zi += 1
        }
        // DC difference
        val diff = coef(0) - pred
        pred = coef(0)
        val dsz = magnitude(diff)
        bw.put(DcCode(dsz), 4)
        if (dsz > 0) bw.put(if (diff < 0) diff + (1 << dsz) - 1 else diff, dsz)
        // AC run-length
        var run = 0
        var k = 1
        while (k < 64) {
          if (coef(k) == 0) run += 1
          else {
            while (run > 15) { bw.put(AcCode(0xf0), 8); run -= 16 }
            val sz = magnitude(coef(k))
            bw.put(AcCode((run << 4) | sz), 8)
            bw.put(if (coef(k) < 0) coef(k) + (1 << sz) - 1 else coef(k), sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(AcCode(0x00), 8) // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder -------------------------------------------------------

  def isJpeg(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8

  /** Header-only metadata: scan markers for any SOFn frame header.
    * Returns (precision, height, width, ncomp) or None.
    */
  def frameHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (!isJpeg(p)) return None
    var o = 2
    while (o + 4 <= p.length) {
      if ((p(o) & 0xff) != 0xff) return None
      val m = p(o + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { o += 2 } // standalone
      else if (m == 0xd9) return None // EOI before a frame
      else {
        val len = ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
        if (len < 2 || o + 2 + len > p.length) return None
        val sof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (sof) {
          if (len < 8) return None
          val prec = p(o + 4) & 0xff
          val h = ((p(o + 5) & 0xff) << 8) | (p(o + 6) & 0xff)
          val w = ((p(o + 7) & 0xff) << 8) | (p(o + 8) & 0xff)
          val nc = p(o + 9) & 0xff
          return Some((prec, h, w, nc))
        }
        o += 2 + len
      }
    }
    None
  }

  // spec F.2.2.3 decode tables for one DHT table
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxcode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(code: Int, len: Int): Int = vals(valptr(len) + code - mincode(len))
  }

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false // RST/EOI seen — segment boundary
    var restartMarker = -1
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= p.length) { hitMarker = true; return -1 }
        var b = p(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= p.length) { hitMarker = true; return -1 }
          val b2 = p(pos) & 0xff; pos += 1
          if (b2 == 0x00) () // stuffed 0xff data byte
          else if (b2 >= 0xd0 && b2 <= 0xd7) { restartMarker = b2 - 0xd0; hitMarker = true; return -1 }
          else { hitMarker = true; return -1 } // EOI or junk
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { val b = bit(); if (b < 0) return -1; v = (v << 1) | b; i += 1 }
      v
    }
    def align(): Unit = { nbits = 0; hitMarker = false; restartMarker = -1 }
    def decode(t: HuffTable): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (t.maxcode(l) >= 0 && code <= t.maxcode(l)) return t.value(code, l)
        val b = bit(); if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1 // invalid code
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Full baseline pixel decode for single-component non-subsampled
    * scans (the encoder's flavor). Returns (width, height, greyscale
    * row-major pixels); None for other flavors or corrupted input.
    */
  def decodePixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!isJpeg(p)) return None
    try decodePixelsUnsafe(p) catch { case _: RuntimeException => None }
  }

  private def decodePixelsUnsafe(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val quant = new Array[Array[Int]](4) // natural order
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var width = 0; var height = 0
    var compQuant = 0
    var restartInterval = 0
    var o = 2
    var sos = -1
    var dcSel = 0; var acSel = 0
    while (sos < 0 && o + 4 <= p.length) {
      if ((p(o) & 0xff) != 0xff) return None
      val m = p(o + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { o += 2 }
      else if (m == 0xd9) return None
      else {
        val len = ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
        if (len < 2 || o + 2 + len > p.length) return None
        val b = o + 4 // segment body
        val end = o + 2 + len
        m match {
          case 0xdb => // DQT: one or more tables
            var q = b
            while (q < end) {
              val pq = (p(q) & 0xf0) >> 4; val tq = p(q) & 0x0f
              if (tq > 3) return None
              val n = if (pq == 0) 64 else 128
              if (q + 1 + n > end) return None
              val tab = new Array[Int](64)
              var i = 0
              while (i < 64) {
                val v = if (pq == 0) p(q + 1 + i) & 0xff
                        else ((p(q + 1 + 2 * i) & 0xff) << 8) | (p(q + 2 + 2 * i) & 0xff)
                tab(Zigzag(i)) = v
                i += 1
              }
              quant(tq) = tab
              q += 1 + n
            }
          case 0xc4 => // DHT: one or more tables
            var q = b
            while (q < end) {
              val tc = (p(q) & 0xf0) >> 4; val th = p(q) & 0x0f
              if (tc > 1 || th > 3 || q + 17 > end) return None
              val bits = Array.tabulate(16)(i => p(q + 1 + i) & 0xff)
              val total = bits.sum
              if (total > 256 || q + 17 + total > end) return None
              val vals = Array.tabulate(total)(i => p(q + 17 + i) & 0xff)
              val tab = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              q += 17 + total
            }
          case 0xc0 | 0xc1 => // SOF0/1 baseline
            if (len < 8) return None
            if ((p(b) & 0xff) != 8) return None // 8-bit precision only
            height = ((p(b + 1) & 0xff) << 8) | (p(b + 2) & 0xff)
            width = ((p(b + 3) & 0xff) << 8) | (p(b + 4) & 0xff)
            val nc = p(b + 5) & 0xff
            if (nc != 1) return None // pixel path: greyscale only
            if (b + 9 > end) return None
            if ((p(b + 7) & 0xff) != 0x11) return None // 1x1 sampling
            compQuant = p(b + 8) & 0x0f
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // progressive / hierarchical: metadata-only flavors
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = ((p(b) & 0xff) << 8) | (p(b + 1) & 0xff)
          case 0xda => // SOS
            val ns = p(b) & 0xff
            if (ns != 1 || b + 2 > end) return None
            dcSel = (p(b + 2) & 0xf0) >> 4
            acSel = p(b + 2) & 0x0f
            sos = end // entropy data starts after the header
          case _ => () // APPn, COM, others: skip
        }
        o = end
      }
    }
    if (sos < 0 || width <= 0 || height <= 0) return None
    // allocation guard: refuse pathological header dims (corrupted or
    // adversarial input) before touching a width*height buffer
    if (width.toLong * height > (1L << 26)) return None
    val qtab = quant(compQuant)
    val dc = dcTabs(dcSel); val ac = acTabs(acSel)
    if (qtab == null || dc == null || ac == null) return None

    val br = new BitReader(p, sos)
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    val pixels = new Array[Byte](width * height)
    val coef = new Array[Int](64)
    var pred = 0
    var mcu = 0
    val totalMcus = bw8.toLong * bh8
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // expect an RSTn; tolerate its absence (some encoders omit the last)
        if (!br.hitMarker) { while (!br.hitMarker && br.bit() >= 0) () }
        if (br.restartMarker < 0) return None
        br.align()
        pred = 0
      }
      java.util.Arrays.fill(coef, 0)
      val t = br.decode(dc)
      if (t < 0 || t > 11) return None
      val diffBits = if (t == 0) 0 else br.bits(t)
      if (diffBits < 0) return None
      pred += extend(diffBits, t)
      coef(0) = pred * qtab(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = br.decode(ac)
        if (rs < 0) return None
        val r = rs >> 4; val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else eob = true // EOB
        } else {
          k += r
          if (k > 63) return None
          val v = br.bits(s)
          if (v < 0) return None
          coef(Zigzag(k)) = extend(v, s) * qtab(Zigzag(k))
          k += 1
        }
      }
      // IDCT + level shift + clamp into the image (clip block overhang)
      val bx = (mcu % bw8) * 8
      val by = (mcu / bw8) * 8
      var y = 0
      while (y < 8) {
        val py = by + y
        if (py < height) {
          var x = 0
          while (x < 8) {
            val px = bx + x
            if (px < width) {
              var sum = 0.0
              var v = 0
              while (v < 8) {
                var u = 0
                while (u < 8) {
                  val cu = if (u == 0) InvSqrt2 else 1.0
                  val cv = if (v == 0) InvSqrt2 else 1.0
                  val c = coef(v * 8 + u)
                  if (c != 0) sum += cu * cv * c * Cos(x)(u) * Cos(y)(v)
                  u += 1
                }
                v += 1
              }
              val s = math.round(sum / 4.0 + 128.0).toInt
              pixels(py * width + px) = (if (s < 0) 0 else if (s > 255) 255 else s).toByte
            }
            x += 1
          }
        }
        y += 1
      }
      mcu += 1
    }
    Some((width, height, pixels))
  }

  /** Nearest-neighbor half-resize: full decode, keep even pixels/rows,
    * re-encode. Non-decodable input passes through unchanged (the
    * transform-stage contract shared with the other codecs).
    */
  def resizeHalf(p: Array[Byte]): Array[Byte] =
    decodePixels(p) match {
      case Some((w, h, px)) if w > 0 && h > 0 =>
        val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
        val out = new Array[Byte](w2 * h2)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) { out(y * w2 + x) = px(2 * y * w + 2 * x); x += 1 }
          y += 1
        }
        jpeg(out, w2, h2)
      case _ => p
    }
}
