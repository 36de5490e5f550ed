package graft.operators

import java.io.ByteArrayOutputStream

/** From-spec baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman
  * entropy coding) — pure JVM, no codec libraries, same posture as the
  * PNG/BMP/WAV codecs in [[MediaCodec]]: media is an opaque binary
  * column until a typed decode step (the reference's byte-opaque module
  * contract, /root/reference/crates/esvc-wasm/src/lib.rs:11-15).
  *
  * Encoders: 8-bit greyscale ([[jpeg]]) and 4:2:0 YCbCr color
  * ([[jpegColor420]]), plus progressive (SOF2) twins
  * ([[jpegProgressive]] with successive approximation on both bands,
  * [[jpegProgressiveColor420]] with an interleaved DC scan and
  * per-component AC scans) — all with self-describing canonical
  * Huffman tables written into DHT (12 DC symbols at code length 4;
  * all 162 run/size AC symbols at code length 8 — valid canonical
  * codes, no all-ones code, so any compliant decoder reads the stream;
  * compression is mildly worse than the Annex K tables, which is
  * irrelevant here).
  *
  * Decoder: generic — parses DQT (8/16-bit), DHT (spec F.2.2.3
  * MINCODE/MAXCODE/VALPTR decode), SOF0/SOF1 baseline AND SOF2
  * progressive (spectral selection + successive approximation, G.2:
  * DC first/refine interleaved or not, AC first with EOB runs, AC
  * refinement with correction bits) with 1..3 components at sampling
  * factors 1..2 (4:4:4, 4:2:2, 4:2:0 and greyscale — the flavors that
  * cover real web corpora; ~10% of real web JPEGs are progressive),
  * DRI + RSTn restart markers, 0xff fill bytes before markers
  * (B.1.1.2), byte-stuffed entropy data, interleaved MCU walk with
  * per-component planes and box upsampling. [[decodePixels]] returns
  * the luma plane (what downstream feature extraction wants);
  * [[decodeRgb]] the full color rollout. Corrupted or truncated input
  * returns None / Unknown — never throws.
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

  /** Flat-ish quantization table (natural order): DC and low
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

  // cosine basis c(x)(u) = cos((2x+1) u pi / 16), shared by FDCT/IDCT.
  // StrictMath: bit-identical tables on every JVM/platform, so encode/
  // decode results are reproducible enough to pin in oracles
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16)
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  // ---- canonical Huffman tables the encoders write -------------------

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

  /** Load an 8x8 block from `plane` (pw x ph, values 0..255) at origin
    * (x0, y0), T.81 recommended edge replication, level-shifted.
    */
  private def loadBlock(plane: Array[Int], pw: Int, ph: Int, x0: Int, y0: Int): Array[Double] = {
    val block = new Array[Double](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(y0 + y, ph - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(x0 + x, pw - 1)
        block(y * 8 + x) = plane(sy * pw + sx) - 128.0
        x += 1
      }
      y += 1
    }
    block
  }

  /** FDCT + quantize one level-shifted block; coefficients returned in
    * ZIGZAG order (index = zigzag position, the order entropy coding
    * walks).
    */
  private def fdctQuant(block: Array[Double]): Array[Int] = {
    val coef = new Array[Int](64)
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
    coef
  }

  /** FDCT + quantize + Huffman-encode one block; returns the new DC
    * predictor for this component.
    */
  private def encodeBlock(bw: BitWriter, block: Array[Double], pred: Int): Int = {
    val coef = fdctQuant(block)
    val diff = coef(0) - pred
    val dsz = magnitude(diff)
    bw.put(DcCode(dsz), 4)
    if (dsz > 0) bw.put(if (diff < 0) diff + (1 << dsz) - 1 else diff, dsz)
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
    coef(0)
  }

  private def writeHeaders(out: ByteArrayOutputStream, width: Int, height: Int,
                           comps: Seq[(Int, Int)], // (id, HiVi byte)
                           sofMarker: Int = 0xc0, withSos: Boolean = true,
                           dri: Int = 0): Unit = {
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m); val n = body.length + 2
      out.write((n >> 8) & 0xff); out.write(n & 0xff); out.write(body, 0, body.length)
    }
    marker(0xd8) // SOI
    // DQT: Pq=0 (8-bit), Tq=0, 64 values in zigzag order (all
    // components share table 0 — legal and exact for our flat table)
    seg(0xdb, Array[Byte](0) ++ Array.tabulate(64)(i => Quant(Zigzag(i)).toByte))
    val sof = Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      comps.size.toByte) ++
      comps.flatMap { case (id, hv) => Seq(id.toByte, hv.toByte, 0.toByte) }
    seg(sofMarker, sof)
    val dcBits = new Array[Byte](16); dcBits(3) = 12
    seg(0xc4, Array[Byte](0x00) ++ dcBits ++ DcSymbols.map(_.toByte))
    val acBits = new Array[Byte](16); acBits(7) = 162.toByte
    seg(0xc4, Array[Byte](0x10) ++ acBits ++ AcSymbols.map(_.toByte))
    if (dri > 0) // DRI: restart every `dri` MCUs/blocks
      seg(0xdd, Array[Byte](((dri >> 8) & 0xff).toByte, (dri & 0xff).toByte))
    // SOS: all components use DC/AC table 0, full spectral selection
    if (withSos)
      seg(0xda, Array[Byte](comps.size.toByte) ++
        comps.flatMap { case (id, _) => Seq(id.toByte, 0x00.toByte) } ++
        Array[Byte](0, 63, 0))
  }

  /** One progressive SOS header: component ids (all on DC/AC table 0),
    * spectral band [ss, se], successive approximation ah -> al.
    */
  private def sosSegment(out: ByteArrayOutputStream, ids: Seq[Int],
                         ss: Int, se: Int, ah: Int, al: Int): Unit = {
    out.write(0xff); out.write(0xda)
    val n = 2 + 1 + 2 * ids.size + 3
    out.write((n >> 8) & 0xff); out.write(n & 0xff)
    out.write(ids.size)
    ids.foreach { id => out.write(id); out.write(0x00) }
    out.write(ss); out.write(se); out.write((ah << 4) | al)
  }

  /** DC diff coding of one point-transformed DC value; returns it as
    * the next predictor.
    */
  private def putDcDiff(bw: BitWriter, dcv: Int, pred: Int): Int = {
    val diff = dcv - pred
    val dsz = magnitude(diff)
    bw.put(DcCode(dsz), 4)
    if (dsz > 0) bw.put(if (diff < 0) diff + (1 << dsz) - 1 else diff, dsz)
    dcv
  }

  /** AC-first progressive coding of one block's band [1, 63] at point
    * transform `al` (G.1.2.2): sign-magnitude shift toward zero, runs +
    * per-block EOB (an EOB run of 1 — legal, mildly suboptimal).
    */
  private def putAcFirst(bw: BitWriter, coef: Array[Int], al: Int): Unit = {
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coef(k)
      val t = if (v < 0) -((-v) >> al) else v >> al
      if (t == 0) run += 1
      else {
        while (run > 15) { bw.put(AcCode(0xf0), 8); run -= 16 }
        val sz = magnitude(t)
        bw.put(AcCode((run << 4) | sz), 8)
        bw.put(if (t < 0) t + (1 << sz) - 1 else t, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(AcCode(0x00), 8)
  }

  /** AC refinement coding of one block (G.1.2.3, the libjpeg shape):
    * already-nonzero coefficients get a buffered correction bit (bit
    * `al` of the magnitude), newly nonzero ones are coded as run/1 +
    * sign; buffered bits flush after each symbol; trailing run and
    * corrections fold into a per-block EOB.
    */
  private def putAcRefine(bw: BitWriter, coef: Array[Int], al: Int): Unit = {
    var eobIdx = 0
    var k = 1
    while (k < 64) { if (math.abs(coef(k)) >> al == 1) eobIdx = k; k += 1 }
    val brBits = new scala.collection.mutable.ArrayBuffer[Int]()
    def flushBr(): Unit = { brBits.foreach(b => bw.put(b, 1)); brBits.clear() }
    var run = 0
    k = 1
    while (k < 64) {
      val t = math.abs(coef(k)) >> al
      if (t == 0) run += 1
      else {
        while (run > 15 && k <= eobIdx) { // ZRL, unless foldable into EOB
          bw.put(AcCode(0xf0), 8); run -= 16; flushBr()
        }
        if (t > 1) brBits += (t & 1) // nonzero history: correction bit
        else { // newly nonzero: run/1 + sign, then the buffered bits
          bw.put(AcCode((run << 4) | 1), 8)
          bw.put(if (coef(k) < 0) 0 else 1, 1)
          flushBr()
          run = 0
        }
      }
      k += 1
    }
    if (run > 0 || brBits.nonEmpty) { bw.put(AcCode(0x00), 8); flushBr() }
  }

  /** Progressive (SOF2) greyscale twin of [[jpeg]]: same pixels, four
    * scans exercising the full G.2 decode surface — DC first at Al=1,
    * AC first [1,63] at Al=1, then DC and AC refinement to Al=0
    * (successive approximation on both bands).
    */
  def jpegProgressive(content: Array[Byte], width: Int, height: Int,
                      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "jpegProgressive: non-positive dimensions")
    val plane = new Array[Int](width * height)
    var i = 0
    while (i < plane.length) { plane(i) = if (i < content.length) content(i) & 0xff else 0; i += 1 }
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    val blocks = Array.tabulate(bh8 * bw8)(b =>
      fdctQuant(loadBlock(plane, width, height, (b % bw8) * 8, (b / bw8) * 8)))
    val out = new ByteArrayOutputStream()
    writeHeaders(out, width, height, Seq((1, 0x11)), sofMarker = 0xc2, withSos = false,
      dri = restartInterval)
    // one scan body: per-block coding with RSTm every `restartInterval`
    // blocks (non-interleaved scans restart on BLOCK counts, RST index
    // cycling 0..7 and resetting per scan); `onRestart` resets whatever
    // prediction state the scan carries
    def scan(code: (BitWriter, Array[Int]) => Unit, onRestart: () => Unit = () => ()): Unit = {
      val w = new BitWriter(out)
      var u = 0
      while (u < blocks.length) {
        if (restartInterval > 0 && u > 0 && u % restartInterval == 0) {
          w.flush()
          out.write(0xff); out.write(0xd0 + ((u / restartInterval - 1) % 8))
          onRestart()
        }
        code(w, blocks(u))
        u += 1
      }
      w.flush()
    }
    sosSegment(out, Seq(1), 0, 0, 0, 1) // DC first, reduced precision
    locally {
      var pred = 0
      scan((w, c) => pred = putDcDiff(w, c(0) >> 1, pred), () => pred = 0)
    }
    sosSegment(out, Seq(1), 1, 63, 0, 1) // AC first, reduced precision
    scan((w, c) => putAcFirst(w, c, 1))
    sosSegment(out, Seq(1), 0, 0, 1, 0) // DC refinement: one raw bit per block
    scan((w, c) => w.put(c(0) & 1, 1))
    sosSegment(out, Seq(1), 1, 63, 1, 0) // AC refinement
    scan((w, c) => putAcRefine(w, c, 0))
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Progressive (SOF2) 4:2:0 color twin of [[jpegColor420]]: an
    * interleaved DC scan over all three components (the multi-component
    * MCU walk of G.2) followed by one full-band AC scan per component
    * (the non-interleaved per-component block raster, including the
    * subsampled chroma grids).
    */
  def jpegProgressiveColor420(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "jpegProgressiveColor420: non-positive dimensions")
    val (yP, cbP, crP, cw, ch) = rgbToPlanes420(rgb, width, height)
    val mcusX = (width + 15) / 16
    val mcusY = (height + 15) / 16
    def grid(plane: Array[Int], pw: Int, ph: Int, gw: Int, gh: Int): Array[Array[Int]] =
      Array.tabulate(gh * gw)(b =>
        fdctQuant(loadBlock(plane, pw, ph, (b % gw) * 8, (b / gw) * 8)))
    // DC scans cover the PADDED MCU grid; AC scans only the real blocks
    val yB = grid(yP, width, height, 2 * mcusX, 2 * mcusY)
    val cbB = grid(cbP, cw, ch, mcusX, mcusY)
    val crB = grid(crP, cw, ch, mcusX, mcusY)
    val out = new ByteArrayOutputStream()
    writeHeaders(out, width, height, Seq((1, 0x22), (2, 0x11), (3, 0x11)),
      sofMarker = 0xc2, withSos = false)
    sosSegment(out, Seq(1, 2, 3), 0, 0, 0, 0) // interleaved DC, full precision
    locally {
      val w = new BitWriter(out)
      var pY = 0; var pCb = 0; var pCr = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var v = 0
          while (v < 2) {
            var h = 0
            while (h < 2) {
              pY = putDcDiff(w, yB((2 * my + v) * (2 * mcusX) + 2 * mx + h)(0), pY)
              h += 1
            }
            v += 1
          }
          pCb = putDcDiff(w, cbB(my * mcusX + mx)(0), pCb)
          pCr = putDcDiff(w, crB(my * mcusX + mx)(0), pCr)
          mx += 1
        }
        my += 1
      }
      w.flush()
    }
    def acScan(id: Int, blocks: Array[Array[Int]], gw: Int, bwReal: Int, bhReal: Int): Unit = {
      sosSegment(out, Seq(id), 1, 63, 0, 0)
      val w = new BitWriter(out)
      var by = 0
      while (by < bhReal) {
        var bx = 0
        while (bx < bwReal) { putAcFirst(w, blocks(by * gw + bx), 0); bx += 1 }
        by += 1
      }
      w.flush()
    }
    acScan(1, yB, 2 * mcusX, (width + 7) / 8, (height + 7) / 8)
    acScan(2, cbB, mcusX, (cw + 7) / 8, (ch + 7) / 8)
    acScan(3, crB, mcusX, (cw + 7) / 8, (ch + 7) / 8)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode `content` bytes as the pixels of a width x height 8-bit
    * greyscale baseline JPEG (row-major, zero-padded/truncated —
    * mirrors [[MediaCodec.png]]'s packing contract).
    */
  def jpeg(content: Array[Byte], width: Int, height: Int,
           restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "jpeg: non-positive dimensions")
    val plane = new Array[Int](width * height)
    var i = 0
    while (i < plane.length) { plane(i) = if (i < content.length) content(i) & 0xff else 0; i += 1 }
    val out = new ByteArrayOutputStream()
    writeHeaders(out, width, height, Seq((1, 0x11)), dri = restartInterval)
    val bw = new BitWriter(out)
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    var pred = 0
    var unit = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          // byte-align, emit RSTm (m cycles 0..7), reset DC prediction
          bw.flush()
          out.write(0xff); out.write(0xd0 + ((unit / restartInterval - 1) % 8))
          pred = 0
        }
        pred = encodeBlock(bw, loadBlock(plane, width, height, bx * 8, by * 8), pred)
        unit += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode RGB triples (row-major, 3 bytes/pixel) as a 4:2:0 YCbCr
    * baseline JPEG — the dominant web-corpus flavor: Y at full
    * resolution (sampling 2x2), chroma box-averaged 2x2 (sampling
    * 1x1), interleaved 16x16 MCUs of 4 Y + 1 Cb + 1 Cr blocks.
    */
  def jpegColor420(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "jpegColor420: non-positive dimensions")
    val (yP, cbP, crP, cw, ch) = rgbToPlanes420(rgb, width, height)
    val out = new ByteArrayOutputStream()
    writeHeaders(out, width, height, Seq((1, 0x22), (2, 0x11), (3, 0x11)))
    val bw = new BitWriter(out)
    val mcusX = (width + 15) / 16
    val mcusY = (height + 15) / 16
    var predY = 0; var predCb = 0; var predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var v = 0
        while (v < 2) {
          var h = 0
          while (h < 2) {
            predY = encodeBlock(bw,
              loadBlock(yP, width, height, mx * 16 + h * 8, my * 16 + v * 8), predY)
            h += 1
          }
          v += 1
        }
        predCb = encodeBlock(bw, loadBlock(cbP, cw, ch, mx * 8, my * 8), predCb)
        predCr = encodeBlock(bw, loadBlock(crP, cw, ch, mx * 8, my * 8), predCr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** JFIF RGB -> (Y, Cb, Cr) planes with 2x2 box-averaged chroma; the
    * shared front half of the 4:2:0 encoders.
    */
  private def rgbToPlanes420(rgb: Array[Byte], width: Int, height: Int)
      : (Array[Int], Array[Int], Array[Int], Int, Int) = {
    val yP = new Array[Int](width * height)
    val cw = (width + 1) / 2; val ch = (height + 1) / 2
    val cbP = new Array[Int](cw * ch)
    val crP = new Array[Int](cw * ch)
    // full-res YCbCr (JFIF), then 2x2 box average for chroma
    val cbF = new Array[Double](width * height)
    val crF = new Array[Double](width * height)
    var i = 0
    while (i < width * height) {
      val r = if (3 * i < rgb.length) rgb(3 * i) & 0xff else 0
      val g = if (3 * i + 1 < rgb.length) rgb(3 * i + 1) & 0xff else 0
      val b = if (3 * i + 2 < rgb.length) rgb(3 * i + 2) & 0xff else 0
      val y = 0.299 * r + 0.587 * g + 0.114 * b
      yP(i) = math.max(0, math.min(255, math.round(y).toInt))
      cbF(i) = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
      crF(i) = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        var sb = 0.0; var sr = 0.0; var n = 0
        var dy = 0
        while (dy < 2) {
          val py = 2 * cy + dy
          if (py < height) {
            var dx = 0
            while (dx < 2) {
              val px = 2 * cx + dx
              if (px < width) { sb += cbF(py * width + px); sr += crF(py * width + px); n += 1 }
              dx += 1
            }
          }
          dy += 1
        }
        cbP(cy * cw + cx) = math.max(0, math.min(255, math.round(sb / n).toInt))
        crP(cy * cw + cx) = math.max(0, math.min(255, math.round(sr / n).toInt))
        cx += 1
      }
      cy += 1
    }
    (yP, cbP, crP, cw, ch)
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
      // optional 0xff fill bytes before any marker (T.81 B.1.1.2)
      while (o + 4 <= p.length && (p(o + 1) & 0xff) == 0xff) o += 1
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

  // one decoded frame component: sampling, tables, padded pixel plane
  private final class Comp(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var dcSel = 0
    var acSel = 0
    var pred = 0
    var plane: Array[Int] = null
    var planeW = 0
    var planeH = 0
    // progressive only: raw (unquantized, Al-scaled) DCT coefficients
    // accumulated across scans — one 64-int block per padded block
    var coefs: Array[Int] = null
    var bwPad = 0 // padded block grid (mcusX*h x mcusY*v)
    var bhPad = 0
    var bw = 0 // real block dims (non-interleaved scans code only these)
    var bh = 0
  }

  private final class Decoded(val width: Int, val height: Int,
                              val hmax: Int, val vmax: Int, val comps: Array[Comp])

  /** Full baseline decode into per-component planes. Supports 1..3
    * components at sampling factors 1..2 in a single interleaved scan
    * (greyscale, 4:4:4, 4:2:2, 4:2:0). None for other flavors or
    * corrupted input.
    */
  private def decodeFrame(p: Array[Byte]): Option[Decoded] = {
    val quant = new Array[Array[Int]](4) // natural order
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var width = 0; var height = 0
    var comps: Array[Comp] = null
    var restartInterval = 0
    var o = 2
    var sos = -1
    var progressive = false
    var progScans = 0
    var finished = false
    while (sos < 0 && !finished && o + 4 <= p.length) {
      if ((p(o) & 0xff) != 0xff) return None
      // optional 0xff fill bytes before any marker (T.81 B.1.1.2)
      while (o + 4 <= p.length && (p(o + 1) & 0xff) == 0xff) o += 1
      val m = p(o + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { o += 2 }
      else if (m == 0xd9) {
        // EOI: legal end for a progressive stream with >=1 decoded scan
        if (progressive && progScans > 0) finished = true else return None
      }
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
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 baseline, SOF2 progressive
            if (len < 8) return None
            if ((p(b) & 0xff) != 8) return None // 8-bit precision only
            progressive = m == 0xc2
            height = ((p(b + 1) & 0xff) << 8) | (p(b + 2) & 0xff)
            width = ((p(b + 3) & 0xff) << 8) | (p(b + 4) & 0xff)
            val nc = p(b + 5) & 0xff
            if (nc < 1 || nc > 3 || b + 6 + 3 * nc > end) return None
            comps = Array.tabulate(nc) { i =>
              val cb = b + 6 + 3 * i
              val hv = p(cb + 1) & 0xff
              new Comp(p(cb) & 0xff, (hv >> 4) & 0x0f, hv & 0x0f, p(cb + 2) & 0x0f)
            }
            if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2)) return None
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // lossless / arithmetic / hierarchical: metadata-only
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = ((p(b) & 0xff) << 8) | (p(b + 1) & 0xff)
          case 0xda if !progressive => // SOS: single interleaved scan
            if (comps == null) return None
            val ns = p(b) & 0xff
            if (ns != comps.length || b + 1 + 2 * ns > end) return None
            var i = 0
            while (i < ns) {
              val cid = p(b + 1 + 2 * i) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.dcSel = (p(b + 2 + 2 * i) & 0xf0) >> 4
              c.acSel = p(b + 2 + 2 * i) & 0x0f
              i += 1
            }
            sos = end // entropy data starts after the header
          case 0xda => // SOS, progressive: one of many band/precision scans
            if (comps == null || width <= 0 || height <= 0) return None
            if (width.toLong * height > (1L << 26)) return None
            if (comps.exists(c => c.coefs == null)) {
              val hmax0 = comps.map(_.h).max
              val vmax0 = comps.map(_.v).max
              val mx0 = (width + 8 * hmax0 - 1) / (8 * hmax0)
              val my0 = (height + 8 * vmax0 - 1) / (8 * vmax0)
              comps.foreach { c =>
                c.bwPad = mx0 * c.h
                c.bhPad = my0 * c.v
                c.bw = ((width * c.h + hmax0 - 1) / hmax0 + 7) / 8
                c.bh = ((height * c.v + vmax0 - 1) / vmax0 + 7) / 8
                c.coefs = new Array[Int](c.bwPad * c.bhPad * 64)
              }
            }
            val ns = p(b) & 0xff
            if (ns < 1 || ns > comps.length || b + 4 + 2 * ns > end) return None
            val scanComps = new Array[Comp](ns)
            var i = 0
            while (i < ns) {
              val cid = p(b + 1 + 2 * i) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.dcSel = (p(b + 2 + 2 * i) & 0xf0) >> 4
              c.acSel = p(b + 2 + 2 * i) & 0x0f
              scanComps(i) = c
              i += 1
            }
            val ss = p(b + 1 + 2 * ns) & 0xff
            val se = p(b + 2 + 2 * ns) & 0xff
            val ah = (p(b + 3 + 2 * ns) & 0xf0) >> 4
            val al = p(b + 3 + 2 * ns) & 0x0f
            val endPos = decodeProgScan(p, end, scanComps, ss, se, ah, al,
              restartInterval, dcTabs, acTabs)
            if (endPos < 0) return None
            progScans += 1
            // resume the marker walk at the next true marker (skipping
            // entropy padding, stuffed bytes and RSTn); -1 = stream end
            val nm = nextMarker(p, (endPos - 2).max(end))
            if (nm < 0) finished = true else o = nm
          case _ => () // APPn, COM, others: skip
        }
        if (!finished && m != 0xda) o = end
      }
    }
    if (progressive) {
      if (progScans == 0 || comps == null) return None
      comps.foreach { c => if (quant(c.tq) == null) return None }
      return Some(reconstructProgressive(width, height, quant, comps))
    }
    if (sos < 0 || width <= 0 || height <= 0 || comps == null) return None
    // allocation guard: refuse pathological header dims (corrupted or
    // adversarial input) before touching width*height buffers
    if (width.toLong * height > (1L << 26)) return None
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      if (quant(c.tq) == null || dcTabs(c.dcSel) == null || acTabs(c.acSel) == null) return None
      c.planeW = mcusX * 8 * c.h
      c.planeH = mcusY * 8 * c.v
      c.plane = new Array[Int](c.planeW * c.planeH)
    }

    val br = new BitReader(p, sos)
    val coef = new Array[Int](64)
    var mcu = 0
    val totalMcus = mcusX.toLong * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.hitMarker) { while (!br.hitMarker && br.bit() >= 0) () }
        if (br.restartMarker < 0) return None
        br.align()
        comps.foreach(_.pred = 0)
      }
      val mx = (mcu % mcusX).toInt
      val my = (mcu / mcusX).toInt
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qtab = quant(c.tq); val dc = dcTabs(c.dcSel); val ac = acTabs(c.acSel)
        var v = 0
        while (v < c.v) {
          var h = 0
          while (h < c.h) {
            java.util.Arrays.fill(coef, 0)
            val t = br.decode(dc)
            if (t < 0 || t > 11) return None
            val diffBits = if (t == 0) 0 else br.bits(t)
            if (diffBits < 0) return None
            c.pred += extend(diffBits, t)
            coef(0) = c.pred * qtab(0)
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
                val vv = br.bits(s)
                if (vv < 0) return None
                coef(Zigzag(k)) = extend(vv, s) * qtab(Zigzag(k))
                k += 1
              }
            }
            idctInto(coef, c.plane, c.planeW, (mx * c.h + h) * 8, (my * c.v + v) * 8)
            h += 1
          }
          v += 1
        }
        ci += 1
      }
      mcu += 1
    }
    Some(new Decoded(width, height, hmax, vmax, comps))
  }

  /** Position of the next true marker at/after `from`: skips entropy
    * padding, stuffed 0xff00 pairs, 0xff fill bytes and RSTn. -1 when
    * the stream ends first.
    */
  private def nextMarker(p: Array[Byte], from: Int): Int = {
    var i = from.max(0)
    while (i + 1 < p.length) {
      if ((p(i) & 0xff) == 0xff) {
        val b2 = p(i + 1) & 0xff
        if (b2 == 0xff) i += 1 // fill byte
        else if (b2 == 0x00 || (b2 >= 0xd0 && b2 <= 0xd7)) i += 2
        else return i
      } else i += 1
    }
    -1
  }

  /** Decode ONE progressive scan (T.81 G.2) into the components'
    * coefficient buffers: DC first/refinement (interleaved or not), AC
    * first with EOB-run coding, AC refinement per G.1.2.3 (correction
    * bits on already-nonzero coefficients, new coefficients at +-2^Al).
    * Returns the position after the scan's entropy data, or -1 on any
    * corruption (callers degrade to None, never throw).
    */
  private def decodeProgScan(p: Array[Byte], start: Int, scanComps: Array[Comp],
                             ss: Int, se: Int, ah: Int, al: Int,
                             restartInterval: Int,
                             dcTabs: Array[HuffTable], acTabs: Array[HuffTable]): Int = {
    val ns = scanComps.length
    if (ss == 0 && se != 0) return -1 // DC band is exactly [0,0]
    if (ss > 0 && (ns != 1 || se < ss || se > 63)) return -1 // AC: one comp
    if (al > 13 || ah > 13) return -1
    val dcScan = ss == 0
    if (dcScan && ah == 0 && scanComps.exists(c => dcTabs(c.dcSel) == null)) return -1
    if (!dcScan && acTabs(scanComps(0).acSel) == null) return -1
    scanComps.foreach(_.pred = 0)
    val br = new BitReader(p, start)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al

    // correction bit for a history-nonzero coefficient (two's-complement
    // OR/add trick works for negatives — matches the encoder's
    // (|v| >> Al) & 1 emission)
    def refineNonzero(c: Comp, z: Int): Boolean = {
      val b = br.bit(); if (b < 0) return false
      if (b == 1 && (c.coefs(z) & p1) == 0)
        c.coefs(z) += (if (c.coefs(z) >= 0) p1 else m1)
      true
    }

    def dcUnit(c: Comp, off: Int): Boolean =
      if (ah == 0) {
        val t = br.decode(dcTabs(c.dcSel))
        if (t < 0 || t > 11) false
        else {
          var diff = 0
          if (t > 0) { val v = br.bits(t); if (v < 0) return false; diff = extend(v, t) }
          c.pred += diff
          c.coefs(off) = c.pred << al
          true
        }
      } else {
        val b = br.bit()
        if (b < 0) false
        else { if (b == 1) c.coefs(off) |= p1; true }
      }

    def acFirstUnit(c: Comp, off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      val ac = acTabs(c.acSel)
      var k = ss
      while (k <= se) {
        val rs = br.decode(ac); if (rs < 0) return false
        val r = rs >> 4; val s = rs & 0x0f
        if (s == 0) {
          if (r < 15) { // EOBn: run of 2^r + appended bits (this block included)
            eobrun = (1 << r) - 1
            if (r > 0) { val eb = br.bits(r); if (eb < 0) return false; eobrun += eb }
            return true
          }
          k += 16 // ZRL
        } else {
          k += r
          if (k > se) return false
          val v = br.bits(s); if (v < 0) return false
          c.coefs(off + Zigzag(k)) = extend(v, s) << al
          k += 1
        }
      }
      true
    }

    def acRefineUnit(c: Comp, off: Int): Boolean = {
      val ac = acTabs(c.acSel)
      var k = ss
      var eobHit = eobrun > 0
      if (!eobHit) {
        var stop = false
        while (k <= se && !stop) {
          val rs = br.decode(ac); if (rs < 0) return false
          var r = rs >> 4
          val s = rs & 0x0f
          var newval = 0
          if (s != 0) {
            if (s != 1) return false // new coefficients are +-1 by construction
            val b = br.bit(); if (b < 0) return false
            newval = if (b == 1) p1 else m1
          } else if (r < 15) {
            eobrun = 1 << r
            if (r > 0) { val eb = br.bits(r); if (eb < 0) return false; eobrun += eb }
            eobHit = true; stop = true
          }
          if (!stop) {
            // advance over r zero-history slots (refining nonzero ones en
            // route), then place the new value; ZRL is the newval == 0,
            // r == 15 flavor (skips exactly 16 zero-history slots)
            var placed = false
            while (k <= se && !placed) {
              val z = off + Zigzag(k)
              if (c.coefs(z) != 0) {
                if (!refineNonzero(c, z)) return false
              } else if (r == 0) {
                if (newval != 0) c.coefs(z) = newval
                placed = true
              } else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobHit) {
        // EOB region: every remaining history-nonzero coefficient still
        // carries one correction bit; then count this block off the run
        while (k <= se) {
          val z = off + Zigzag(k)
          if (c.coefs(z) != 0 && !refineNonzero(c, z)) return false
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    def unit(c: Comp, off: Int): Boolean =
      if (dcScan) dcUnit(c, off)
      else if (ah == 0) acFirstUnit(c, off)
      else acRefineUnit(c, off)

    def restart(u: Long): Boolean = {
      if (restartInterval > 0 && u > 0 && u % restartInterval == 0) {
        if (!br.hitMarker) { while (!br.hitMarker && br.bit() >= 0) () }
        if (br.restartMarker < 0) return false
        br.align()
        scanComps.foreach(_.pred = 0)
        eobrun = 0
      }
      true
    }

    if (ns > 1) {
      // interleaved (DC-band only, per the guards above): frame MCU walk
      val c0 = scanComps(0)
      val mcusX = c0.bwPad / c0.h
      val mcusY = c0.bhPad / c0.v
      var mcu = 0L
      val total = mcusX.toLong * mcusY
      while (mcu < total) {
        if (!restart(mcu)) return -1
        val mx = (mcu % mcusX).toInt
        val my = (mcu / mcusX).toInt
        var ci = 0
        while (ci < ns) {
          val c = scanComps(ci)
          var v = 0
          while (v < c.v) {
            var h = 0
            while (h < c.h) {
              if (!unit(c, ((my * c.v + v) * c.bwPad + mx * c.h + h) * 64)) return -1
              h += 1
            }
            v += 1
          }
          ci += 1
        }
        mcu += 1
      }
    } else {
      // non-interleaved: the single component's REAL block grid in
      // raster order (padding blocks are not coded, T.81 A.2.2)
      val c = scanComps(0)
      var u = 0L
      val total = c.bw.toLong * c.bh
      while (u < total) {
        if (!restart(u)) return -1
        val bx = (u % c.bw).toInt
        val by = (u / c.bw).toInt
        if (!unit(c, (by * c.bwPad + bx) * 64)) return -1
        u += 1
      }
    }
    br.pos
  }

  /** Dequantize + IDCT the accumulated progressive coefficients into
    * per-component pixel planes (the same contract the baseline scan
    * loop fills in-place).
    */
  private def reconstructProgressive(width: Int, height: Int,
                                     quant: Array[Array[Int]],
                                     comps: Array[Comp]): Decoded = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val tmp = new Array[Int](64)
    comps.foreach { c =>
      c.planeW = c.bwPad * 8
      c.planeH = c.bhPad * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      val qtab = quant(c.tq)
      var by = 0
      while (by < c.bhPad) {
        var bx = 0
        while (bx < c.bwPad) {
          val off = (by * c.bwPad + bx) * 64
          var i = 0
          while (i < 64) { tmp(i) = c.coefs(off + i) * qtab(i); i += 1 }
          idctInto(tmp, c.plane, c.planeW, bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
    }
    new Decoded(width, height, hmax, vmax, comps)
  }

  private def idctInto(coef: Array[Int], plane: Array[Int], planeW: Int,
                       x0: Int, y0: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) InvSqrt2 else 1.0
              val cv = if (v == 0) InvSqrt2 else 1.0
              sum += cu * cv * c * Cos(x)(u) * Cos(y)(v)
            }
            u += 1
          }
          v += 1
        }
        val s = math.round(sum / 4.0 + 128.0).toInt
        plane((y0 + y) * planeW + x0 + x) = if (s < 0) 0 else if (s > 255) 255 else s
        x += 1
      }
      y += 1
    }
  }

  // sample component c at image pixel (x, y) with box upsampling
  private def sample(d: Decoded, c: Comp, x: Int, y: Int): Int =
    c.plane((y * c.v / d.vmax) * c.planeW + (x * c.h / d.hmax))

  /** Luma-plane decode (greyscale view of any supported flavor): the
    * first component upsampled to image resolution. Returns (width,
    * height, row-major pixels); None for unsupported/corrupted input.
    */
  def decodePixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!isJpeg(p)) return None
    try decodeFrame(p).map { d =>
      val out = new Array[Byte](d.width * d.height)
      val c0 = d.comps(0)
      var y = 0
      while (y < d.height) {
        var x = 0
        while (x < d.width) { out(y * d.width + x) = sample(d, c0, x, y).toByte; x += 1 }
        y += 1
      }
      (d.width, d.height, out)
    } catch { case _: RuntimeException => None }
  }

  /** Full color rollout for 3-component scans: YCbCr -> RGB triples
    * (JFIF matrix), chroma box-upsampled. None for non-color input.
    */
  def decodeRgb(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!isJpeg(p)) return None
    try decodeFrame(p).filter(_.comps.length == 3).map { d =>
      val out = new Array[Byte](d.width * d.height * 3)
      var y = 0
      while (y < d.height) {
        var x = 0
        while (x < d.width) {
          val yy = sample(d, d.comps(0), x, y)
          val cb = sample(d, d.comps(1), x, y) - 128
          val cr = sample(d, d.comps(2), x, y) - 128
          val i = (y * d.width + x) * 3
          out(i) = clamp8(math.round(yy + 1.402 * cr).toInt)
          out(i + 1) = clamp8(math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt)
          out(i + 2) = clamp8(math.round(yy + 1.772 * cb).toInt)
          x += 1
        }
        y += 1
      }
      (d.width, d.height, out)
    } catch { case _: RuntimeException => None }
  }

  private def clamp8(v: Int): Byte = (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** Nearest-neighbor half-resize: full decode, keep even pixels/rows
    * of the luma plane, re-encode greyscale. Non-decodable input passes
    * through unchanged (the transform-stage contract shared with the
    * other codecs).
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
