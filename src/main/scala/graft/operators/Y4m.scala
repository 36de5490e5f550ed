package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** From-spec YUV4MPEG2 (".y4m") container codec — the uncompressed
  * video interchange format (mjpegtools; stream syntax documented in
  * the public `yuv4mpeg(5)` man page). Pure-JVM byte parsing, like the
  * sibling [[MediaCodec]]/[[Jpeg]] codecs: the container ships no
  * media libraries, and the Spark-side plumbing (schema, per-partition
  * streaming decode, banded joins) is the part that must be real.
  *
  * Stream layout:
  * {{{
  *   YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip] [A1:1] [C<cs>] [X..]\n
  *   ( FRAME[ <params>]\n  <planar sample data> )*
  * }}}
  * Frame payload size is fixed by the header: `w*h` luma bytes plus
  * chroma per colorspace — 2*ceil(w/2)*ceil(h/2) for the 8-bit 4:2:0
  * flavors, 2*ceil(w/2)*h for 422, 2*w*h for 444, none for mono
  * (high-bit-depth C420p10/p12/p16 streams are rejected). Only the luma
  * plane is surfaced (the perceptual-fingerprint input); chroma is
  * skipped, not parsed. Anything malformed (bad magic, unparseable
  * tag, payload truncation) returns None — corruption degrades to
  * kind `unknown`, never a pipeline failure.
  */
object Y4m {
  final case class Header(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                          colorspace: String, headerLen: Int) {
    /** Bytes of one frame's planar payload under this header. Chroma
      * planes of subsampled colorspaces use ceil geometry
      * ((w+1)/2, (h+1)/2) — ffmpeg's y4m sizing for odd dimensions;
      * floor would undercount and desync every frame after the first.
      * Only exact 8-bit colorspace names are accepted: a prefix match
      * on "420" would also claim the high-bit-depth variants
      * (C420p10/p12/p16) and surface interleaved byte garbage as a
      * valid luma plane.
      */
    def frameBytes: Long = {
      val y = width.toLong * height
      val cw = (width + 1L) / 2
      val ch = (height + 1L) / 2
      colorspace match {
        case "mono" => y
        case "422" => y + 2L * cw * height
        case "444" => 3L * y
        case "420" | "420jpeg" | "420mpeg2" | "420paldv" => y + 2L * cw * ch
        case _ => -1L
      }
    }
  }

  private val Magic = "YUV4MPEG2".getBytes(US_ASCII)

  /** Parse the stream header. None on bad magic, missing newline,
    * malformed W/H/F tags, or an unsupported colorspace.
    */
  def header(p: Array[Byte]): Option[Header] = {
    if (p == null || p.length < Magic.length + 1) return None
    var i = 0
    while (i < Magic.length) { if (p(i) != Magic(i)) return None; i += 1 }
    var nl = i
    while (nl < p.length && p(nl) != 0x0a) nl += 1
    if (nl >= p.length) return None
    val toks = new String(p, i, nl - i, US_ASCII).split(' ')
    var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "420jpeg"
    var bad = false
    var t = 0
    while (t < toks.length && !bad) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        val v = tok.substring(1)
        tok.charAt(0) match {
          case 'W' => w = parseInt(v).getOrElse(-1); bad |= w < 0
          case 'H' => h = parseInt(v).getOrElse(-1); bad |= h < 0
          case 'F' =>
            val c = v.indexOf(':')
            if (c <= 0 || c == v.length - 1) bad = true
            else {
              fn = parseInt(v.substring(0, c)).getOrElse(-1)
              fd = parseInt(v.substring(c + 1)).getOrElse(-1)
              bad |= fn < 0 || fd < 0
            }
          case 'C' => cs = v
          case 'I' | 'A' | 'X' => () // interlacing / aspect / metadata: legal, unused
          case _ => bad = true
        }
      }
      t += 1
    }
    if (bad || w <= 0 || h <= 0 || fn <= 0 || fd <= 0) None
    else {
      val hdr = Header(w, h, fn, fd, cs, nl + 1)
      if (hdr.frameBytes <= 0) None else Some(hdr)
    }
  }

  private def parseInt(s: String): Option[Int] =
    if (s.isEmpty || s.length > 9 || !s.forall(c => c >= '0' && c <= '9')) None
    else Some(s.toInt)

  /** Iterate the luma plane of every frame, streaming (one `w*h`
    * array lives at a time). Stops cleanly at the first malformed or
    * truncated frame — a corrupt tail yields the valid prefix.
    */
  def lumaFrames(p: Array[Byte], hdr: Header): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private val fb = hdr.frameBytes
      private val ySize = hdr.width * hdr.height
      private var off = hdr.headerLen
      private var nextFrame: Array[Byte] = advance()
      private def advance(): Array[Byte] = {
        // "FRAME" + optional parameters up to \n
        if (off + 6 > p.length) return null
        if (!(p(off) == 'F' && p(off + 1) == 'R' && p(off + 2) == 'A' &&
              p(off + 3) == 'M' && p(off + 4) == 'E')) return null
        var nl = off + 5
        while (nl < p.length && p(nl) != 0x0a) nl += 1
        if (nl >= p.length || nl + 1 + fb > p.length) return null
        val y = new Array[Byte](ySize)
        System.arraycopy(p, nl + 1, y, 0, ySize)
        off = nl + 1 + fb.toInt
        y
      }
      def hasNext: Boolean = nextFrame != null
      def next(): Array[Byte] = {
        val f = nextFrame; nextFrame = advance(); f
      }
    }

  /** Count frames without materializing any plane (header walk only). */
  def frameCount(p: Array[Byte], hdr: Header): Int = {
    val fb = hdr.frameBytes
    var off = hdr.headerLen
    var n = 0
    var ok = true
    while (ok) {
      if (off + 6 > p.length || !(p(off) == 'F' && p(off + 1) == 'R' &&
          p(off + 2) == 'A' && p(off + 3) == 'M' && p(off + 4) == 'E')) ok = false
      else {
        var nl = off + 5
        while (nl < p.length && p(nl) != 0x0a) nl += 1
        if (nl >= p.length || nl + 1 + fb > p.length) ok = false
        else { n += 1; off = nl + 1 + fb.toInt }
      }
    }
    n
  }

  /** Encode luma-only frames as `Cmono`. Each element must be exactly
    * `w*h` bytes.
    */
  def y4mMono(frames: Seq[Array[Byte]], w: Int, h: Int,
              fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] =
    write(frames, w, h, fpsNum, fpsDen, "mono", chroma = 0)

  /** Encode luma frames as `C420jpeg` with neutral (128) chroma planes
    * — grey video, the luma-plane-faithful 4:2:0 writer.
    */
  def y4m420(frames: Seq[Array[Byte]], w: Int, h: Int,
             fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] =
    write(frames, w, h, fpsNum, fpsDen, "420jpeg",
      chroma = 2 * ((w + 1) / 2) * ((h + 1) / 2))

  private def write(frames: Seq[Array[Byte]], w: Int, h: Int,
                    fpsNum: Int, fpsDen: Int, cs: String, chroma: Int): Array[Byte] = {
    require(w > 0 && h > 0 && fpsNum > 0 && fpsDen > 0, "y4m: bad geometry")
    val out = new ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C$cs\n".getBytes(US_ASCII))
    val grey = Array.fill[Byte](chroma)(128.toByte)
    for (f <- frames) {
      require(f.length == w * h, s"y4m: frame is ${f.length} bytes, want ${w * h}")
      out.write("FRAME\n".getBytes(US_ASCII))
      out.write(f)
      if (chroma > 0) out.write(grey)
    }
    out.toByteArray
  }
}
