package graft

import graft.operators.{Jpeg, MediaCodec}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level property fuzz of the media codecs: randomized
  * dimensions, content classes, subsampling (grey vs 4:2:0 color),
  * encoder variant (baseline vs progressive) and restart intervals
  * through the full encode → decode → resize pipeline. Closes the
  * hand-picked-fixture bias of the JpegSpec cases: every invariant
  * below must hold for ANY parameter combination, not the crafted
  * ones —
  *  (1) decode never fails on a stream our own encoder produced, and
  *      reports exactly the encoded dimensions and component count;
  *  (2) progressive and baseline decodes are BIT-IDENTICAL (the
  *      successive-approximation algebra reconstructs the same
  *      quantized coefficients — T.81 G.1);
  *  (3) pixel error vs the source stays within the content-dependent
  *      quantization bound (near-flat tables 1..4: smooth content
  *      reconstructs tightly; dense-AC noise within the loose DCT
  *      bound);
  *  (4) resizeHalf produces a VALID jpeg of ceil-halved dimensions
  *      whose pixels are the re-encoded even-sampled decode — within
  *      one more encode's quant bound of that source;
  *  (5) corruption (byte flip / truncation) of any encoded stream is
  *      total: decode returns None or a decode, NEVER throws — the
  *      mapInPandas-shaped multimodal path must survive a dirty
  *      corpus (the Multimodal contract).
  *
  * Generators are driven manually with a fixed seed (the scalatest
  * bridge artifact isn't available offline), so failures print a
  * reproducible case index.
  */
class MediaPropertySpec extends AnyFunSuite {

  private final case class Case(w: Int, h: Int, content: Int, color: Boolean,
                                progressive: Boolean, ri: Int,
                                flipAt: Long, truncFrac: Double)

  private val caseGen: Gen[Case] = for {
    w <- Gen.chooseNum(8, 48)
    h <- Gen.chooseNum(8, 48)
    content <- Gen.chooseNum(0, 3) // flat / gradient / step / noise
    color <- Gen.oneOf(false, true)
    progressive <- Gen.oneOf(false, true)
    ri <- Gen.chooseNum(0, 3)
    flipAt <- Gen.chooseNum(0L, Long.MaxValue)
    truncFrac <- Gen.chooseNum(0.0, 1.0)
  } yield Case(w, h, content, color, progressive, ri, flipAt, truncFrac)

  private def pixels(c: Case, channels: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate[Byte](c.w * c.h * channels) { j =>
      val i = j / channels; val x = i % c.w; val y = i / c.w
      c.content match {
        case 0 => 77.toByte
        // scaled gradients stay in 0..250 for ANY (w, h): a byte wrap
        // would be a genuine 255->0 step edge, not smooth content
        case 1 => (x * 160 / c.w + y * 60 / c.h + 10 * (j % channels)).toByte
        case 2 => if (x < c.w / 2) (x * 120 / c.w + y * 60 / c.h).toByte else 220.toByte
        case _ => rnd.nextInt(256).toByte
      }
    }
  }

  private def maxMeanErr(a: Array[Byte], b: Array[Byte]): (Int, Double) = {
    val errs = a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff)))
    (errs.max, errs.sum.toDouble / errs.length)
  }

  private def checkCase(c: Case): Unit = {
    val channels = if (c.color) 3 else 1
    val src = pixels(c, channels, seed = c.w * 1000003 + c.h * 1009 + c.content)
    // color encoders take no restart interval (the grey ones exercise it)
    val enc =
      if (c.color && c.progressive) Jpeg.jpegProgressiveColor420(src, c.w, c.h)
      else if (c.color) Jpeg.jpegColor420(src, c.w, c.h)
      else if (c.progressive) Jpeg.jpegProgressive(src, c.w, c.h, restartInterval = c.ri)
      else Jpeg.jpeg(src, c.w, c.h, restartInterval = c.ri)

    // (1) metadata and decode totality on our own stream
    assert(MediaCodec.decode(enc) == MediaCodec.Meta("jpeg", c.w, c.h, channels, 0, 8))
    val (dw, dh, out) =
      if (c.color) Jpeg.decodeRgb(enc).getOrElse(fail("decodeRgb failed"))
      else Jpeg.decodePixels(enc).getOrElse(fail("decodePixels failed"))
    assert(dw == c.w && dh == c.h)

    // (2) progressive == baseline, bit for bit
    val twin =
      if (c.color) Jpeg.decodeRgb(
        if (c.progressive) Jpeg.jpegColor420(src, c.w, c.h)
        else Jpeg.jpegProgressiveColor420(src, c.w, c.h)).get._3
      else Jpeg.decodePixels(
        if (c.progressive) Jpeg.jpeg(src, c.w, c.h, restartInterval = c.ri)
        else Jpeg.jpegProgressive(src, c.w, c.h, restartInterval = c.ri)).get._3
    assert(out.sameElements(twin), "progressive/baseline decode divergence")

    // (3) bounded pixel error vs the source: tight for DCT-friendly
    // content, the loose coefficient-sum bound for dense-AC noise.
    // Color noise is the one class where RGB error is unbounded BY
    // DESIGN (4:2:0 box-averages four random chroma samples — the
    // information is discarded before quantization), so there the
    // bound applies to the full-resolution LUMA channel instead.
    if (c.color && c.content == 3) {
      val y = Array.tabulate[Byte](c.w * c.h) { i =>
        val r = src(3 * i) & 0xff; val g = src(3 * i + 1) & 0xff; val b = src(3 * i + 2) & 0xff
        math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt.min(255).toByte
      }
      val (lumaErr, _) = maxMeanErr(y, Jpeg.decodePixels(enc).get._3)
      assert(lumaErr <= 96, s"luma error $lumaErr > 96 on color noise")
    } else {
      val (maxErr, meanErr) = maxMeanErr(src, out)
      val maxBound = (c.content, c.color) match {
        case (3, _) => 96 // noise: every AC coefficient carries quant error
        case (_, true) => 32 // smooth color: chroma subsampling + quant
        case _ => 24 // smooth grey: the JpegSpec bound
      }
      assert(maxErr <= maxBound, s"max pixel error $maxErr > $maxBound")
      if (c.content != 3) assert(meanErr <= 6.0, s"mean pixel error $meanErr")
    }

    // (4) resize: valid jpeg, ceil-halved dims, pixels = re-encoded
    // even-sampled decode (grey path: resizeHalf decodes to luma)
    val half = Jpeg.resizeHalf(enc)
    val hw = (c.w + 1) / 2; val hh = (c.h + 1) / 2
    assert(MediaCodec.decode(half) == MediaCodec.Meta("jpeg", hw, hh, 1, 0, 8))
    val (rw, rh, rout) = Jpeg.decodePixels(half).getOrElse(fail("resize decode failed"))
    assert(rw == hw && rh == hh)
    val lumaFull = Jpeg.decodePixels(enc).get._3
    val evenSampled = Array.tabulate[Byte](hw * hh) { i =>
      lumaFull((i / hw) * 2 * c.w + (i % hw) * 2)
    }
    val (rMax, _) = maxMeanErr(evenSampled, rout)
    assert(rMax <= (if (c.content == 3) 96 else 24),
      s"resize re-encode error $rMax vs even-sampled decode")

    // (5) corruption totality: a byte flip or truncation anywhere must
    // never throw (None or a best-effort decode are both acceptable)
    val flipped = enc.clone()
    val at = (c.flipAt % enc.length).toInt.abs
    flipped(at) = (flipped(at) ^ 0x55).toByte
    MediaCodec.decode(flipped); Jpeg.decodePixels(flipped)
    Jpeg.decodeRgb(flipped); Jpeg.resizeHalf(flipped)
    val trunc = enc.take(math.max(2, (enc.length * c.truncFrac).toInt))
    MediaCodec.decode(trunc); Jpeg.decodePixels(trunc)
    Jpeg.decodeRgb(trunc); Jpeg.resizeHalf(trunc)
  }

  test("encode → decode → resize invariants, 300 random cases") {
    val params = Gen.Parameters.default
    var seed = Seed(20260814L)
    var i = 0
    while (i < 300) {
      val c = caseGen.pureApply(params, seed)
      withClue(s"case #$i $c: ") { checkCase(c) }
      seed = seed.next
      i += 1
    }
  }
}
