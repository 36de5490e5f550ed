package graft

import graft.operators.{Multimodal, Y4m}
import org.scalatest.funsuite.AnyFunSuite

/** From-spec Y4M codec contract: roundtrip encode/decode, truncated-
  * tail prefix recovery, malformed-input rejection, per-colorspace
  * frame geometry (incl. odd dimensions and high-bit-depth rejection —
  * ADVICE r07), and the video near-dup pipeline over planted clips.
  */
class Y4mSpec extends AnyFunSuite with SharedSpark {

  private def frames(n: Int, w: Int, h: Int): Seq[Array[Byte]] =
    (0 until n).map(f => Array.tabulate[Byte](w * h)(i => ((f * 31 + i) % 251).toByte))

  test("mono roundtrip: header, frame count, luma planes bit-exact") {
    val fs = frames(3, 6, 4)
    val blob = Y4m.y4mMono(fs, 6, 4, fpsNum = 30, fpsDen = 1)
    val hdr = Y4m.header(blob).get
    assert((hdr.width, hdr.height, hdr.colorspace) === ((6, 4, "mono")))
    assert(hdr.frameBytes === 24L)
    assert(Y4m.frameCount(blob, hdr) === 3)
    val got = Y4m.lumaFrames(blob, hdr).toSeq
    assert(got.size === 3)
    got.zip(fs).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("420 roundtrip with odd dimensions uses ceil chroma geometry") {
    val (w, h) = (5, 3)
    val fs = frames(2, w, h)
    val blob = Y4m.y4m420(fs, w, h)
    val hdr = Y4m.header(blob).get
    assert(hdr.colorspace === "420jpeg")
    // luma 15 + 2 * ceil(5/2) * ceil(3/2) = 15 + 2*3*2 = 27
    assert(hdr.frameBytes === 27L)
    assert(Y4m.frameCount(blob, hdr) === 2)
    val got = Y4m.lumaFrames(blob, hdr).toSeq
    assert(got.size === 2)
    got.zip(fs).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("truncated tail yields the valid prefix, never a crash") {
    val fs = frames(4, 8, 8)
    val blob = Y4m.y4mMono(fs, 8, 8)
    val hdr = Y4m.header(blob).get
    val cut = blob.take(blob.length - 10) // last frame loses 10 bytes
    assert(Y4m.frameCount(cut, hdr) === 3)
    assert(Y4m.lumaFrames(cut, hdr).size === 3)
    // cut inside the header: no header at all
    assert(Y4m.header(blob.take(5)).isEmpty)
  }

  test("malformed input is rejected: bad magic, bad tags, bad geometry") {
    assert(Y4m.header(null).isEmpty)
    assert(Y4m.header("JUNKJUNK W2 H2\nxxxx".getBytes("US-ASCII")).isEmpty)
    assert(Y4m.header("YUV4MPEG2 W0 H4 Cmono\n".getBytes("US-ASCII")).isEmpty)
    assert(Y4m.header("YUV4MPEG2 Wx H4 Cmono\n".getBytes("US-ASCII")).isEmpty)
    assert(Y4m.header("YUV4MPEG2 W4 H4 F0:1 Cmono\n".getBytes("US-ASCII")).isEmpty)
    assert(Y4m.header("YUV4MPEG2 W4 H4 Q9 Cmono\n".getBytes("US-ASCII")).isEmpty)
    // no newline terminating the header
    assert(Y4m.header("YUV4MPEG2 W4 H4 Cmono".getBytes("US-ASCII")).isEmpty)
  }

  test("frameBytes per colorspace; high-bit-depth and unknown rejected") {
    def hdrFor(cs: String, w: Int = 6, h: Int = 4) =
      Y4m.header(s"YUV4MPEG2 W$w H$h F25:1 C$cs\n".getBytes("US-ASCII"))
    assert(hdrFor("mono").get.frameBytes === 24L)
    assert(hdrFor("444").get.frameBytes === 72L)
    assert(hdrFor("422").get.frameBytes === 24L + 2 * 3 * 4)
    for (cs <- Seq("420", "420jpeg", "420mpeg2", "420paldv"))
      assert(hdrFor(cs).get.frameBytes === 24L + 2 * 3 * 2, cs)
    // high-bit-depth variants would silently halve the true frame size
    // if prefix-matched as "420" — must be rejected outright
    for (cs <- Seq("420p10", "420p12", "420p16", "422p10", "rgb"))
      assert(hdrFor(cs).isEmpty, cs)
  }

  test("video fingerprint + near-dup finds exactly the planted pairs") {
    val docs = Multimodal.plantedVideo(spark, 16)
    val pairs = Multimodal.videoNearDup(docs, "payload", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0 until 8).map(i => (2L * i, 2L * i + 1)).toSet)
  }

  test("video fingerprint rejects short clips and non-y4m payloads") {
    import org.apache.spark.sql.functions._
    val shortClip = Y4m.y4mMono(frames(10, 4, 4), 4, 4)
    val junk = "not a video".getBytes("US-ASCII")
    import spark.implicits._
    val df = Seq((1L, shortClip), (2L, junk)).toDF("doc_id", "payload")
    val fps = df.select(Multimodal.videoFp64(col("payload")).as("fp"))
      .collect().map(r => Option(r.getString(0)))
    assert(fps.forall(_.isEmpty))
  }
}
