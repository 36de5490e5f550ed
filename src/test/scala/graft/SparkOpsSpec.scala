package graft

import graft.core._
import graft.exvc._
import graft.operators._
import graft.plans.GraphOps
import graft.sources.{Dot, GraphStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.{ArraySeq, SortedMap, SortedSet}

trait SharedSpark extends BeforeAndAfterAll { this: org.scalatest.Suite =>
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override protected def afterAll(): Unit = { /* shared session, keep alive */ }
}

/** DataFrame graph operators vs hand-computed small graphs and vs the
  * driver-side EventGraph semantics.
  */
class GraphOpsSpec extends AnyFunSuite with SharedSpark {
  import scala.jdk.CollectionConverters._

  private def df(pairs: Seq[(Long, Long)]): DataFrame =
    spark.createDataFrame(pairs.map(p => org.apache.spark.sql.Row(p._1, p._2)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("dep", org.apache.spark.sql.types.LongType))))

  private def ids(xs: Seq[Long]): DataFrame = {
    import spark.implicits._
    xs.toDF("id")
  }

  //      1 -> 0,  2 -> 0,  3 -> 1,  4 -> {2, 3}
  private val edges = df(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L), (4L, 3L)))

  test("closure expands to all transitive deps (graph.rs:59-83)") {
    val got = GraphOps.closure(ids(Seq(4L)), edges).collect().map(_.getLong(0)).toSet
    assert(got == Set(4L, 2L, 3L, 1L, 0L))
    val got2 = GraphOps.closure(ids(Seq(3L)), edges).collect().map(_.getLong(0)).toSet
    assert(got2 == Set(3L, 1L, 0L))
  }

  test("frontier keeps only non-dependencies (graph.rs:78-81)") {
    val state = ids(Seq(0L, 1L, 2L, 3L, 4L))
    val got = GraphOps.frontier(state, edges).collect().map(_.getLong(0)).toSet
    assert(got == Set(4L))
    // two incomparable chains -> both tips survive
    val st2 = ids(Seq(0L, 1L, 2L, 3L))
    assert(GraphOps.frontier(st2, edges).collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("topoRounds assigns dependency depth, deterministic (graph.rs:85-129)") {
    val got = GraphOps.topoRounds(ids(Seq(0L, 1L, 2L, 3L, 4L)), edges)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("topoRounds detects cycles (graph.rs:102-104)") {
    val cyc = df(Seq((1L, 2L), (2L, 1L)))
    val e = intercept[IllegalStateException] {
      GraphOps.topoRounds(ids(Seq(1L, 2L)), cyc).collect()
    }
    assert(e.getMessage.contains("circuit"))
  }

  test("dedupInsert keeps one new representative per hash (graph.rs:136-154)") {
    import spark.implicits._
    val existing = Seq("h1").toDF("h")
    val incoming = Seq(("h1", 1L), ("h2", 5L), ("h2", 3L), ("h3", 9L)).toDF("h", "id")
    val got = GraphOps.dedupInsert(existing, incoming, "h", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("h2", 3L), ("h3", 9L)))
  }

  test("collisionAudit finds same-hash different-payload (graph.rs:52-53)") {
    import spark.implicits._
    val a = Seq(("h1", "x"), ("h2", "y")).toDF("h", "payload")
    val b = Seq(("h1", "x"), ("h2", "z")).toDF("h", "payload")
    val got = GraphOps.collisionAudit(a, b, "h", Seq("payload")).select("h")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("h2"))
  }

  test("connectedComponents: chain, star, singleton-pair, random graph vs union-find") {
    import spark.implicits._
    // chain 1-2-3-4-5 (worst case for naive min propagation), star
    // 10-{11,12,13}, isolated pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (11L, 10L), (12L, 10L), (13L, 10L), (20L, 21L)).toDF("a", "b")
    val got = GraphOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L).forall(got(_) == 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got.size == 11)

    // random graph vs a driver-side union-find
    val rnd = new scala.util.Random(42)
    val re = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (x, y) => x != y }
    val parent = Array.tabulate(80)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    re.foreach { case (x, y) =>
      val (rx, ry) = (find(x.toInt), find(y.toInt))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    val want = re.flatMap { case (x, y) => Seq(x, y) }.distinct
      .map(v => v -> find(v.toInt).toLong).toMap
    val got2 = GraphOps.connectedComponents(re.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == want)
  }

  test("connectedComponents round count is O(log n): 512-node path in <= 11 rounds") {
    import spark.implicits._
    // a path graph is the adversarial depth case (naive min-label
    // propagation needs n rounds); star contraction's min-hook +
    // pointer-doubled flatten must stay within the O(log n) bound —
    // the property that makes the operator viable at 100 TB, where
    // each outer round is a full shuffle of the pair table. Bound: the
    // Kiveris et al. analysis gives ~2 log2 n outer rounds worst-case;
    // a 512-node path (log2 = 9) must land well under that — and far
    // under the 511 rounds propagation would need.
    val path = (0L until 511L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = GraphOps.connectedComponentsWithRounds(path)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 512 && got.values.forall(_ == 0L))
    assert(rounds <= 11, s"star contraction took $rounds rounds on a 512-path")
  }
}

/** The column-level exvc engine must agree with the driver-side
  * Vector[String] engine (the semantic spec) on random docs x commands.
  */
class ExvcColumnsSpec extends AnyFunSuite with SharedSpark {
  import CommandKind._

  private val docs: Seq[Vector[String]] = Seq(
    Vector.empty,
    Vector("a"),
    Vector("foo", "bar", "baz"),
    Vector("x1", "x2", "x3", "x4", "x5", "x6"),
    Vector("bar", "bar", "nope", "bar"))

  private val commands: Seq[Command] = Seq(
    Command(Address.Rng(0, 2), Delete),
    Command(Address.Rng(1, 3), Change(Vector("C1", "C2"))),
    Command(Address.Rng(2, 99), Append(Vector("A"))),
    Command(Address.Rng(7, 9), Delete), // start past end
    Command(Address.RngF(0), Insert(Vector("I"))),
    Command(Address.RngF(2), Substitute("a", "@")),
    Command(Address.RngF(6), Append(Vector("AtEnd"))),
    Command(Address.RngF(9), Append(Vector("Nothing"))),
    Command(Address.Last, Delete),
    Command(Address.Last, Append(Vector("A1", "A2"))),
    Command(Address.Rgx("^b"), Substitute("b", "B")),
    Command(Address.Rgx("^b"), Delete),
    Command(Address.Rgx("nope"), Insert(Vector("I1"))),
    Command(Address.Rgx("zzz"), Change(Vector("never"))))

  test("ExvcColumns == ExvcEngine on the doc x command grid (en.rs:105-188)") {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (d, i) => (i, d) }.toDF("id", "lines")
    commands.zipWithIndex.foreach { case (cmd, ci) =>
      val got = df.select(col("id"), ExvcColumns.apply(col("lines"), cmd).as("out"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toVector).toMap
      docs.zipWithIndex.foreach { case (d, i) =>
        val expected = ExvcEngine.runEvent(0, cmd, d)
        assert(got(i) == expected, s"cmd #$ci $cmd on doc #$i $d")
      }
    }
  }
}

/** Distributed replay vs an in-memory sequential fold; simhash UDF vs
  * its column hamming helper; multimodal plumbing.
  */
class OperatorSpec extends AnyFunSuite with SharedSpark {
  test("replayPerUser == sequential in-memory fold per user") {
    val df = EventReplay.replayPerUser(spark, "/root/testdata/sf0.001")
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val raw = EventReplay.loadEvents(spark, "/root/testdata/sf0.001")
      .selectExpr("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val expected = raw.groupBy(_._1).map { case (uid, evs) =>
      var st = 0.0
      evs.sortBy(e => (e._2, e._3)).foreach(e => st = EventReplay.command(e._4)(st, e._5))
      uid -> math.rint(st * 100) / 100
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (uid, exp) =>
      assert(math.abs(got(uid) - exp) < 1e-9, s"user $uid")
    }
  }

  test("simhash of identical docs collide; hammingBits reasonable") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a completely different sentence here")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L).length == 64 && sh(1L).forall(c => c == '0' || c == '1'))
    val ham = df.as("a").join(df.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        Dedup.hammingBits(Dedup.simhash64(col("a.text")), Dedup.simhash64(col("b.text"))).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(ham((1L, 2L)) == 0)
    assert(ham((1L, 3L)) > 0)
  }

  test("multimodal feature extraction round-trips payload bytes") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val got = Multimodal.extractFeatures(Multimodal.withPayload(df, "text"), "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(got(1L)._1 == 3L)
    // sha256("abc")
    assert(got(1L)._2 == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(got(1L)._3 == "unknown") // raw text bytes are no container
    assert(got(2L)._1 == 0L)
  }

  test("winnowing guarantee: shared substring >= k+w-1 yields a shared fingerprint") {
    import spark.implicits._
    val shared = "uniquesharedsequencehere" // 24 chars >= 8+4-1
    val a = "prefix text one " + shared + " tail alpha padding padding"
    val b = "completely different opening " + shared + " other ending here"
    val c = "no overlap with anything else at all in this document body"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared substring produced no shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty || (fps(2L) & fps(3L)).isEmpty,
      "unrelated doc shares fingerprints with both others")
    // too-short docs are excluded, not errored
    val tiny = Seq((9L, "short")).toDF("doc_id", "text")
    assert(Dedup.winnowFingerprints(tiny, "text", "doc_id").count() == 0)
  }

  test("media payloads are valid containers and parse back to constructed dims") {
    import spark.implicits._
    // ids 0,1,2,3 -> png, bmp, wav, jpeg; text of 700 bytes crosses
    // the png width modulus (w = 699%512+1 = 188, h = ceil(700/188) = 4)
    val txt = "x" * 700
    val df = Seq((0L, txt), (1L, txt), (2L, txt), (3L, txt)).toDF("doc_id", "text")
    val rows = Multimodal.extractFeatures(
        Multimodal.withMediaPayload(df, "text", "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7), r.getInt(8))).toMap
    assert(rows(0L) == (("png", 188, 4, 1, 0, 8)))
    assert(rows(1L) == (("bmp", 188, 2, 3, 0, 24))) // w = 699%256+1 = 188, h = ceil(700/564) = 2
    assert(rows(2L) == (("wav", 0, 0, 1, 8000 + 700 % 8000, 8)))
    assert(rows(3L) == (("jpeg", 124, 6, 1, 0, 8))) // w = 699%192+1 = 124, h = ceil(700/124) = 6
  }

  test("image near-dup recovers exactly the planted jittered pairs") {
    val imgs = Multimodal.plantedImages(spark, 12)
    // dHash survives the jpeg round trip: pair hamming small, distinct
    // bases far apart
    val dh = imgs.select(col("doc_id"), Multimodal.dhash64(col("payload")).as("dh"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dh.values.forall(v => v != null && v.length == 64))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    (0 until 12 by 2).foreach { i =>
      assert(ham(dh(i.toLong), dh(i + 1L)) <= 6, s"pair ($i,${i + 1}) too far")
    }
    assert(ham(dh(0L), dh(2L)) > 10 && ham(dh(4L), dh(8L)) > 10)
    val pairs = Multimodal.imageNearDup(imgs, "payload", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0 until 12 by 2).map(i => (i.toLong, i + 1L)).toSet)
  }

  test("audio near-dup recovers exactly the planted jittered pairs") {
    import spark.implicits._
    val wavs = Multimodal.plantedAudio(spark, 12)
    val fp = wavs.select(col("doc_id"), Multimodal.audioFp64(col("payload")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp.values.forall(v => v != null && v.length == 64))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    // jitter never flips an energy comparison: pair fingerprints are
    // IDENTICAL; distinct bases land far apart
    (0 until 12 by 2).foreach { i =>
      assert(ham(fp(i.toLong), fp(i + 1L)) == 0, s"pair ($i,${i + 1}) differs")
    }
    assert(ham(fp(0L), fp(2L)) > 10 && ham(fp(4L), fp(8L)) > 10)
    // non-WAV payloads drop out (None), and the banded join returns
    // exactly the planted pairs
    val notWav = Seq((99L, "not a wav".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(notWav.select(Multimodal.audioFp64(col("payload"))).head.isNullAt(0))
    val pairs = Multimodal.audioNearDup(wavs, "payload", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0 until 12 by 2).map(i => (i.toLong, i + 1L)).toSet)
  }
}

/** From-spec container codecs: writers must emit valid files byte-wise
  * (signatures, CRCs, sizes), and the parsers must recover exactly the
  * constructed metadata — including on files our writers did NOT
  * produce (hand-built top-down BMP, WAV with an extra chunk).
  */
class MediaCodecSpec extends AnyFunSuite {
  import graft.operators.MediaCodec

  test("png writer emits valid chunks; parser recovers dims") {
    val p = MediaCodec.png("hello png world".getBytes("UTF-8"), 5, 3)
    assert(p.take(8).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    // IHDR CRC must verify (computed over type+data, offsets 12..24)
    val crc = new java.util.zip.CRC32()
    crc.update(p, 12, 4 + 13)
    val stored = ((p(29) & 0xffL) << 24) | ((p(30) & 0xffL) << 16) | ((p(31) & 0xffL) << 8) | (p(32) & 0xffL)
    assert(crc.getValue == stored)
    // IDAT inflates back to (w+1)*h filtered scanlines
    val idatLen = ((p(33) & 0xff) << 24) | ((p(34) & 0xff) << 16) | ((p(35) & 0xff) << 8) | (p(36) & 0xff)
    val inf = new java.util.zip.Inflater()
    inf.setInput(p, 41, idatLen)
    val raw = new Array[Byte](6 * 3 + 16)
    assert(inf.inflate(raw) == 6 * 3)
    assert(MediaCodec.decode(p) == MediaCodec.Meta("png", 5, 3, 1, 0, 8))
  }

  test("bmp writer pads rows; parser handles bottom-up and top-down heights") {
    val p = MediaCodec.bmp24("bgr".getBytes("UTF-8"), 3, 2)
    assert(p.length == 54 + 12 * 2) // rowSize(3px*3B=9 -> 12) * 2 rows
    assert(MediaCodec.decode(p) == MediaCodec.Meta("bmp", 3, 2, 3, 0, 24))
    // top-down variant (negative height) — not produced by our writer
    val neg = p.clone()
    val h = -2
    neg(22) = h.toByte; neg(23) = (h >> 8).toByte; neg(24) = (h >> 16).toByte; neg(25) = (h >> 24).toByte
    assert(MediaCodec.decode(neg).height == 2)
  }

  test("wav parser scans chunks; tolerates a non-fmt chunk first") {
    val p = MediaCodec.wav8(Array[Byte](1, 2, 3, 4), 44100)
    assert(MediaCodec.decode(p) == MediaCodec.Meta("wav", 0, 0, 1, 44100, 8))
    // splice a LIST chunk before fmt (odd size exercises word alignment)
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'a', 'b', 'c', 0)
    val spliced = p.take(12) ++ list ++ p.drop(12)
    // fix RIFF size (not needed by our parser, but keep the file honest)
    assert(MediaCodec.decode(spliced) == MediaCodec.Meta("wav", 0, 0, 1, 44100, 8))
  }

  test("garbage and truncated payloads decode as unknown, never throw") {
    assert(MediaCodec.decode("plain text".getBytes("UTF-8")) == MediaCodec.Unknown)
    assert(MediaCodec.decode(Array.emptyByteArray) == MediaCodec.Unknown)
    assert(MediaCodec.decode(null) == MediaCodec.Unknown)
    // PNG signature but truncated before IHDR completes
    val sig = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0, 0)
    assert(MediaCodec.decode(sig) == MediaCodec.Unknown)
  }

  test("bmp half-resize samples even pixels; wav downsample keeps every 2nd sample") {
    // 4x2 BMP, pixel (x,y) = value 10*y + x in all three channels
    val content = new Array[Byte](4 * 2 * 3)
    for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3)
      content((y * 4 + x) * 3 + c) = (10 * y + x).toByte
    val bmp = MediaCodec.bmp24(content, 4, 2)
    val half = MediaCodec.bmpResizeHalf(bmp)
    assert(MediaCodec.decode(half) == MediaCodec.Meta("bmp", 2, 1, 3, 0, 24))
    // surviving pixels: (0,0)=0 and (2,0)=2 (even x, even y)
    val rowSize = (2 * 3 + 3) / 4 * 4
    assert(half(54) == 0 && half(54 + 3) == 2)
    // idempotent on non-BMP input
    assert(MediaCodec.bmpResizeHalf("not a bmp".getBytes).sameElements("not a bmp".getBytes))

    val wav = MediaCodec.wav8(Array[Byte](10, 20, 30, 40, 50), 8000)
    val down = MediaCodec.wavDownsample(wav, 2)
    assert(MediaCodec.decode(down) == MediaCodec.Meta("wav", 0, 0, 1, 4000, 8))
    assert(down.drop(44).toSeq == Seq[Byte](10, 30, 50))
  }

  test("png half-resize inflates, samples even pixels, re-emits valid png") {
    // 4x3 grey PNG, pixel (x,y) = 10*y + x
    val content = Array.tabulate[Byte](12)(i => (10 * (i / 4) + i % 4).toByte)
    val p = MediaCodec.png(content, 4, 3)
    val half = MediaCodec.pngResizeHalf(p)
    assert(MediaCodec.decode(half) == MediaCodec.Meta("png", 2, 2, 1, 0, 8))
    // survivors: (0,0)=0 (2,0)=2 (0,2)=20 (2,2)=22 — verify by
    // resizing AGAIN (1x1 keeps (0,0)) and by a second parse pass
    val q = MediaCodec.pngResizeHalf(half)
    assert(MediaCodec.decode(q) == MediaCodec.Meta("png", 1, 1, 1, 0, 8))
    // non-PNG passes through untouched
    val junk = "hello".getBytes
    assert(MediaCodec.pngResizeHalf(junk).sameElements(junk))
  }

  test("fuzz: decode never throws — random bytes and mutated valid headers") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 500).foreach { _ =>
      val p = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(p)
      MediaCodec.decode(p) // any Meta is fine; throwing is the failure
    }
    // byte-flip corruptions of genuinely valid files — parsers must
    // survive arbitrary header damage (truncation already covered)
    val valid = Seq(
      MediaCodec.png("payload".getBytes, 4, 2),
      MediaCodec.bmp24("xyz".getBytes, 2, 2),
      MediaCodec.wav8(Array[Byte](1, 2, 3), 8000))
    valid.foreach { v =>
      (1 to 300).foreach { _ =>
        val m = v.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        MediaCodec.decode(m)
        MediaCodec.decode(m.take(rnd.nextInt(m.length + 1)))
      }
    }
    // crafted negative RIFF chunk size: must return (not stall/throw)
    val evil = MediaCodec.wav8(Array[Byte](1, 2, 3), 8000).clone()
    evil(12) = 'X'; evil(13) = 'X'; evil(14) = 'X'; evil(15) = 'X' // not "fmt "
    evil(16) = -9; evil(17) = -1; evil(18) = -1; evil(19) = -1 // size = -9
    assert(MediaCodec.decode(evil) == MediaCodec.Unknown)
  }
}

class GraftFunctionsSpec extends AnyFunSuite with SharedSpark {
  test("blake2b512 Catalyst expression matches the reference vector and runs in SQL") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val out = Seq("Guten Tag!").toDF("s")
      .selectExpr("concat('blake2b512:', replace(replace(replace(replace(rtrim('=', base64(blake2b512(encode(s, 'UTF-8')))), '\\n', ''), '\\r', ''), '+', '-'), '/', '_')) AS h")
      .collect().head.getString(0)
    assert(out == "blake2b512:z3L37mvoETflutamuNBg_EMgHMtxwm8YlZ2Jf7d2eZwOICKEivONmVdMbZH3bWzmDdIFJjhMEilg6XrrN0Jrlg")
  }
}

/** Hot-bucket guard ([[graft.operators.Dedup.capBucket]]): k identical
  * documents share every LSH band, so without a cap candidate
  * generation emits k^2 pairs from one bucket — quadratic on exactly
  * the corpora (duplicate-heavy web scrapes) near-dup exists for. The
  * cap bounds per-bucket work at cap^2 regardless of skew.
  */
class HotBucketSpec extends AnyFunSuite with SharedSpark {
  private val capPairs = 128 * 127 / 2 // C(cap, 2) with the default cap

  test("capBucket keeps the first-by-id members deterministically") {
    import spark.implicits._
    val df = Seq(("b", 5L), ("b", 3L), ("b", 1L), ("b", 9L), ("c", 7L)).toDF("bucket", "id")
    val kept = Dedup.capBucket(df, "bucket", "id", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept == Set(("b", 1L), ("b", 3L), ("c", 7L)))
  }

  test("1k identical docs: minhash near-dup candidates stay capped, not quadratic") {
    import spark.implicits._
    val docs = (0 until 1000).map(i =>
      (i.toLong, "all work and no play makes jack a dull boy again and again")).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, "text", "doc_id").collect()
    // uncapped this would be C(1000,2) = 499500; every band holds the
    // same first-128-by-id docs, so the distinct pair set is C(128,2)
    assert(pairs.length == capPairs, s"got ${pairs.length}")
    assert(pairs.forall(_.getAs[Double]("jaccard") == 1.0))
  }

  test("1k identical docs: simhash near-dup capped") {
    import spark.implicits._
    val docs = (0 until 1000).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDup(docs, "text", "doc_id").collect()
    assert(pairs.length == capPairs, s"got ${pairs.length}")
    assert(pairs.forall(_.getAs[Long]("hamming") == 0L))
  }

  test("nearDupAgainst == cross-side slice of the full pair set (no saturation)") {
    import spark.implicits._
    // templates with word-level noise: near-dups within each template
    // family, cross-family pairs dissimilar
    val tmplA = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val tmplB = "colorless green ideas sleep furiously beneath the bright cold winter moon tonight"
    val docs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) tmplA else tmplB
      (i.toLong, if (i % 5 == 0) base.replace("the", "a") else base)
    }.toDF("doc_id", "text")
    val prior = docs.filter(col("doc_id") % 3 =!= 0)
    val probe = docs.filter(col("doc_id") % 3 === 0)
    val inc = Dedup.nearDupAgainst(prior, probe, "text", "doc_id",
      bands = 6, rows = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: the full self-join pair set, restricted to pairs that
    // straddle the prior/probe split (no bucket is near the cap here,
    // so per-side capping cannot diverge from combined capping)
    val full = Dedup.nearDupPairs(docs, "text", "doc_id", bands = 6, rows = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        val (pr, nw) =
          if (a % 3 != 0 && b % 3 == 0) (a, b)
          else if (b % 3 != 0 && a % 3 == 0) (b, a)
          else (-1L, -1L)
        if (pr >= 0) Some((nw, pr, j)) else None
      }.toSet
    assert(inc.nonEmpty && inc === full)
  }

  test("1k identical vectors: embed near-dup capped") {
    import spark.implicits._
    val v = Array.tabulate(64)(i => (math.sin(i + 1)).toFloat)
    val emb = (0 until 1000).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    val pairs = Similarity.embedNearDup(emb, threshold = 0.9, dim = 64).collect()
    assert(pairs.length == capPairs, s"got ${pairs.length}")
    assert(pairs.forall(_.getAs[Double]("cosine") >= 0.999999))
  }
}

/** ANN recall against brute force on the synthetic embeddings (which
  * are near-uniform random — see Similarity scaladoc; the bound here is
  * the data-appropriate one, not a general claim).
  */
class SimilaritySpec extends AnyFunSuite with SharedSpark {
  test("embedMoments computes exact integer moments on crafted vectors") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, -2.0f, 4.0f)),  // scale 4 -> codes 31, -64, 127
      (2L, Seq(0.0f, 0.0f, 0.0f)))   // scale 1 -> codes 0, 0, 0
      .toDF("vec_id", "embedding")
    val out = Similarity.embedMoments(emb)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) == ((2L, 31L, 961L, 31L * -64)))
    assert(out(1L) == ((2L, -64L, 4096L, -64L * 127)))
    assert(out(2L) == ((2L, 127L, 16129L, 0L))) // no next dim -> 0
  }

  test("hardNegatives excludes the query's own IVF list and ranks by cosine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 4)
    val out = Similarity.hardNegatives(emb, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 20)
    val assign = Similarity.ivfAssignUdf(64, 16)
    val lists = emb.select(col("vec_id"), assign(col("embedding")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every mined negative comes from a different coarse list
    assert(out.forall { case (qid, _, nid, _) => lists(qid) != lists(nid) })
    // ranks are 1..5 per query with non-increasing scores
    out.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to 5L))
      assert(sorted.sliding(2).forall(p => p(0)._4 >= p(1)._4))
    }
  }

  test("annLsh recall@5 >= 0.4 vs brute force on sf0.001") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 8)
    val exact = Similarity.topKCosine(emb, q, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(emb, q, 5, dim = 64)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall")
  }

  test("kmeans separates crafted blobs and is deterministic across runs") {
    import spark.implicits._
    // two tight blobs in 4-d around +-(0.8,0.8,0.8,0.8); with the fixed
    // md5 'km' seeds and k=8 these provably separate (verified against
    // an independent simulation of the identical algebra); k=4 is a
    // known collapse case (the mid-cube centroid captures both corners)
    def blob(base: Float, n: Int, off: Int) = (0 until n).map { i =>
      ((off + i).toLong, Seq.fill(4)(base + (i % 10) * 0.01f * math.signum(base)))
    }
    val emb = (blob(0.8f, 20, 0) ++ blob(-0.8f, 20, 100)).toDF("vec_id", "embedding")
    val got = Similarity.kmeans(emb, k = 8, iters = 5, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cA = (0L until 20L).map(got).toSet
    val cB = (100L until 120L).map(got).toSet
    assert(cA.size == 1, s"blob A split across $cA") // blob converged to one cluster
    assert(cB.size == 1, s"blob B split across $cB")
    assert(cA != cB)
    val again = Similarity.kmeans(emb, k = 8, iters = 5, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == got)
  }

  test("int8 quantization: codes in range, scale recoverable, cosine error bounded") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Similarity.quantizeInt8(emb).collect()
    assert(q.forall { r =>
      val codes = r.getAs[scala.collection.Seq[Long]]("qv")
      codes.forall(c => c >= -128 && c <= 127)
    })
    // quantized cosine tracks float cosine: same queries, compare scores
    val queries = emb.filter(col("vec_id") < 4)
    val exact = Similarity.topKCosine(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val quant = Similarity.topKQuantized(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val shared = exact.keySet & quant.keySet
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(math.abs(exact(k) - quant(k)) < 0.05, s"$k: ${exact(k)} vs ${quant(k)}")
    }
  }

  test("annIvf: assignment partitions the corpus; probing bounds work; recall sane") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 8)
    val ivf = Similarity.annIvf(emb, q, 5, dim = 64)
    val rows = ivf.collect()
    // every query gets a full top-5 from its probed lists
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 5))
    val exact = Similarity.topKCosine(emb, q, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    // nprobe=4 of 16 lists scans ~25% of a uniform corpus
    assert(recall >= 0.2, s"recall $recall")
  }

  test("annPq: ADC ranking matches an exhaustive LUT recomputation; codes bounded") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 8)
    val pq = Similarity.annPq(emb, q, 5, dim = 64)
    val rows = pq.collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 5))
    // independently recompute the winning ADC score for one pair:
    // encode + LUT from first principles in plain Scala
    val cbs = Array.tabulate(8)(s =>
      Array.tabulate(16)(c => Similarity.saltedCentroid(s"pq$s", c, 8)))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    def encode(v: Array[Float]): Array[Int] = Array.tabulate(8) { s =>
      (0 until 16).maxBy { c =>
        val cv = cbs(s)(c)
        val d = (0 until 8).map(i => v(s * 8 + i).toDouble * cv(i)).sum
        (d - 0.5 * cv.map(x => x * x).sum, -c)
      }
    }
    def adcScore(qv: Array[Float], codes: Array[Int]): Long =
      (0 until 8).map { s =>
        val cv = cbs(s)(codes(s))
        math.floor((0 until 8).map(i => qv(s * 8 + i).toDouble * cv(i)).sum * 1e6).toLong
      }.sum
    rows.filter(_.getLong(1) == 1L).foreach { r =>
      val (qid, nid, score) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(adcScore(vecs(qid), encode(vecs(nid))) == score, s"query $qid top-1 $nid")
    }
    // the ADC approximation still finds real structure: its top-5 sets
    // overlap brute-force cosine (uniform synthetic corpus, so expect
    // modest but nonzero recall)
    val exact = Similarity.topKCosine(emb, q, 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert((exact & got).nonEmpty)
  }

  test("annIvfPq: candidates stay within probed lists; full top-5 per query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 8)
    val rows = Similarity.annIvfPq(emb, q, 5, dim = 64).collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 5))
    // every returned neighbor's coarse list must be one the query probed
    // (recompute assignment/probe from the shared salted centroids)
    val cents = Array.tabulate(16)(c => Similarity.ivfCentroidSql(c, 64))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    def scores(v: Array[Float]): Array[Double] = Array.tabulate(16) { c =>
      val cv = cents(c)
      (0 until 64).map(i => v(i).toDouble * cv(i)).sum - 0.5 * cv.map(x => x * x).sum
    }
    def assign(v: Array[Float]): Int = scores(v).zipWithIndex.maxBy { case (s, c) => (s, -c) }._2
    def probed(v: Array[Float]): Set[Int] =
      scores(v).zipWithIndex.sortBy { case (s, c) => (-s, c) }.take(4).map(_._2).toSet
    rows.foreach { r =>
      assert(probed(vecs(r.getLong(0))).contains(assign(vecs(r.getLong(2)))),
        s"query ${r.getLong(0)} neighbor ${r.getLong(2)} outside probed lists")
    }
    // PQ scoring inside the lists matches the flat annPq scores
    val flat = Similarity.annPq(emb, q, 500, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    rows.foreach { r =>
      assert(flat((r.getLong(0), r.getLong(2))) == r.getLong(3))
    }
  }

  test("rrfFuse and evalRanking: hand-checked rank algebra") {
    import spark.implicits._
    // lex finds docs 1,2,3; dense finds 2,3,4 — 2 and 3 get two contributions
    val lex = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)).toDF("query_id", "id", "rank")
    val dense = Seq((0L, 2L, 1L), (0L, 3L, 2L), (0L, 4L, 3L)).toDF("query_id", "id", "rank")
    val fused = Retrieval.rrfFuse(lex, dense, k = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    def c(r: Long) = math.floor(1e9 / (60.0 + r)).toLong
    assert(fused.map(_._2).toSeq == Seq(2L, 3L, 1L, 4L)) // double-hit docs first
    assert(fused.head._3 == c(1) + c(2))

    // truth = ids 1..5 at ranks 1..5; approx hits ids 1 (pos 1) and 2 (pos 3)
    val truth = (1L to 5L).map(i => (0L, i, i)).toDF("query_id", "id", "rank")
    val approx = Seq((0L, 1L, 1L), (0L, 9L, 2L), (0L, 2L, 3L), (0L, 8L, 4L), (0L, 7L, 5L))
      .toDF("query_id", "id", "rank")
    val ev = Retrieval.evalRanking(truth, approx, 5).collect().head
    assert(ev.getAs[Long]("hits") == 2L)
    assert(ev.getAs[Long]("recall_e6") == 400000L)
    // dcg = 5e9/1 + 4e9/3 (integer div) = 6_333_333_333; idcg(5) = 8_700_000_000
    assert(math.abs(ev.getAs[Double]("ndcg") - 6333333333L / 8.7e9) < 1e-6)
  }
}

/** Graph persistence + merge-from-file (OP-19) and Dot export (OP-12). */
class GraphStoreSpec extends AnyFunSuite with SharedSpark {
  test("save/load round-trip validates content hashes; foreign merge works") {
    val dir = java.nio.file.Files.createTempDirectory("graftstore").toString
    // local session: two events
    val g = new EventGraph[SearArg](SearEngine)
    val w = new WorkCache[SearArg, String](SearEngine, "A|B|C")
    var xs = SortedSet.empty[String]
    xs += w.shelveEvent(g, xs, 0, SearArg("B", "D")).get
    g.nstates.update("", xs)
    GraphStore.save(spark, g, s"$dir/local")

    // foreign session: same base + a divergent edit
    val g2 = new EventGraph[SearArg](SearEngine)
    val w2 = new WorkCache[SearArg, String](SearEngine, "A|B|C")
    var ys = SortedSet.empty[String]
    ys += w2.shelveEvent(g2, ys, 0, SearArg("B", "D")).get
    ys += w2.shelveEvent(g2, ys, 0, SearArg("A|D", "E|D")).get
    g2.nstates.update("", ys)
    GraphStore.save(spark, g2, s"$dir/foreign")

    // reload local, merge foreign in (m< flow, main.rs:54-111)
    val gl = GraphStore.load(spark, SearEngine, s"$dir/local")
    assert(gl.events.size == 1 && gl.nstates("") == xs)
    val wl = new WorkCache[SearArg, String](SearEngine, "A|B|C")
    val merged = GraphStore.mergeFrom(spark, gl, wl, s"$dir/foreign")
    val (dat, _) = wl.materialize(gl, merged)
    assert(dat == "E|D|C")
  }

  test("dot export renders nodes, hard/soft edges, clusters (dot.rs:10-61)") {
    val g = new EventGraph[SearArg](SearEngine)
    val w = new WorkCache[SearArg, String](SearEngine, "ab")
    var xs = SortedSet.empty[String]
    xs += w.shelveEvent(g, xs, 0, SearArg("a", "b")).get
    xs += w.shelveEvent(g, xs, 0, SearArg("bb", "c\"x")).get
    g.nstates.update("main", xs)
    val dot = Dot.render(g, (a: SearArg) => s"${a.search}->${a.replacement}")
    assert(dot.startsWith("digraph {"))
    assert(dot.contains("label=\"hard\""))
    assert(dot.contains("subgraph \"cluster_main\""))
    assert(dot.contains("c\\\"x")) // escaping
  }
}

/** External-UDF registry contract (OP-20). */
class ExternalEngineSpec extends AnyFunSuite {
  test("addCommands id ranges + byte-opaque transforms (esvc-wasm lib.rs:16-108)") {
    import ExternalEngine._
    val en = new ExternalEngine
    val (first, count) = en.addCommands(Seq(searModule))
    assert((first, count) == (0, 1))
    val (first2, _) = en.addCommands(Seq(searModule))
    assert(first2 == 1)
    val out = en.runEvent(0, searArg("l", "w"), bytes("hello world"))
    assert(new String(out.toArray, "UTF-8") == "hewwo worwd")
    intercept[EngineException](en.runEvent(9, searArg("a", "b"), bytes("x")))
    // full stack: shelve + merge through the byte engine
    val g = new EventGraph[ArraySeq[Byte]](en)
    val w = new WorkCache[ArraySeq[Byte], ArraySeq[Byte]](en, bytes("hello world"))
    var xs = SortedSet.empty[String]
    xs += w.shelveEvent(g, xs, 0, searArg("hello", "hi")).get
    xs += w.shelveEvent(g, xs, 0, searArg("world", "there")).get
    w.tryMerge(g, xs)
    val (dat, _) = w.materialize(g, xs)
    assert(new String(dat.toArray, "UTF-8") == "hi there")
  }
}

/** Streaming replay: incremental per-user state across micro-batches
  * must equal the batch replay.
  */
class StreamingReplaySpec extends AnyFunSuite with SharedSpark {
  test("flatMapGroupsWithState replay across 2 batches == batch fold") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = graft.streaming.StreamingReplay.eventsRecords(spark, "/root/testdata/sf0.001")
      .collect().sortBy(e => (e.ts, e.event_id))
    val (b1, b2) = all.splitAt(all.length / 2)

    val stream = MemoryStream[graft.streaming.EventRecord]
    val out = graft.streaming.StreamingReplay.replay(stream.toDS())
    val query = out.writeStream.format("memory").queryName("replay_out")
      .outputMode("update").start()
    try {
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.sql(
      "SELECT user_id, state FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn FROM replay_out) WHERE rn = 1")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val batch = EventReplay.replayPerUser(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (uid, exp) =>
      assert(math.abs(math.rint(streamed(uid) * 100) / 100 - exp) < 1e-9, s"user $uid")
    }
  }
}

/** Storage-layer log compaction: snapshot+tail replay must equal the
  * full-log replay, including after advancing the boundary WITHOUT the
  * retired history.
  */
class EventLogCompactionSpec extends AnyFunSuite with SharedSpark {
  test("compact -> replay == full replay; advance stays equal") {
    import graft.sources.EventLogCompaction
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val sf = "/root/testdata/sf0.001"
    val full = EventReplay.replayPerUser(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val maxId = EventReplay.loadEvents(spark, sf).agg(max(col("event_id"))).first().getLong(0)
    EventLogCompaction.compact(spark, sf, s"$dir/c1", maxId / 3)
    def replayed(d: String): Map[Long, Double] = EventLogCompaction.replay(spark, d)
      .select(col("user_id"), col("state_raw").cast("decimal(18,2)").cast("double").as("state"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(replayed(s"$dir/c1") == full)

    // advance to 2/3 using ONLY snapshot+tail (history retired)
    EventLogCompaction.advance(spark, s"$dir/c1", s"$dir/c2", 2 * maxId / 3)
    assert(replayed(s"$dir/c2") == full)
    // the advanced tail really shrank
    val t1 = spark.read.parquet(s"$dir/c1/tail").count()
    val t2 = spark.read.parquet(s"$dir/c2/tail").count()
    assert(t2 < t1)
    // n_events bookkeeping survives the advance
    val nTotal = spark.read.parquet(s"$dir/c2/snapshot").agg(sum(col("n_events"))).first().getLong(0)
    val nPrefix = EventReplay.loadEvents(spark, sf)
      .filter(col("event_id") < 2 * maxId / 3).count()
    assert(nTotal == nPrefix)
  }
}

/** Streaming exact-dedup: only the first event per content hash passes;
  * duplicates are dropped ACROSS micro-batches (keyed state), and the
  * surviving hash set equals the batch distinct.
  */
class StreamingDedupSpec extends AnyFunSuite with SharedSpark {
  test("dropDuplicatesWithinWatermark == batch distinct across 2 batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = graft.operators.EventReplay.loadEvents(spark, "/root/testdata/sf0.001")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[graft.streaming.EventRecordP].collect().sortBy(e => (e.ts, e.event_id))
    val (b1, b2) = all.splitAt(all.length / 2)
    // replay three b1 records inside b2 — cross-batch duplicates that
    // the keyed state must drop
    val replayed = b2 ++ b1.take(3)

    val stream = MemoryStream[graft.streaming.EventRecordP]
    val out = graft.streaming.StreamingDedup.firstPerHash(stream.toDS())
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(replayed.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.sql("SELECT content_hash FROM dedup_out")
      .collect().map(_.getString(0))
    assert(streamed.length == streamed.distinct.length, "a duplicate hash passed the filter")
    val batchDistinct = graft.streaming.StreamingDedup.contentHash(
        graft.operators.EventReplay.loadEvents(spark, "/root/testdata/sf0.001"))
      .select("content_hash").distinct().collect().map(_.getString(0)).toSet
    assert(streamed.toSet == batchDistinct)
  }
}

/** Streaming IVF maintenance: final per-list state after N micro-batches
  * must equal the batch index build — same counts, same bounded member
  * sample — regardless of how the stream was sliced into batches.
  */
class StreamingIvfSpec extends AnyFunSuite with SharedSpark {
  test("maintained index state across 2 batches == batch IVF build") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .as[graft.streaming.StreamingIvf.EmbRecord].collect().sortBy(_.vec_id)
    val (b1, b2) = all.splitAt(all.length / 2)

    val stream = MemoryStream[graft.streaming.StreamingIvf.EmbRecord]
    val out = graft.streaming.StreamingIvf.maintain(stream.toDS(), dim = 64, cap = 16)
    val query = out.toDF().writeStream.format("memory").queryName("ivf_state")
      .outputMode("update").start()
    try {
      stream.addData(b1.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(b2.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    // last emitted row per list is the final state
    val finalState = spark.sql(
      """SELECT list_id, n, members FROM (
        |  SELECT *, row_number() OVER (PARTITION BY list_id ORDER BY n DESC) AS rn
        |  FROM ivf_state) WHERE rn = 1""".stripMargin)
      .collect().map(r => r.getInt(0) -> (r.getLong(1),
        r.getAs[scala.collection.Seq[Long]](2).toVector)).toMap

    val batch = graft.streaming.StreamingIvf.assignments(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), dim = 64)
      .groupBy("list_id").agg(count(lit(1)).as("n"),
        slice(sort_array(collect_list(col("vec_id"))), 1, 16).as("members"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1),
        r.getAs[scala.collection.Seq[Long]](2).toVector)).toMap

    assert(finalState == batch)
    assert(finalState.values.forall(_._2.length <= 16))

    // the retrain decision reads the STATE rows, never the vectors:
    // a balanced final state stays quiet, a drift-skewed one (one
    // list holding 5x its uniform share) trips exactly that list
    import spark.implicits._
    val states = finalState.toSeq.map { case (l, (n, m)) =>
      graft.streaming.StreamingIvf.IvfListState(l, n, m) }.toDS()
    def trippedOf(ds: org.apache.spark.sql.Dataset[graft.streaming.StreamingIvf.IvfListState]) =
      graft.streaming.StreamingIvf.retrainAudit(ds)
        .filter(col("rebuild") === 1L).collect().map(_.getLong(0)).toSet
    assert(graft.streaming.StreamingIvf.retrainAudit(states).count() == 16L)
    val baselineTripped = trippedOf(states)
    // inject 5x-uniform drift mass into a list the baseline corpus
    // leaves QUIET: whatever the corpus's own salted-centroid skew
    // does, the injected list must newly trip (load >= 3809 pm by
    // construction)
    val quiet = (0 until 16).find(l => !baselineTripped.contains(l.toLong)).get
    val total = finalState.values.map(_._1).sum
    val skewed = finalState.toSeq.map { case (l, (n, m)) =>
      graft.streaming.StreamingIvf.IvfListState(l,
        if (l == quiet) n + 5 * total / 16 else n, m) }.toDS()
    assert((trippedOf(skewed) -- baselineTripped).contains(quiet.toLong))
  }
}

/** Full streaming ingest: staged file source -> flatMapGroupsWithState
  * -> durable parquet sink, one file per micro-batch via AvailableNow.
  * Stream-final state must equal the batch replay exactly (the
  * MemoryStream test above covers the kernel; this covers the whole
  * pipeline incl. source ordering, checkpointing and the sink).
  */
class StreamingIngestSpec extends AnyFunSuite with SharedSpark {
  test("file-source pipeline over >=4 micro-batches == batch replay") {
    val (nBatches, missing, mismatched) = graft.streaming.StreamingIngest.runAndCompare(
      spark, "/root/testdata/sf0.001", "/tmp/graft_stream_ingest_spec", slices = 5)
    assert(nBatches >= 4, s"expected multiple micro-batches, got $nBatches")
    assert(missing == 0, s"$missing users differ in presence")
    assert(mismatched == 0, s"$mismatched users differ in state")
  }
}

/** Functional-graph fast paths must agree with the general operators. */
class FunctionalGraphSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("closureFunctional == closure on a halving tree") {
    val ids = (0L until 200L).toDF("id")
    val edges = ids.filter(col("id") > 0).select(col("id"), expr("id DIV 2").as("dep"))
    val seeds = ids.filter(col("id") % 17 === 0)
    val bfs = GraphOps.closure(seeds, edges).collect().map(_.getLong(0)).toSet
    val dbl = GraphOps.closureFunctional(seeds, edges).collect().map(_.getLong(0)).toSet
    assert(dbl == bfs)
  }

  test("topoDepthFunctional == topoRounds on a halving tree") {
    val ids = (0L until 200L).toDF("id")
    val edges = ids.filter(col("id") > 0).select(col("id"), expr("id DIV 2").as("dep"))
    val kahn = GraphOps.topoRounds(ids, edges)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dbl = GraphOps.topoDepthFunctional(ids, edges)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dbl == kahn)
  }

  test("closureFunctional on per-user lag chains == closure") {
    val ev = EventReplay.loadEvents(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") % 11 === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = ev.select(col("event_id").as("id"),
        lag(col("event_id"), 1).over(w).as("dep"))
      .filter(col("dep").isNotNull)
    val seeds = GraphOps.frontier(ev.select(col("event_id").as("id")), edges)
    val bfs = GraphOps.closure(seeds, edges).collect().map(_.getLong(0)).toSet
    val dbl = GraphOps.closureFunctional(seeds, edges).collect().map(_.getLong(0)).toSet
    assert(dbl == bfs && dbl.nonEmpty)
  }
}

/** Incremental state cache: prefix materialization + suffix fold must
  * equal the full replay (the reference's memoization invariant,
  * workcache.rs:85-102, distributed).
  */
class StateCacheSpec extends AnyFunSuite with SharedSpark {
  test("cache(prefix) + fold(suffix) == full replay") {
    val full = EventReplay.replayPerUser(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val inc = StateCache.replayIncremental(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(inc == full)
  }
}

/** Parallel commutation tests must reproduce sequential shelve exactly. */
class ShelveSparkSpec extends AnyFunSuite with SharedSpark {
  import graft.plans.ShelveSpark

  private def runAll(start: String, sears: Seq[(String, String)]): Seq[String] = {
    def shelveAll(w: WorkCache[SearArg, String], g: EventGraph[SearArg]): String = {
      var xs = SortedSet.empty[String]
      sears.foreach { case (s, r) => w.shelveEvent(g, xs, 0, SearArg(s, r)).foreach(h => xs += h) }
      val (dat, _) = w.materialize(g, xs)
      g.events.keysIterator.mkString(",") + "|" + dat
    }
    Seq(
      // fully sequential
      new WorkCache[SearArg, String](SearEngine, start),
      // parallel commutation tests
      new WorkCache[SearArg, String](SearEngine, start,
        indepTester = Some(ShelveSpark.tester(spark, SearEngine, minBatch = 1))),
      // parallel base construction too
      new WorkCache[SearArg, String](SearEngine, start,
        indepTester = Some(ShelveSpark.tester(spark, SearEngine, minBatch = 1)),
        baseBuilder = Some(ShelveSpark.baseBuilder(spark, SearEngine, minBatch = 1))),
      // fused fold+test rounds (one fan-out per round)
      new WorkCache[SearArg, String](SearEngine, start,
        indepTester = Some(ShelveSpark.tester(spark, SearEngine, minBatch = 1)),
        fusedTester = Some(ShelveSpark.fusedTester(spark, SearEngine, minBatch = 1)))
    ).map(w => shelveAll(w, new EventGraph[SearArg](SearEngine)))
  }

  test("parallel tester/baseBuilder/fused == sequential shelve (hashes + state)") {
    val cases = Seq(
      ("Hi, what's up??", Seq(("Hi", "Hello UwU"), ("UwU", "World"), ("what", "wow"),
        ("s up", "sup"), ("??", "!"), ("sup!", "soap?"), ("p", "np"))),
      ("x", Seq(("x", "xx"), ("x", "xx"), ("x", "y"))),
      ("A|B|C", Seq(("B", "D"), ("A|D", "E|D"), ("D|C", "D|F"))))
    cases.foreach { case (start, sears) =>
      val rs = runAll(start, sears)
      assert(rs.distinct.size == 1, s"divergence for start=$start: $rs")
    }
  }

  test("property: all 4 execution modes agree on 40 random shelve chains") {
    // the round-11 fast path (prefix-shared bases, fused fold+test,
    // broadcast round context) vs the pure sequential semantics, over
    // random dependency structures — non-commuting replaces create
    // real hard/soft dep graphs, deferrals and fallbacks
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val smallStr = Gen.chooseNum(0, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val nonEmptyStr = Gen.chooseNum(1, 4).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val caseGen = for {
      init <- Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
      n <- Gen.chooseNum(1, 6)
      sears <- Gen.listOfN(n, for { s <- nonEmptyStr; r <- smallStr } yield (s, r))
    } yield (init, sears)
    val params = Gen.Parameters.default
    var seed = Seed(1108L)
    (0 until 40).foreach { i =>
      val (init, sears) = caseGen.pureApply(params, seed)
      val rs = runAll(init, sears)
      assert(rs.distinct.size == 1, s"case #$i init=$init sears=$sears: $rs")
      seed = seed.next
    }
  }
}

/** Scale patterns: bucketed co-located joins, skew salting, streaming
  * windowed rollup with watermark.
  */
class ScalePatternSpec extends AnyFunSuite with SharedSpark {
  test("bucketed tables join with zero shuffle") {
    import graft.sources.BucketedTables
    Seq("li_b", "ord_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // the in-memory catalog forgets tables across JVMs but the
      // warehouse dir survives — clear stale locations
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        java.nio.file.Files.walk(loc.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    BucketedTables.writeBucketed(li, "li_b", "l_orderkey", 8)
    BucketedTables.writeBucketed(ord, "ord_b", "l_orderkey", 8)
    val joined = BucketedTables.colocatedJoin(spark, "li_b", "ord_b", "l_orderkey")
    assert(!BucketedTables.hasShuffle(joined), joined.queryExecution.executedPlan.toString.take(500))
    // and it computes the right thing
    val plain = li.join(ord, "l_orderkey").count()
    assert(joined.count() == plain)
  }

  test("saltedJoin == plain join result") {
    import spark.implicits._
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c"), (1L, "d")).toDF("k", "lv")
    val right = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val salted = Par.saltedJoin(left, right, "k", salt = 4).select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("bloom prune is lossless (pruned-then-joined == plain join) and the probe is shuffle-free") {
    val sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .filter(col("s_nationkey") === 7)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_suppkey")
    val bits = Par.bloomBits(sup, "s_suppkey")
    val pruned = li.filter(Par.bloomMightContain(bits, col("l_suppkey")))
    // the prefilter alone introduces no exchange and no join: the bit
    // array rides as a literal, so the 100 TB side stays a scan+filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("join"), plan.take(500))

    def ids(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dimKeys = sup.select(col("s_suppkey").as("l_suppkey"))
    val plain = ids(li.join(dimKeys, Seq("l_suppkey")))
    val viaBloom = ids(pruned.join(dimKeys, Seq("l_suppkey")))
    assert(viaBloom == plain, "bloom prefilter changed the join result")
    // and it actually prunes: the pass-through fraction is far below 1
    val passFrac = pruned.count().toDouble / li.count().toDouble
    assert(passFrac < 0.5, s"bloom passed $passFrac of the fact")
  }

  test("global sort = range partition + local sort, partition ranges disjoint") {
    import spark.implicits._
    // the 100 TB total-order pattern: repartitionByRange samples key
    // quantiles so no single reducer owns the whole ordering
    val df = spark.range(0, 20000)
      .select((col("id") * 2654435761L % 100003L).as("k"))
    val parts = df.repartitionByRange(4, col("k"))
      .sortWithinPartitions("k")
      .rdd.glom().collect()
      .filter(_.nonEmpty)
      .map(rows => (rows.head.getLong(0), rows.last.getLong(0), rows.map(_.getLong(0))))
    parts.foreach { case (_, _, ks) => assert(ks.sameElements(ks.sorted)) }
    val spans = parts.map(p => (p._1, p._2)).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ => ()
    }
    // and the union is the full sorted set
    assert(parts.flatMap(_._3).sorted.toSeq ===
      df.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    // the posture a 1000-executor job runs with: one whale key must be
    // split by AQE's skew handler, not serialize on one reducer
    val keys = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val pad = "x" * 100
      val left = spark.range(0, 40000)
        .select((when(col("id") % 2 === 0, lit(7L)).otherwise(col("id") % 997)).as("k"),
          concat(lit(pad), col("id")).as("lv"))
      val right = (0L until 997L).map(i => (i, s"r$i")).toDF("k", "rv")
      val j = left.join(right, "k")
      assert(j.count() == 40000L) // every left key is in [0, 997) -> all match
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), "AQE did not mark the skew split: " + p.take(800))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("streaming hourly rollup with watermark == batch rollup (append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = graft.streaming.StreamingReplay.eventsRecords(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.ts)
    val stream = MemoryStream[graft.streaming.EventRecord]
    val out = graft.streaming.StreamingRollup.hourly(stream.toDS(), lateness = "0 seconds")
    val q = out.writeStream.format("memory").queryName("rollup_out").outputMode("append").start()
    try {
      stream.addData(all.toIndexedSeq)
      q.processAllAvailable()
      // advance the watermark past everything so all windows close
      stream.addData(Seq(all.last.copy(ts = all.last.ts + 7200L * 1000000000L)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT event_type, sum(n) FROM rollup_out GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.EventReplay.loadEvents(spark, "/root/testdata/sf0.001")
      .groupBy("event_type").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every original event landed in exactly one closed window (modulo
    // the synthetic watermark-advancing event)
    batch.foreach { case (t, n) =>
      assert(streamed.getOrElse(t, 0L) >= n, s"$t: ${streamed.get(t)} < $n")
      assert(streamed(t) <= n + 1)
    }
  }
}

/** General-DAG replay must agree with the chain fast-path on chain
  * edges, and handle genuine DAG orderings.
  */
class DagReplaySpec extends AnyFunSuite with SharedSpark {
  test("DagReplay on lag-chain edges == replayPerUser") {
    val ev = EventReplay.loadEvents(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 30)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val events = ev.select(col("user_id").as("entity"), col("event_id").as("id"),
      col("event_type"), col("value"))
    val edges = ev.select(col("event_id").as("id"),
        lag(col("event_id"), 1).over(w).as("dep"))
      .filter(col("dep").isNotNull)
    val dag = DagReplay.materialize(events, edges)
      .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 100) / 100).toMap
    val chain = EventReplay.foldStates(ev)
      .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 100) / 100).toMap
    assert(dag == chain)
  }

  test("GraftExtensions injects blake2b512 into a fresh session") {
    val ext = new graft.functions.GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e) // wiring executes without error; runtime registration is
    // covered by GraftFunctions.register in OperatorSpec
    graft.functions.GraftFunctions.register(spark)
    val n = spark.sql("SELECT length(blake2b512(encode('x', 'UTF-8'))) AS l").first().getInt(0)
    assert(n == 64)
  }
}

/** Source/sink round-trips + partition pruning + predicate pushdown. */
class FormatsSpec extends AnyFunSuite with SharedSpark {
  import graft.sources.Formats

  test("parquet/orc/json/csv round-trip the documents frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val expected = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    Seq("parquet", "orc", "json", "csv").foreach { fmt =>
      Formats.write(docs, s"$dir/$fmt", fmt)
      val back = Formats.read(spark, s"$dir/$fmt", fmt)
        .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "lang", "CAST(n_chars AS BIGINT) AS n_chars")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(back == expected, s"format $fmt")
    }
  }

  test("binaryFile ingests staged media files through the real decoder") {
    import graft.operators.MediaCodec
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"), bytes)
    put("a.png", MediaCodec.png("hello png".getBytes("UTF-8"), 3, 3))
    put("b.png", MediaCodec.png("x".getBytes("UTF-8"), 1, 1))
    put("c.bmp", MediaCodec.bmp24("bmp body".getBytes("UTF-8"), 2, 2))
    put("d.wav", MediaCodec.wav8("wav samples".getBytes("UTF-8"), 8000))
    put("skip.txt", "not media".getBytes("UTF-8"))

    val files = Formats.readBinary(spark, dir, glob = "*.{png,bmp,wav}")
    import spark.implicits._
    val metas = files.select("path", "content").as[(String, Array[Byte])]
      .collect().map { case (p, bytes) =>
        val m = MediaCodec.decode(bytes)
        p.split('/').last -> ((m.kind, m.width, m.height))
      }.toMap
    assert(metas.keySet === Set("a.png", "b.png", "c.bmp", "d.wav"))
    assert(metas("a.png") === (("png", 3, 3)))
    assert(metas("c.bmp") === (("bmp", 2, 2)))
    assert(metas("d.wav")._1 === "wav")
  }

  test("partitioned event log prunes partitions and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = graft.operators.EventReplay.loadEvents(spark, "/root/testdata/sf0.001")
    Formats.writePartitioned(ev, s"$dir/events", "event_type")
    val q = spark.read.parquet(s"$dir/events")
      .filter(col("event_type") === "purchase" && col("value") > 100.0)
      .select("event_id", "value")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("purchase"), plan.take(800))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(value,100.0"), plan.take(800))
    // and the pruned read is correct
    val expected = ev.filter(col("event_type") === "purchase" && col("value") > 100.0).count()
    assert(q.count() == expected)
  }
}

/** Plan-property regression guards: the scale-critical physical-plan
  * shapes (PLANS.md) are asserted, not just observed once.
  */
class PlanGuardSpec extends AnyFunSuite with SharedSpark {
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q5: all dimension joins broadcast, no sort-merge join") {
    val p = plan("q5_region_revenue")
    assert(!p.contains("SortMergeJoin"), p.take(400))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(400))
  }

  test("replay: exactly one hash-partition exchange (single shuffle)") {
    val p = plan("q_replay_per_user")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(600))
  }

  test("no query in the whole surface plans a cartesian product") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(300)}")
    }
  }

  test("q_cube: one Expand, partial agg before the single grouping shuffle") {
    val p = plan("q_cube")
    assert("Expand".r.findAllIn(p).size == 1, p.take(400))
    val aggIdx = p.indexOf("HashAggregate")
    assert(aggIdx >= 0 && p.indexOf("HashAggregate", aggIdx + 1) > aggIdx, p.take(400))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(600))
  }

  test("q_cdc_apply: partial map-side max_by, one aggregate shuffle, no window") {
    val p = plan("q_cdc_apply")
    assert(!p.contains("Window"), p.take(400))
    // struct-ordered max_by plans as SortAggregate; the scale property
    // is the PARTIAL pass — the shuffle carries one row per key per
    // map task, not the change log
    assert(p.contains("partial_max_by"), p.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(600))
  }

  test("q_group_topk: rank filter runs as a partial map-side WindowGroupLimit") {
    val p = plan("q_group_topk")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(600)) // Partial + Final
  }

  test("q_winsorize: ranks, totals, cutoffs and final agg share ONE shuffle") {
    val p = plan("q_winsorize")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(600))
  }

  test("simhash near-dup verify: native hamming runs inside whole-stage codegen") {
    import spark.implicits._
    // equivalence vs the scalar UDF on assorted strings first
    val cases = Seq(("0101", "0110"), ("1111", "1111"), ("10", "1011"), ("", "111"))
    val got = cases.toDF("a", "b")
      .select(graft.functions.HammingCol(col("a"), col("b")).as("d"),
        graft.operators.Dedup.hammingFast(col("a"), col("b")).as("u"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))

    val df = SparkEntry.queries("q_simhash_neardup")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val idx = p.indexOf("graft_hamming")
    assert(idx >= 0, "graft_hamming not in the executed plan: " + p.take(400))
    val line = p.lastIndexOf("\n", idx) match { case -1 => p.take(idx); case s => p.substring(s + 1, idx) }
    assert(line.contains("*("), s"hamming outside codegen: $line")
  }

  test("setsim verify: native sorted-intersect runs inside whole-stage codegen") {
    val df = SparkEntry.queries("q_setsim_join")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val idx = p.indexOf("graft_sorted_intersect_n")
    assert(idx >= 0, "graft_sorted_intersect_n not in the executed plan: " + p.take(400))
    val line = p.lastIndexOf("\n", idx) match { case -1 => p.take(idx); case s => p.substring(s + 1, idx) }
    assert(line.contains("*("), s"sorted-intersect outside codegen: $line")
  }

  test("q1: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q1_pricing_summary")
    val aggIdx = p.indexOf("HashAggregate")
    assert(aggIdx >= 0 && p.indexOf("HashAggregate", aggIdx + 1) > aggIdx, p.take(400))
  }

  test("dedup insert: blake2b512 executes inside whole-stage codegen") {
    val df = SparkEntry.queries("q_dedup_insert")(spark, "/root/testdata/sf0.001")
    // run THIS dataset's QueryExecution (a write would plan a fresh
    // one) so AQE finalizes and codegen-stage markers ("*(n)") appear
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val idx = p.indexOf("blake2b512")
    assert(idx >= 0, "blake2b512 not in the executed plan: " + p.take(400))
    // the expression's operator line carries a codegen-stage id, i.e.
    // it was not pushed out into an interpreted Project
    val line = p.lastIndexOf("\n", idx) match { case -1 => p.take(idx); case s => p.substring(s + 1, idx) }
    assert(line.contains("*("), s"blake2b512 outside codegen: $line")
  }
}

/** The affine parallel-prefix replay must equal the sequential fold. */
class AffineReplaySpec extends AnyFunSuite with SharedSpark {
  test("AffineReplay == EventReplay on sf0.001") {
    val seqR = EventReplay.replayPerUser(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val aff = AffineReplay.replayPerUser(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(aff == seqR)
  }
}

/** Driver-contract invariants. */
class ContractSpec extends AnyFunSuite with SharedSpark {
  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      s"diff: ${SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)} / ${SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)}")
  }

  test("entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 scan prunes unused lineitem columns") {
    val p = SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val schema = p.split("ReadSchema:").last.takeWhile(_ != '\n')
    assert(!schema.contains("l_partkey") && !schema.contains("l_shipdate"), schema)
    assert(schema.contains("l_quantity"), schema)
  }
}

/** Randomized ExvcColumns equivalence: 40 seeded random commands
  * evaluated as 40 columns of ONE projection against the driver
  * engine's results.
  */
class ExvcColumnsRandomSpec extends AnyFunSuite with SharedSpark {
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val lineGen = Gen.chooseNum(0, 4).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'x')))
  private val linesGen = Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, lineGen).map(_.toVector))
  private val addrGen: Gen[Address] = Gen.oneOf(
    Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(1, 4)).map { case (s, l) => Address.Rng(s, s + l) },
    Gen.chooseNum(0, 6).map(Address.RngF(_)),
    Gen.const(Address.Last),
    Gen.oneOf("a", "x", "^a", "b$", "ab").map(Address.Rgx(_)))
  private val kindGen: Gen[CommandKind] = Gen.oneOf(
    linesGen.map(CommandKind.Append(_)),
    linesGen.map(CommandKind.Insert(_)),
    linesGen.map(CommandKind.Change(_)),
    Gen.const(CommandKind.Delete),
    Gen.zip(Gen.oneOf("a", "b", "ab"), Gen.oneOf("", "X", "YY")).map { case (p, r) => CommandKind.Substitute(p, r) })
  private val cmdGen = Gen.zip(addrGen, kindGen).map { case (a, k) => Command(a, k) }

  test("40 random commands x 6 docs in one projection == driver engine") {
    import spark.implicits._
    val docs: Seq[Vector[String]] = Seq(
      Vector.empty, Vector("a"), Vector("ab", "ba"), Vector("a", "b", "x", "ab"),
      Vector("x", "x", "x", "x", "x", "x"), Vector("ba", "ab", "a", "b", "xx"))
    val params = Gen.Parameters.default
    var seed = Seed(99L)
    val cmds = (0 until 40).map { _ =>
      val c = cmdGen.pureApply(params, seed); seed = seed.next; c
    }
    val df = docs.zipWithIndex.map { case (d, i) => (i, d) }.toDF("id", "lines")
    val projected = df.select(col("id") +: cmds.zipWithIndex.map { case (c, i) =>
      ExvcColumns.apply(col("lines"), c).as(s"out$i")
    }: _*)
    val got = projected.collect().map(r =>
      r.getInt(0) -> (0 until 40).map(i => r.getSeq[String](i + 1).toVector)).toMap
    docs.zipWithIndex.foreach { case (d, di) =>
      cmds.zipWithIndex.foreach { case (c, ci) =>
        val expected = ExvcEngine.runEvent(0, c, d)
        assert(got(di)(ci) == expected, s"doc #$di $d cmd #$ci $c")
      }
    }
  }
}

/** Iterative operators must not leave superseded localCheckpoint blocks
  * behind: a long session (or a 32-query bench) otherwise accumulates
  * dead blocks in the block manager.
  */
class CheckpointHygieneSpec extends AnyFunSuite with SharedSpark {
  import graft.plans.{CheckpointHygiene, GraphOps}

  private def chain(n: Int): (DataFrame, DataFrame) = {
    val ids = spark.range(0, n).toDF("id")
    (ids, ids.filter(col("id") > 0).select(col("id"), expr("id - 1").as("dep")))
  }

  test("closureFunctional frees all but the returned checkpoint") {
    CheckpointHygiene.releaseAll(spark)
    val (ids, edges) = chain(300) // depth-300 chain → ~9 doubling rounds
    val res = GraphOps.closureFunctional(ids.filter(col("id") === 299), edges)
    assert(res.count() == 300)
    val live = spark.sparkContext.getPersistentRDDs.size
    assert(live <= 2, s"leaked $live persistent RDD blocks")
    // the survivor must still be readable (we freed nothing live)
    assert(res.count() == 300)
    CheckpointHygiene.releaseAll(spark)
  }

  test("closure (BFS) bounds live blocks to the fold window") {
    CheckpointHygiene.releaseAll(spark)
    val (ids, edges) = chain(64)
    val res = GraphOps.closure(ids.filter(col("id") === 63), edges)
    assert(res.count() == 64)
    val live = spark.sparkContext.getPersistentRDDs.size
    // 64 BFS rounds; without fold-point freeing this would be >60
    assert(live <= 8, s"leaked $live persistent RDD blocks")
    assert(res.count() == 64)
    CheckpointHygiene.releaseAll(spark)
  }

  test("topoRounds/topoDepthFunctional free superseded rounds; results intact") {
    CheckpointHygiene.releaseAll(spark)
    val (ids, edges) = chain(40)
    val kahn = GraphOps.topoRounds(ids, edges)
    val fast = GraphOps.topoDepthFunctional(ids, edges)
    def pairs(df: DataFrame) = df.collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val a = pairs(kahn)
    val b = pairs(fast)
    assert(a == b)
    val live = spark.sparkContext.getPersistentRDDs.size
    // kahn keeps one "ready" leaf per round (returned via out) — those
    // must survive; superseded remaining/remEdges/jump levels must not
    assert(live <= 50, s"leaked $live persistent RDD blocks")
    CheckpointHygiene.releaseAll(spark)
  }
}

/** Baseline JPEG codec (T.81 sequential DCT): the encoder must emit a
  * spec-valid stream the generic decoder reconstructs within the
  * quantization error bound; corruption must degrade to None/Unknown,
  * never an exception.
  */
class JpegSpec extends AnyFunSuite {
  import graft.operators.{Jpeg, MediaCodec}

  test("encode -> decode round-trips pixels within the quant error bound") {
    // smooth gradient + a sharp step: both DCT-friendly and -hostile
    val w = 21; val h = 13 // non-multiple-of-8 exercises edge padding
    val px = Array.tabulate[Byte](w * h) { i =>
      val x = i % w; val y = i / w
      if (x < w / 2) (8 * x + 5 * y).toByte else 200.toByte
    }
    val enc = Jpeg.jpeg(px, w, h)
    assert(MediaCodec.decode(enc) == MediaCodec.Meta("jpeg", w, h, 1, 0, 8))
    val Some((dw, dh, out)) = Jpeg.decodePixels(enc)
    assert(dw == w && dh == h)
    val maxErr = px.indices.map(i => math.abs((px(i) & 0xff) - (out(i) & 0xff))).max
    // near-flat quant table (1..4): reconstruction error stays small
    assert(maxErr <= 24, s"max pixel error $maxErr exceeds quantization bound")
    val meanErr = px.indices.map(i => math.abs((px(i) & 0xff) - (out(i) & 0xff))).sum.toDouble / px.length
    assert(meanErr <= 3.0, s"mean pixel error $meanErr")
  }

  test("flat blocks survive exactly; multi-MCU DC prediction chains") {
    // 3x2 MCUs of constant 77: every block is DC-only; DC diff coding
    // must chain across all 6 MCUs without drift
    val w = 24; val h = 16
    val px = Array.fill[Byte](w * h)(77.toByte)
    val Some((_, _, out)) = Jpeg.decodePixels(Jpeg.jpeg(px, w, h))
    assert(out.forall(b => math.abs((b & 0xff) - 77) <= 1))
  }

  test("half-resize keeps even pixels and re-encodes a valid jpeg") {
    val w = 16; val h = 10
    val px = Array.tabulate[Byte](w * h)(i => ((i % w) * 10).toByte)
    val enc = Jpeg.jpeg(px, w, h)
    val half = Jpeg.resizeHalf(enc)
    assert(MediaCodec.decode(half) == MediaCodec.Meta("jpeg", 8, 5, 1, 0, 8))
    // resize again: dims keep ceil-halving (idempotence of the contract)
    assert(MediaCodec.decode(Jpeg.resizeHalf(half)) == MediaCodec.Meta("jpeg", 4, 3, 1, 0, 8))
    // non-jpeg passes through untouched
    val junk = "not a jpeg".getBytes
    assert(Jpeg.resizeHalf(junk).sameElements(junk))
  }

  test("frame header parses any SOFn; malformed progressive rejects gracefully") {
    val enc = Jpeg.jpeg(Array.fill[Byte](64)(1), 8, 8)
    // flip SOF0 (0xc0) to SOF2 (0xc2): metadata still parses, but the
    // baseline scan header (Ss=0, Se=63) is an ILLEGAL progressive band
    // — decode must refuse rather than mis-decode
    val prog = enc.clone()
    val sofAt = prog.indices.find(i => (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(MediaCodec.decode(prog) == MediaCodec.Meta("jpeg", 8, 8, 1, 0, 8))
    assert(Jpeg.decodePixels(prog).isEmpty)
    // lossless (SOF3) stays a metadata-only reject
    val lossless = enc.clone()
    lossless(sofAt + 1) = 0xc3.toByte
    assert(Jpeg.decodePixels(lossless).isEmpty)
  }

  test("progressive greyscale decodes bit-identically to its baseline twin") {
    // same pixels through both encoders: the SA scan chain (DC/AC at
    // Al=1, refinement to Al=0) reconstructs the exact quantized
    // coefficients, so the decodes must agree bit-for-bit
    val w = 21; val h = 13
    val px = Array.tabulate[Byte](w * h) { i =>
      val x = i % w; val y = i / w
      if (x < w / 2) (8 * x + 5 * y).toByte else 200.toByte
    }
    val prog = Jpeg.jpegProgressive(px, w, h)
    assert(MediaCodec.decode(prog) == MediaCodec.Meta("jpeg", w, h, 1, 0, 8))
    val Some((dw, dh, out)) = Jpeg.decodePixels(prog)
    assert(dw == w && dh == h)
    val Some((_, _, base)) = Jpeg.decodePixels(Jpeg.jpeg(px, w, h))
    assert(out.sameElements(base), "progressive decode differs from baseline decode")
    val maxErr = px.indices.map(i => math.abs((px(i) & 0xff) - (out(i) & 0xff))).max
    assert(maxErr <= 24, s"max pixel error $maxErr")
  }

  test("progressive 4:2:0 color decodes bit-identically to its baseline twin") {
    val w = 37; val h = 22 // non-multiple-of-16: padded DC blocks + clipped AC grid
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = (4 * x + 2 * y).toByte
      rgb(i + 1) = (200 - 3 * x).toByte
      rgb(i + 2) = (3 * x + 4 * y).toByte
    }
    val prog = Jpeg.jpegProgressiveColor420(rgb, w, h)
    assert(MediaCodec.decode(prog) == MediaCodec.Meta("jpeg", w, h, 3, 0, 8))
    val Some((dw, dh, luma)) = Jpeg.decodePixels(prog)
    assert(dw == w && dh == h)
    val Some((_, _, baseLuma)) = Jpeg.decodePixels(Jpeg.jpegColor420(rgb, w, h))
    assert(luma.sameElements(baseLuma), "progressive luma differs from baseline")
    val Some((_, _, rgbOut)) = Jpeg.decodeRgb(prog)
    val Some((_, _, baseRgb)) = Jpeg.decodeRgb(Jpeg.jpegColor420(rgb, w, h))
    assert(rgbOut.sameElements(baseRgb), "progressive rgb differs from baseline")
  }

  test("progressive == baseline decode on random noise images (property)") {
    // dense-AC noise stresses ZRL runs, EOB runs and the refinement
    // correction-bit order far harder than the smooth fixtures; any
    // divergence in the successive-approximation algebra shows up as a
    // pixel mismatch
    val rnd = new scala.util.Random(20260813L)
    (1 to 15).foreach { i =>
      val w = 8 + rnd.nextInt(40); val h = 8 + rnd.nextInt(40)
      val px = new Array[Byte](w * h)
      rnd.nextBytes(px)
      val base = Jpeg.decodePixels(Jpeg.jpeg(px, w, h)).get._3
      val ri = rnd.nextInt(4) // 0 = no restarts
      val prog = Jpeg.decodePixels(Jpeg.jpegProgressive(px, w, h, restartInterval = ri)).get._3
      assert(prog.sameElements(base), s"case $i (${w}x$h, ri=$ri) diverged")
    }
    (1 to 8).foreach { i =>
      val w = 16 + rnd.nextInt(33); val h = 16 + rnd.nextInt(33)
      val rgb = new Array[Byte](w * h * 3)
      rnd.nextBytes(rgb)
      val base = Jpeg.decodeRgb(Jpeg.jpegColor420(rgb, w, h)).get._3
      val prog = Jpeg.decodeRgb(Jpeg.jpegProgressiveColor420(rgb, w, h)).get._3
      assert(prog.sameElements(base), s"color case $i (${w}x$h) diverged")
    }
  }

  test("restart intervals (DRI + RSTn) decode bit-identically, baseline and progressive") {
    val w = 21; val h = 13 // 9 blocks: interval 2 -> 4 RST markers/scan
    val px = Array.tabulate[Byte](w * h) { i =>
      val x = i % w; val y = i / w
      if (x < w / 2) (8 * x + 5 * y).toByte else 200.toByte
    }
    val plain = Jpeg.decodePixels(Jpeg.jpeg(px, w, h)).get._3
    val baseRst = Jpeg.jpeg(px, w, h, restartInterval = 2)
    assert(baseRst.sliding(2).exists(s => (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xd0),
      "no RST0 emitted")
    assert(MediaCodec.decode(baseRst) == MediaCodec.Meta("jpeg", w, h, 1, 0, 8))
    assert(Jpeg.decodePixels(baseRst).get._3.sameElements(plain),
      "baseline restart decode differs")
    val progRst = Jpeg.jpegProgressive(px, w, h, restartInterval = 2)
    assert(Jpeg.decodePixels(progRst).get._3.sameElements(plain),
      "progressive restart decode differs")
    // interval larger than the block count: DRI present, no RSTs — legal
    assert(Jpeg.decodePixels(Jpeg.jpeg(px, w, h, restartInterval = 100)).get._3
      .sameElements(plain))
  }

  test("0xff fill bytes before markers are tolerated (T.81 B.1.1.2)") {
    val enc = Jpeg.jpeg(Array.tabulate[Byte](64)(_.toByte), 8, 8)
    // insert two fill bytes before the SOF marker
    val sofAt = enc.indices.find(i => (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc0).get
    val padded = enc.take(sofAt) ++ Array[Byte](0xff.toByte, 0xff.toByte) ++ enc.drop(sofAt)
    assert(MediaCodec.decode(padded) == MediaCodec.Meta("jpeg", 8, 8, 1, 0, 8))
    assert(Jpeg.decodePixels(padded).nonEmpty)
    assert(Jpeg.decodePixels(padded).get._3
      .sameElements(Jpeg.decodePixels(enc).get._3))
  }

  test("4:2:0 color round-trip: luma and RGB within subsampling error bounds") {
    // smooth color gradient (box-averaged chroma loses little on it)
    val w = 37; val h = 22 // non-multiple-of-16 exercises MCU clipping
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = (4 * x + 2 * y).toByte
      rgb(i + 1) = (200 - 3 * x).toByte
      rgb(i + 2) = (3 * x + 4 * y).toByte
    }
    val enc = Jpeg.jpegColor420(rgb, w, h)
    assert(MediaCodec.decode(enc) == MediaCodec.Meta("jpeg", w, h, 3, 0, 8))
    // luma view matches the JFIF Y formula
    val Some((dw, dh, luma)) = Jpeg.decodePixels(enc)
    assert(dw == w && dh == h)
    val lumaErr = (0 until w * h).map { i =>
      val r = rgb(3 * i) & 0xff; val g = rgb(3 * i + 1) & 0xff; val b = rgb(3 * i + 2) & 0xff
      math.abs((luma(i) & 0xff) - math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
    }
    assert(lumaErr.max <= 16, s"max luma error ${lumaErr.max}")
    // full RGB rollout within the chroma-subsampling bound
    val Some((_, _, out)) = Jpeg.decodeRgb(enc)
    val rgbErr = rgb.indices.map(i => math.abs((rgb(i) & 0xff) - (out(i) & 0xff)))
    assert(rgbErr.max <= 24, s"max rgb error ${rgbErr.max}")
    assert(rgbErr.sum.toDouble / rgbErr.size <= 4.0, "mean rgb error")
    // greyscale input has no color rollout
    assert(Jpeg.decodeRgb(Jpeg.jpeg(Array.fill[Byte](64)(9), 8, 8)).isEmpty)
  }

  test("fuzz: random bytes, byte flips, truncations — decode never throws") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 300).foreach { _ =>
      val p = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(p)
      if (p.length >= 2) { p(0) = 0xff.toByte; p(1) = 0xd8.toByte } // force the magic
      MediaCodec.decode(p)
      Jpeg.decodePixels(p)
      Jpeg.resizeHalf(p)
    }
    val grey = Jpeg.jpeg(Array.tabulate[Byte](300)(_.toByte), 20, 15)
    val color = Jpeg.jpegColor420(Array.tabulate[Byte](20 * 15 * 3)(i => (i % 251).toByte), 20, 15)
    val prog = Jpeg.jpegProgressive(Array.tabulate[Byte](300)(_.toByte), 20, 15)
    val progColor = Jpeg.jpegProgressiveColor420(
      Array.tabulate[Byte](20 * 15 * 3)(i => (i % 251).toByte), 20, 15)
    // restart-bearing streams: corrupting RSTn/DRI is its own failure class
    val greyRst = Jpeg.jpeg(Array.tabulate[Byte](300)(_.toByte), 20, 15, restartInterval = 2)
    val progRst = Jpeg.jpegProgressive(Array.tabulate[Byte](300)(_.toByte), 20, 15,
      restartInterval = 2)
    Seq(grey, color, prog, progColor, greyRst, progRst).foreach { valid =>
      (1 to 400).foreach { _ =>
        val m = valid.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        MediaCodec.decode(m)
        Jpeg.decodePixels(m)
        Jpeg.decodeRgb(m)
        val t = m.take(rnd.nextInt(m.length + 1))
        MediaCodec.decode(t)
        Jpeg.decodePixels(t)
      }
    }
  }
}
