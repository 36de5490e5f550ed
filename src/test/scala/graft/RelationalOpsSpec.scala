package graft

import graft.operators.{Curation, Dimensions}
import graft.plans.Triangles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC apply, sliding-window chunk split and triangle counting vs
  * hand-computed results and brute-force formulations.
  */
class RelationalOpsSpec extends AnyFunSuite with SharedSpark {

  test("cdcApply: last writer wins, trailing delete drops the row") {
    import spark.implicits._
    val changes = Seq(
      // key 1: two upserts, last (by ts) wins
      (1L, 10L, 1L, "U", 1.0),
      (1L, 20L, 2L, "U", 2.5),
      // key 2: upsert then delete -> absent
      (2L, 10L, 3L, "U", 9.0),
      (2L, 30L, 4L, "D", 0.0),
      // key 3: delete then re-insert -> present with the re-insert
      (3L, 10L, 5L, "D", 0.0),
      (3L, 15L, 6L, "U", 7.0),
      // key 4: same ts, seq breaks the tie (seq 8 wins)
      (4L, 50L, 7L, "U", 1.0),
      (4L, 50L, 8L, "U", 4.0)
    ).toDF("k", "t", "seq", "op", "v")
    val out = Dimensions.cdcApply(changes, "k", "t", "seq", "op", "v")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out === Map(1L -> ((2.5, 2L)), 3L -> ((7.0, 2L)), 4L -> ((4.0, 2L))))
  }

  test("chunkSplit: window/stride tiling with offsets, short docs, empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, w=4 s=2 -> starts 0,2,4,6
      (2L, "x y"),                 // shorter than the window -> one chunk
      (3L, "  "),                  // no tokens -> no rows
      (4L, "p q r s t")            // 5 tokens -> starts 0,2 (chunk at 2 reaches the end)
    ).toDF("doc_id", "text")
    val out = Curation.chunkSplit(docs, "text", "doc_id", window = 4, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out.keySet.map(_._1) === Set(1L, 2L, 4L))
    assert(out((1L, 0L)) === ((0L, 4L, "a b c d")))
    assert(out((1L, 1L)) === ((2L, 4L, "c d e f")))
    assert(out((1L, 3L)) === ((6L, 4L, "g h i j")))
    assert(out.count(_._1._1 == 1L) === 4) // no trailing contained chunk
    assert(out((2L, 0L)) === ((0L, 2L, "x y")))
    assert(out((4L, 1L)) === ((2L, 3L, "r s t")))
    assert(out.count(_._1._1 == 4L) === 2)
  }

  test("cdcApply == driver-side fold on 200 random change logs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val changes = (1 to 200).map { seq =>
      (rnd.nextInt(12).toLong,            // key
        rnd.nextInt(20).toLong,           // time (collisions likely)
        seq.toLong,                       // unique seq
        if (rnd.nextInt(4) == 0) "D" else "U",
        rnd.nextInt(1000) / 10.0)
    }
    // model: winner = max by (t, seq); survivors are U-winners
    val expected = changes.groupBy(_._1).flatMap { case (k, rows) =>
      val w = rows.maxBy(r => (r._2, r._3))
      if (w._4 == "U") Some(k -> ((w._5, rows.size.toLong))) else None
    }
    val got = Dimensions.cdcApply(
      changes.toDF("k", "t", "seq", "op", "v"), "k", "t", "seq", "op", "v")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got === expected)
  }

  test("chunkSplit tiling invariants on random documents") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (1 to 60).map { i =>
      (i.toLong, (1 to rnd.nextInt(40)).map(j => s"w${rnd.nextInt(50)}").mkString(" "))
    }.toDF("doc_id", "text")
    val w = 7; val s = 3
    val rows = Curation.chunkSplit(docs, "text", "doc_id", window = w, stride = s)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = rows.groupBy(_._1)
    val nTokens = docs.select(col("doc_id"),
      size(split(trim(col("text")), " +")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (id, chunks) =>
      val n = nTokens(id)
      val sorted = chunks.sortBy(_._2)
      // indices are dense 0..k-1, starts at stride multiples
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong).toSeq)
      sorted.foreach { case (_, idx, start, len, text) =>
        assert(start === idx * s)
        assert(len === math.min(w, n - start))
        assert(text.split(" ").count(_.nonEmpty) === len)
      }
      // full coverage: last chunk reaches the document end; every
      // earlier chunk is full-width (so consecutive chunks overlap by
      // exactly window - stride tokens)
      assert(sorted.last._3 + sorted.last._4 === n)
      assert(sorted.init.forall(_._4 === w.toLong))
    }
  }

  test("triangleCorners: K4, a triangle-free star, and duplicate/self edges") {
    import spark.implicits._
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, each vertex in 3 of them.
    // Vertex 9 hangs off vertex 1 (star spoke, no triangle). Self-loop
    // and reversed-duplicate edges must not change anything.
    val edges = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)) ++ Seq((9L, 1L), (1L, 9L), (2L, 2L), (3L, 2L))
    val out = Triangles.triangleCorners(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("cdcApply onto a base snapshot == base unioned as earliest upserts") {
    import spark.implicits._
    // documented composition: applying changes to an existing table is
    // the same operator with the base rows unioned in as upserts that
    // predate every change (t = Long.MinValue)
    val base = Seq((1L, 10.0), (2L, 20.0), (5L, 50.0))
      .map { case (k, v) => (k, Long.MinValue, Long.MinValue, "U", v) }
    val changes = Seq(
      (1L, 10L, 1L, "U", 11.0), // overwrites base
      (2L, 10L, 2L, "D", 0.0),  // deletes a base row
      (9L, 10L, 3L, "U", 90.0)) // inserts a new key
    val out = Dimensions.cdcApply(
      (base ++ changes).toDF("k", "t", "seq", "op", "v"), "k", "t", "seq", "op", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 11.0, 5L -> 50.0, 9L -> 90.0))
  }

  test("winsorizedStats: exact rank cutoffs, outlier counts, clamped total") {
    import spark.implicits._
    // stratum "a": cents 10..80; lo rank = max(1, 8*250 DIV 1000) = 2 -> 20,
    // hi rank = min(8, 8*750 DIV 1000 + 1) = 7 -> 70
    val rows = (1 to 8).map(i => ("a", i / 10.0, i.toLong)) :+ (("b", 5.0, 99L))
    val out = graft.operators.QualityChecks.winsorizedStats(
      rows.toDF("et", "value", "seq"), "et", "value", "seq",
      loPermille = 250, hiPermille = 750)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out("a") === ((8L, 1L, 1L, 360L, 20L, 70L)))
    // single-row stratum: lo = hi = the row itself, nothing clamped
    assert(out("b") === ((1L, 0L, 0L, 500L, 500L, 500L)))
  }

  test("winsorizedStats == driver-side model on random strata") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { seq =>
      (s"s${rnd.nextInt(5)}", rnd.nextInt(4000) / 100.0 - 5.0, seq.toLong)
    }
    val got = graft.operators.QualityChecks.winsorizedStats(
      rows.toDF("st", "v", "seq"), "st", "v", "seq")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val expected = rows.groupBy(_._1).map { case (st, rs) =>
      val cents = rs.map(r => (math.round(r._2 * 100), r._3)).sortBy(identity)
      val n = cents.size.toLong
      val lo = cents((math.max(1L, n * 50 / 1000) - 1).toInt)._1
      val hi = cents((math.min(n, n * 950 / 1000 + 1) - 1).toInt)._1
      val clamped = cents.map(c => math.max(lo, math.min(hi, c._1))).sum
      st -> ((n, cents.count(_._1 < lo).toLong, cents.count(_._1 > hi).toLong,
        clamped, lo, hi))
    }
    assert(got === expected)
  }

  test("tokenEntropy: hand-computed fixed-point entropy") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "x x x"), (3L, " ")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.tokenEntropy(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def fp(c: Long, n: Long): Long =
      math.floor(-(c.toDouble / n) * math.log(c.toDouble / n) * 1e9).toLong
    assert(out(1L) === ((3L, 2L, fp(2, 3) + fp(1, 3))))
    assert(out(2L) === ((3L, 1L, fp(3, 3)))) // uniform doc: zero entropy
    assert(!out.contains(3L))                // token-less doc absent
  }

  test("triangleCorners equals brute force on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (1 to 400).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // brute force: count distinct vertex triples with all three edges
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triples = for {
      i <- verts.indices; j <- (i + 1) until verts.size; k <- (j + 1) until verts.size
      x = verts(i); y = verts(j); z = verts(k)
      if und((x, y)) && und((y, z)) && und((x, z))
    } yield Seq(x, y, z)
    val expected = triples.flatten.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val got = Triangles.triangleCorners(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }
}
