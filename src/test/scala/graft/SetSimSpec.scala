package graft

import graft.operators.SetSimJoin
import org.scalatest.funsuite.AnyFunSuite

/** Exactness of the prefix-filtered Jaccard join: must equal the
  * brute-force all-pairs computation (no missed pair, no false pair).
  */
class SetSimSpec extends AnyFunSuite with SharedSpark {

  private def bruteJaccard(docs: Seq[(Long, String)], tauNum: Int, tauDen: Int) = {
    val sets = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" +").filter(_.nonEmpty).toSet
    }.toMap
    (for {
      a <- sets.keys; b <- sets.keys; if a < b
      i = (sets(a) & sets(b)).size; u = (sets(a) | sets(b)).size
      if tauDen * i >= tauNum * u
    } yield (a, b, i.toLong, u.toLong)).toSet
  }

  test("prefix-filtered join == brute force on a crafted corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),   // J(1,2)=8/10
      (3L, "the quick brown fox jumps over a lazy dog"),     // J(1,3)=8/10
      (4L, "completely different words entirely here now"),
      (5L, "completely different words entirely here now"),  // J(4,5)=1
      (6L, "the quick"),                                     // size filter prunes vs 1
      (7L, "quick brown fox jumps over lazy dog the")        // J(1,7)=1 (same set)
    )
    val got = SetSimJoin.jaccardJoin(docs.toDF("doc_id", "text"), "text", "doc_id", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === bruteJaccard(docs, 4, 5))
    assert(got.contains((4L, 5L, 6L, 6L)) && got.contains((1L, 7L, 8L, 8L)))
  }

  test("== brute force on random corpora across thresholds") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector.tabulate(30)(i => s"w$i")
    val docs = (1L to 40L).map { id =>
      val n = 3 + rnd.nextInt(10)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    for ((tn, td) <- Seq((1, 2), (7, 10), (9, 10))) {
      val got = SetSimJoin.jaccardJoin(docs.toDF("doc_id", "text"), "text", "doc_id", tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === bruteJaccard(docs, tn, td), s"mismatch at tau=$tn/$td")
    }
  }
}
