package graft

import graft.operators.{FuzzyJoin, Temporal}
import graft.plans.PageRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temporal joins, fuzzy matching and PageRank vs hand-computed
  * results and naive reference formulations on crafted frames.
  */
class TemporalSpec extends AnyFunSuite with SharedSpark {

  test("asofJoin picks latest at-or-before right row per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 1, t=10: sees right t=10 (tie -> right first)
      (1L, 5L, 101L),  // t=5: sees right t=3
      (1L, 2L, 102L),  // t=2: no prior right -> null
      (2L, 50L, 103L)  // key 2: sees right t=20
    ).toDF("k", "t", "ev")
    val right = Seq((1L, 3L, 30.0), (1L, 10L, 99.0), (2L, 20L, 7.5))
      .toDF("k", "t", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", "v", "asof")
      .select("ev", "asof").collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(100L) === Some(99.0)) // same-instant right row included
    assert(out(101L) === Some(30.0))
    assert(out(102L) === None)       // nothing at or before
    assert(out(103L) === Some(7.5))
  }

  test("rangeJoinBucketed equals the naive inequality join") {
    import spark.implicits._
    // times straddle bucket boundaries for width=10: [t, t+10) windows
    val left = Seq((1L, 8L, 1L), (1L, 10L, 2L), (2L, 95L, 3L), (3L, 7L, 4L))
      .toDF("k", "t", "lid")
    val right = Seq(
      (1L, 8L, 80L), (1L, 17L, 81L), (1L, 18L, 82L), (1L, 20L, 83L),
      (2L, 104L, 84L), (2L, 105L, 85L), (9L, 8L, 86L)
    ).toDF("k", "t", "rid")
    val got = Temporal.rangeJoinBucketed(left, right, "k", "t", "t", width = 10L)
      .select("lid", "r_rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (lk, lt, lid) <- Seq((1L, 8L, 1L), (1L, 10L, 2L), (2L, 95L, 3L), (3L, 7L, 4L))
      (rk, rt, rid) <- Seq((1L, 8L, 80L), (1L, 17L, 81L), (1L, 18L, 82L), (1L, 20L, 83L),
        (2L, 104L, 84L), (2L, 105L, 85L), (9L, 8L, 86L))
      if lk == rk && rt >= lt && rt < lt + 10L
    } yield (lid, rid)).toSet
    assert(got === want)
    assert(want.contains((1L, 80L)) && want.contains((2L, 81L))) // sanity: non-trivial
  }

  test("intervalJoinBucketed == naive overlap join, each pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val mk = (n: Int) => Seq.fill(n) {
      val s = rnd.nextInt(200).toLong
      (1L + rnd.nextInt(2), s, s + 1 + rnd.nextInt(60)) // key 1..2
    }
    val ls = mk(40); val rs = mk(40)
    val l = ls.zipWithIndex.map { case ((k, s, e), i) => (k, s, e, i.toLong) }
      .toDF("k", "ls", "le", "lid")
    val r = rs.zipWithIndex.map { case ((k, s, e), i) => (k, s, e, i.toLong) }
      .toDF("k", "rs", "re", "rid")
    // width much smaller than interval length -> heavy bucket overlap,
    // the dedup-at-later-start rule must still yield each pair once
    val got = Temporal.intervalJoinBucketed(l, r, "k", "ls", "le", "rs", "re", width = 16L)
      .select("lid", "r_rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length === got.distinct.length, "pair reported more than once")
    val want = (for {
      ((lk, lss, le), li) <- ls.zipWithIndex
      ((rk, rss, re), ri) <- rs.zipWithIndex
      if lk == rk && lss < re && rss < le
    } yield (li.toLong, ri.toLong)).toSet
    assert(got.toSet === want)
  }

  test("rollingFeatures sums the strictly-preceding range frame") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5L), (1L, 12L, 7L), (1L, 15L, 1L), (1L, 30L, 2L),
      (2L, 10L, 9L)
    ).toDF("k", "t", "c")
    // span 10: frame is [t-10, t-1]
    val out = Temporal.rollingFeatures(df, "k", "t", span = 10L,
      aggs = Map("s" -> sum(col("c"))))
      .select("k", "t", "s").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), Option(r.get(2)))).toMap
    assert(out((1L, 10L)) === None)        // empty frame -> null
    assert(out((1L, 12L)) === Some(5L))    // sees t=10 only
    assert(out((1L, 15L)) === Some(12L))   // sees t=10,12; not itself
    assert(out((1L, 30L)) === None)        // t=15 is 15 back, outside span 10
    assert(out((2L, 10L)) === None)        // other key invisible
  }

  test("fuzzyNamePairs: blocking, distance bound, per-block cap") {
    import spark.implicits._
    val df = (Seq.fill(3)("cold gear") ++ Seq("bold gear", "blue gear",
      "cold ring", "gold ring", "totally different")).toDF("nm")
    val out = FuzzyJoin.fuzzyNamePairs(df, "nm", "split(name, ' ')[1]", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    // within "gear": cold~bold (1); blue is 3 from cold, 2 from bold -> out
    // within "ring": cold~gold (1); no cross-block pairs
    assert(out === Set(
      ("bold gear", "cold gear", 1, 1L, 3L),
      ("cold ring", "gold ring", 1, 1L, 1L)))
    // cap 1 leaves one name per block -> no pairs at all
    val capped = FuzzyJoin.fuzzyNamePairs(df, "nm", "split(name, ' ')[1]",
      maxDist = 1, blockCap = 1)
    assert(capped.count() === 0L)
  }

  test("pageRankFixed matches a driver-side integer simulation") {
    import spark.implicits._
    // small graph with a fan-in, a chain and a dangling node
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 3L), (1L, 5L), (3L, 5L))
      .toDF("src", "dst")
    val nodes = (1L to 6L).toDF("id")
    val got = PageRank.pageRankFixed(nodes, edges, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // independent simulation of the same integer algebra, dangling
    // mass (nodes 5 and 6 have no out-edge) redistributed uniformly
    val es = Seq((2L, 1L), (3L, 1L), (4L, 3L), (1L, 5L), (3L, 5L))
    val deg = es.groupBy(_._1).map { case (s, xs) => (s, xs.size.toLong) }
    var rank = (1L to 6L).map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to 3) {
      val msg = es.groupBy(_._2).map { case (d, xs) =>
        (d, xs.map { case (s, _) => rank(s) / deg(s) }.sum)
      }
      val dang = rank.collect { case (id, r) if !deg.contains(id) => r }.sum
      val share = dang / 6L
      rank = rank.map { case (id, _) =>
        (id, 150000000L + 85L * (msg.getOrElse(id, 0L) + share) / 100L)
      }
    }
    assert(got === rank)
    // the fan-in hub outranks the leaf
    assert(got(5L) > got(6L))
  }
}
