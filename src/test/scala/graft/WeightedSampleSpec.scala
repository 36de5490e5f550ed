package graft

import graft.operators.Curation
import org.scalatest.funsuite.AnyFunSuite

/** A-ES weighted sampling vs an independent driver-side model of the
  * same md5/ln algebra, plus the statistical weight-bias property.
  */
class WeightedSampleSpec extends AnyFunSuite with SharedSpark {

  private def md5hash60(salt: String, id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt|$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("matches an independent model of the ln(u)/w ranking") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, if (i % 2 == 0) "even" else "odd", 10L + i % 7))
    val got = Curation.weightedSampleK(docs.toDF("doc_id", "source", "n_chars"),
        "doc_id", "source", "n_chars", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = docs.groupBy(_._2).flatMap { case (src, xs) =>
      xs.map { case (id, _, w) =>
        val u = (md5hash60("wsample", id).toDouble + 1.0) / 1152921504606846976.0
        (id, src, w, math.log(u) / w.toDouble)
      }.sortBy { case (id, _, _, key) => (-key, id) }
        .zipWithIndex.take(5)
        .map { case ((id, s, w, _), i) => (id, s, w, i + 1L) }
    }.toSet
    assert(got.toSet === want)
    // k' < k is a prefix of k (fixed ranking)
    val small = Curation.weightedSampleK(docs.toDF("doc_id", "source", "n_chars"),
        "doc_id", "source", "n_chars", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(small.subsetOf(got.map(r => (r._1, r._4)).toSet))
  }

  test("inclusion probability tracks weight; zero weights excluded") {
    import spark.implicits._
    // one whale (weight 1000) among minnows (weight 1) — across many
    // salts the whale must be sampled far more often than any minnow
    val docs = ((1L to 50L).map((_, "s", 1L)) :+ (99L, "s", 1000L))
    var whaleHits = 0
    for (salt <- (0 until 20).map(i => s"trial$i")) {
      val picked = Curation.weightedSampleK(docs.toDF("doc_id", "source", "n_chars"),
          "doc_id", "source", "n_chars", k = 3, salt = salt)
        .collect().map(_.getLong(0)).toSet
      if (picked.contains(99L)) whaleHits += 1
    }
    assert(whaleHits >= 17, s"whale sampled only $whaleHits/20 times")
    val withZero = docs :+ (100L, "s", 0L)
    val out = Curation.weightedSampleK(withZero.toDF("doc_id", "source", "n_chars"),
      "doc_id", "source", "n_chars", k = 100)
    assert(!out.collect().map(_.getLong(0)).contains(100L))
  }
}
