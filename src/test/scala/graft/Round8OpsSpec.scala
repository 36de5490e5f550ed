package graft

import graft.operators.{Dedup, Layout, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operators vs hand-computed expectations on crafted frames:
  * semantic decontamination, quality-aware survivorship, n-gram
  * containment, zone-map audit.
  */
class Round8OpsSpec extends AnyFunSuite with SharedSpark {

  test("semanticContamination flags the planted near-copy, not orthogonal vectors") {
    import spark.implicits._
    def pad(xs: Seq[Float]): Seq[Float] = xs ++ Seq.fill(4 - xs.length)(0f)
    // bench vector 100 = e1; corpus: 1 = ~e1 (cos ~1), 2 = e2 (cos 0),
    // 3 = mixed (cos ~0.707)
    val corpus = Seq(
      (1L, pad(Seq(0.9f, 0f))), (2L, pad(Seq(0f, 1f))),
      (3L, pad(Seq(1f, 1f)))).toDF("vec_id", "embedding")
    val bench = Seq((100L, pad(Seq(1f, 0f)))).toDF("vec_id", "embedding")
    val out = Similarity.semanticContamination(corpus, bench, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 100L, 1.0))) // only the near-copy crosses 0.9
    // lower threshold also admits the mixed vector at cos(45°)
    val out2 = Similarity.semanticContamination(corpus, bench, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(out2.keySet == Set(1L, 3L) && math.abs(out2(3L) - 0.707107) < 1e-6)
  }

  test("semanticContamination arg-max tie-break picks the highest bench_id") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    // two identical bench vectors -> identical scores; struct max = id 201
    val bench = Seq((200L, Seq(2f, 0f)), (201L, Seq(2f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticContamination(corpus, bench, threshold = 0.5).collect()
    assert(out.length == 1 && out.head.getLong(1) == 201L)
  }

  test("semanticContaminationLsh: near-copies recalled, scores equal brute force") {
    import spark.implicits._
    // 64-dim so the production hyperplanes apply; corpus vec 1 is a
    // tiny perturbation of bench vec 100 (cos ~1 -> identical sign
    // buckets in every table -> guaranteed candidate); vec 2 is far
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 1e-4f
    val far = Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat)
    val corpus = Seq((1L, near.toSeq), (2L, far.toSeq)).toDF("vec_id", "embedding")
    val bench = Seq((100L, base.toSeq)).toDF("vec_id", "embedding")
    val lsh = Similarity.semanticContaminationLsh(corpus, bench, threshold = 0.9, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = Similarity.semanticContamination(corpus, bench, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(lsh == Seq((1L, 100L, 1.0)))
    assert(lsh == brute) // on recalled pairs the verification is exact
  }

  test("canonicalPick keeps the highest-quality cluster member, not the min id") {
    import spark.implicits._
    // docs 10/11/12 are near-identical (one cluster); 11 carries the
    // richest text (stopwords + diversity -> highest logit); 99 is
    // unrelated and must not appear
    val rich = "the quick brown fox jumps over the lazy dog and it is fine today"
    val docs = Seq(
      (10L, rich),
      (11L, rich + " extra words of the day it is and to in"),
      (12L, rich + " extra"),
      (99L, "zzz qqq vvv")).toDF("doc_id", "text")
    val out = Dedup.canonicalPick(docs, "text", "doc_id",
      shingleN = 2, bands = 6, rows = 2, threshold = 0.3).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 10L) // cluster_id = component min
    assert(r.getLong(2) == 3L) // cluster_size
    // the canonical is whichever member maximizes the quality logit —
    // recompute expectation from the scored frame itself
    val best = graft.operators.TextAnalysis.qualityScore(
        docs.filter(col("doc_id") =!= 99L), "text", "doc_id")
      .orderBy(col("quality_logit").desc, col("doc_id")).collect().head
    assert(r.getLong(1) == best.getLong(0))
    assert(math.abs(r.getDouble(3) - best.getDouble(2)) < 1e-9)
  }

  test("ngramContainment is asymmetric: quoted short doc scores 1.0 inside long doc") {
    import spark.implicits._
    val short = "alpha beta gamma delta"
    val long = "intro words here " + short + " and a very long tail of unrelated content"
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 1L)).toDF("doc_a", "doc_b")
    val out = Dedup.ngramContainment(docs, pairs, "text", "doc_id", n = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) == 1.0) // every bigram of the short doc is in the long one
    assert(out((2L, 1L)) < 0.3) // but not vice versa
  }

  test("annRecall: identical lists = 1.0, disjoint = 0.0, partial counts hits") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L), (2L, 24L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L), // all hit
      (2L, 20L), (2L, 21L), (2L, 99L), (2L, 98L), (2L, 97L)) // 2 of 5
      .toDF("query_id", "neighbor_id")
    val out = Similarity.annRecall(exact, approx, k = 5)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((5L, 1.0)))
    assert(out(2L) == ((2L, 0.4)))
    // a query the index missed entirely still appears, recall 0
    val none = Similarity.annRecall(exact, approx.filter($"query_id" =!= 2L), k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(none(2L) == 0.0)
  }

  test("zoneMap: files partition the z-range, stats are exact, pruning is sound") {
    import spark.implicits._
    val rows = for (x <- 0L until 64L; y <- 0L until 4L) yield (x, y)
    val df = rows.toDF("a", "b")
    val zm = Layout.zoneMap(df, "a", "b", nFiles = 8, pruneLo = 10L, pruneHi = 12L)
      .collect()
    assert(zm.map(_.getLong(1)).sum == 256L) // every row in exactly one file
    // min/max are true zone stats: recompute per file from first principles
    val fileOf = zm.map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    assert(fileOf.values.forall { case (lo, hi) => lo <= hi })
    // soundness: every file containing an x in [10,12] must be scanned
    val scanned = zm.filter(_.getBoolean(6)).map(_.getLong(0)).toSet
    val mustScan = zm.filter(r => r.getLong(2) <= 12L && r.getLong(3) >= 10L)
      .map(_.getLong(0)).toSet
    assert(mustScan.subsetOf(scanned) && scanned == mustScan)
    // and pruning actually prunes something on this layout
    assert(scanned.size < zm.length)
  }
}
