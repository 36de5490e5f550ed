package graft

import graft.operators.{Similarity, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 operators vs hand-computed expectations: the sketch-only
  * KMV estimator, sample-bounded index training, PageRank mass
  * conservation, and the CMS depth bound.
  */
class Round10OpsSpec extends AnyFunSuite with SharedSpark {

  test("kmvSetOpsFromSketches == audited kmvSetOps on every estimate column") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
    def ests(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("est_a"), r.getAs[Long]("est_b"), r.getAs[Long]("est_union"),
        r.getAs[Long]("est_inter"), r.getAs[Double]("jaccard_est"))
    val audited = Sketches.kmvSetOps(docs, "text", "source", k = 64, shingleN = 3)
      .collect().map(r => key(r) -> ests(r)).toMap
    // the artifact path: persistable sketch rows in, estimates out —
    // must agree bit-for-bit with what the audited form reports
    val sk = Sketches.kmvSketch(docs, "text", "source", k = 64, shingleN = 3)
    val sketchOnly = Sketches.kmvSetOpsFromSketches(sk, k = 64)
      .collect().map(r => key(r) -> ests(r)).toMap
    assert(sketchOnly == audited)
    assert(audited.nonEmpty)
    // the artifact contract is structural too: no exact columns (the
    // estimator cannot smuggle a corpus-scale audit back in), and the
    // estimator accepts the PERSISTED artifact — k rows per stratum —
    // detached from any live corpus lineage
    val cols = Sketches.kmvSetOpsFromSketches(sk, k = 64).columns.toSet
    assert(cols == Set("src_a", "src_b", "est_a", "est_b", "est_union",
      "est_inter", "jaccard_est"))
    val persisted = sk.collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("h"), r.getAs[Int]("rn")))
    assert(persisted.groupBy(_._1).values.forall(_.size <= 64))
    import spark.implicits._
    val fromArtifact = Sketches.kmvSetOpsFromSketches(
        persisted.toSeq.toDF("source", "h", "rn"), k = 64)
      .collect().map(r => key(r) -> ests(r)).toMap
    assert(fromArtifact == audited)
  }

  test("kmvSetOpsFromSketches: exact on every random below-k corpus (property)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // when every stratum's distinct-token set is below k, the merged
    // sketch IS the union hash set and all five estimate columns must
    // equal the exact set algebra — the estimator's exactness branch,
    // held over random corpora instead of one crafted fixture
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word))
    val corpusGen = for {
      nSrc <- Gen.chooseNum(2, 4)
      docs <- Gen.listOfN(nSrc, docGen)
    } yield docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" "), s"s$i") }
    val params = Gen.Parameters.default
    var seed = Seed(1008L)
    (0 until 25).foreach { i =>
      val rows = corpusGen.pureApply(params, seed)
      val df = rows.toDF("doc_id", "text", "source")
      val sk = Sketches.kmvSketch(df, "text", "source", k = 256)
      val got = Sketches.kmvSetOpsFromSketches(sk, k = 256).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
      val sets = rows.groupBy(_._3).view
        .mapValues(_.flatMap(_._2.split(" ")).toSet).toMap
      val expect = (for {
        a <- sets.keys; b <- sets.keys if a < b
        sa = sets(a); sb = sets(b)
        inter = (sa & sb).size; uni = (sa | sb).size
      } yield (a, b) -> (sa.size.toLong, sb.size.toLong, uni.toLong, inter.toLong,
        BigDecimal(inter.toDouble / uni).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
      assert(got == expect, s"case #$i rows=$rows")
      seed = seed.next
    }
  }

  test("CMS builders refuse depth beyond the 4-window md5 bound") {
    import spark.implicits._
    val tok = Seq("a", "b").toDF("word")
    val ex = intercept[IllegalArgumentException] {
      Sketches.cmsBuild(tok, d = 5, w = 16)
    }
    assert(ex.getMessage.contains("d in 1..4"))
    intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(Sketches.cmsBuild(tok, 4, 16), tok, d = 7, w = 16)
    }
    // at the bound every row is populated (no null cells dropping out)
    val cells = Sketches.cmsBuild(tok, d = 4, w = 16).collect()
    assert(cells.map(_.getInt(0)).distinct.sorted.toSeq == Seq(0, 1, 2, 3))
    assert(cells.forall(r => !r.isNullAt(1)))
  }

  test("PageRank conserves total mass per round (dangling redistributed)") {
    import spark.implicits._
    // chain 0 -> 1 -> ... -> 9: node 9 is dangling and, pre-round-10,
    // silently drained ~1/n of the total mass every round
    val nodes = (0L to 9L).toDF("id")
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val mass = graft.plans.PageRank.pageRankMass(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = 10L * graft.plans.PageRank.Scale
    assert(mass(0L) == full)
    (1L to 3L).foreach { i =>
      // deterministic integer-division remainders only: per round each
      // node drops < 100 units at damping and the dangling share < 10
      // units globally (~1000/round, contracted by 0.85 round-over-
      // round) — where the dropped-mass formulation leaked ~1e8/round
      assert(mass(i) <= full && mass(i) > full - 4000L,
        s"round $i total ${mass(i)} vs $full — mass is leaking")
    }
    // the last rounds frame is exactly pageRankFixed
    val fixed = graft.plans.PageRank.pageRankFixed(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed.values.sum == mass(3L))
    // node 0 has no in-edges: its rank = base + damped dangling share
    // alone, STRICTLY above the dropped-mass formulation's floor
    assert(fixed(0L) > (100L - 85L) * graft.plans.PageRank.Scale / 100L)
  }

  test("sample-bounded kmeans training: recall within bound of full training") {
    import spark.implicits._
    // the Round9 blob fixture: 400 vectors in 8 well-separated blobs —
    // a bounded training sample still sees every blob, so learned
    // structure (and downstream IVF quality) must survive sampling
    val rnd = new scala.util.Random(907)
    val blobs = Array.fill(8)(Array.fill(64)(rnd.nextDouble() * 2 - 1))
    val vecs = (0 until 400).map { i =>
      val b = blobs(i % 8)
      (i.toLong, b.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 8)
    def blobFrac(cents: Array[Array[Double]]): Double = {
      val rows = Similarity.annIvf(emb, q, k = 5, dim = 64, lists = 8, nprobe = 2,
          centroids = Some(cents))
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      rows.count { case (qi, ni) => qi % 8 == ni % 8 }.toDouble / rows.length
    }
    val fullCents = Similarity.kmeansCentroids(emb, k = 8, iters = 2)
    val sampledCents = Similarity.kmeansCentroids(emb, k = 8, iters = 2,
      trainSample = 160)
    // the sample is LIVE: training on 160-ish of 400 vectors moves the
    // means (identical centroids would mean the filter is a no-op)
    assert(fullCents.map(_.toSeq).toSeq != sampledCents.map(_.toSeq).toSeq)
    val full = blobFrac(fullCents)
    val sampled = blobFrac(sampledCents)
    assert(sampled >= full - 0.1,
      s"sampled-trained blob recall $sampled vs full-trained $full")
    assert(sampled > 0.85, s"sampled-trained blob recall $sampled")
    // determinism: the hash-order sample is partitioning-independent
    val again = Similarity.kmeansCentroids(emb, k = 8, iters = 2, trainSample = 160)
    val cents1 = Similarity.kmeansCentroids(emb, k = 8, iters = 2, trainSample = 160)
    assert(again.map(_.toSeq).toSeq == cents1.map(_.toSeq).toSeq)
  }

  test("sample-bounded PQ training: ADC error within bound of full training") {
    import spark.implicits._
    val rnd = new scala.util.Random(907)
    val blobs = Array.fill(8)(Array.fill(64)(rnd.nextDouble() * 2 - 1))
    val vecs = (0 until 400).map { i =>
      val b = blobs(i % 8)
      (i.toLong, b.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 8)
    val byId = vecs.toMap
    def adcErr(cbs: Array[Array[Array[Double]]]): Double = {
      val rows = Similarity.annPq(emb, q, k = 5, dim = 64, codebooks = Some(cbs))
        .select(col("query_id"), col("neighbor_id"), col("score_e6"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      rows.map { case (qi, ni, s) =>
        math.abs(s / 1e6 - Similarity.dotScalar(byId(qi), byId(ni)))
      }.sum / rows.length
    }
    val fullErr = adcErr(Similarity.pqLearnedCodebooks(emb, dim = 64))
    val sampledErr = adcErr(Similarity.pqLearnedCodebooks(emb, dim = 64,
      trainSample = 160))
    // a 160-vector sample of 8 blobs trains codebooks nearly as tight
    // as the full 400; allow 2x slack for the smaller per-code support
    assert(sampledErr <= fullErr * 2.0 + 1e-9,
      s"sampled-trained ADC err $sampledErr vs full-trained $fullErr")
  }

  test("graft_sorted_intersect_n skips null elements instead of NPE-ing") {
    val out = spark.sql(
      "SELECT graft_sorted_intersect_n(sort_array(array(NULL, 'b', 'a')), " +
        "sort_array(array('b', 'c'))) AS n").collect()(0).getLong(0)
    assert(out == 1L)
  }
}
