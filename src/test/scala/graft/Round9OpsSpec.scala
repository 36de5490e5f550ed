package graft

import graft.operators.{Layout, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operators vs hand-computed expectations on crafted frames:
  * the brute-decontamination size guard, IVF-PQ recall gating, 32-bit
  * z-order spread.
  */
class Round9OpsSpec extends AnyFunSuite with SharedSpark {

  test("semanticContamination refuses a bench side over the documented bound") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val bigBench = (100L to 104L).map(i => (i, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.semanticContamination(corpus, bigBench, threshold = 0.5,
        maxBenchRows = 4L)
    }
    assert(ex.getMessage.contains("semanticContaminationLsh"))
    // at the bound it still runs, and behavior is unchanged
    val ok = Similarity.semanticContamination(corpus, bigBench.limit(4),
      threshold = 0.5, maxBenchRows = 4L).collect()
    assert(ok.length == 1 && ok.head.getLong(0) == 1L)
  }

  test("kmeansCentroids: faithful to kmeans; annIvf accepts learned centroids") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // the exposed centroids must assign exactly like kmeans itself
    val cents = Similarity.kmeansCentroids(emb, k = 4, iters = 2)
    val viaCents = emb.select(col("vec_id"),
        Similarity.assignClCol(cents)(col("embedding")).as("cl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaKmeans = Similarity.kmeans(emb, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaCents == viaKmeans)
    // annIvf with learned centroids: same output contract (k ranked
    // neighbors per query, ranks dense), centroid count enforced
    val out = Similarity.annIvf(emb, emb.filter(col("vec_id") < 2), k = 3,
      dim = 64, lists = 4, nprobe = 2, centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq && rows.length <= 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.annIvf(emb, emb.limit(1), k = 1, dim = 64, lists = 8,
        centroids = Some(cents)) // 4 centroids != 8 lists
    }
  }

  test("pqLearnedCodebooks beat salted codebooks on clustered vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 400 vectors in 8 well-separated blobs (deterministic noise):
    // exact neighbors are same-blob; learned per-subspace codebooks
    // capture the blob structure, salted random codewords cannot. On
    // uniform-random data both recalls are noise-bound (probed at
    // sf0.1: 0.025 == 0.025) — structure is where learning pays.
    val rnd = new scala.util.Random(907)
    val blobs = Array.fill(8)(Array.fill(64)(rnd.nextDouble() * 2 - 1))
    val vecs = (0 until 400).map { i =>
      val b = blobs(i % 8)
      (i.toLong, b.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 8)
    val k = 5
    // metric: fraction of top-k neighbors from the QUERY'S OWN blob
    // (vec_id % 8). Exact-neighbor recall is the wrong yardstick here:
    // perfect quantization gives every same-blob vector IDENTICAL
    // codes, so ranking within a blob is tie-broken arbitrarily — the
    // refine stage's job (annIvfPqRefine), not PQ's. Blob-level
    // identification is exactly what the coded index must get right.
    val byId = vecs.toMap
    // (blob identification + ADC quantization error) per codebook kind;
    // ADC score_e6/1e6 approximates the true dot — learning must cut
    // that error decisively even when ranking outcomes happen to agree
    def probe(cbs: Option[Array[Array[Array[Double]]]]): (Double, Double) = {
      val rows = Similarity.annPq(emb, q, k = k, dim = 64, codebooks = cbs)
        .select(col("query_id"), col("neighbor_id"), col("score_e6"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val blobFrac = rows.count { case (qi, ni, _) => qi % 8 == ni % 8 }.toDouble / rows.length
      val meanErr = rows.map { case (qi, ni, s) =>
        math.abs(s / 1e6 - Similarity.dotScalar(byId(qi), byId(ni)))
      }.sum / rows.length
      (blobFrac, meanErr)
    }
    val (saltedBlob, saltedErr) = probe(None)
    val (learnedBlob, learnedErr) =
      probe(Some(Similarity.pqLearnedCodebooks(emb, dim = 64)))
    assert(learnedBlob > 0.9, s"learned blob identification $learnedBlob")
    assert(learnedBlob >= saltedBlob)
    assert(learnedErr < saltedErr * 0.5,
      s"learned ADC err $learnedErr vs salted $saltedErr — learning should cut quantization error")
  }

  test("clusterBalancedSample: quota bound, prefix nesting, determinism") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val s25 = Similarity.clusterBalancedSample(emb, k = 4, iters = 2, perCluster = 25)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // quota respected per cluster, ranks dense from 1
    s25.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 25)
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // smaller quota = exact prefix of the larger (hash-order stability)
    val s10 = Similarity.clusterBalancedSample(emb, k = 4, iters = 2, perCluster = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(s10 == s25.filter(_._3 <= 10).toSet)
    // re-run bit-stable
    val again = Similarity.clusterBalancedSample(emb, k = 4, iters = 2, perCluster = 25)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == s25.toSet)
  }

  test("kmvSetOps: small sets exact, large sets estimate within KMV error") {
    import spark.implicits._
    import graft.operators.Sketches
    // small strata (below k): the merged sketch IS the union set, so
    // every column must be exact
    val small = Seq(
      (1L, "alpha beta gamma delta", "sa"),
      (2L, "gamma delta epsilon zeta", "sb"))
      .toDF("doc_id", "text", "source")
    val r = Sketches.kmvSetOps(small, "text", "source", k = 256).collect()(0)
    assert(r.getAs[Long]("est_a") == 4 && r.getAs[Long]("est_b") == 4)
    assert(r.getAs[Long]("est_union") == 6 && r.getAs[Long]("est_inter") == 2)
    assert(r.getAs[Long]("exact_inter") == 2 && r.getAs[Long]("exact_union") == 6)
    assert(math.abs(r.getAs[Double]("jaccard_est") - 2.0 / 6.0) < 1e-6)

    // large strata (thousands of distinct tokens, k=64): estimator
    // branch; KMV relative error ~1/sqrt(k-1) ≈ 13% at k=64 — assert
    // a generous 3-sigma band and that the ranking is sane
    val words = (0 until 3000).map(i => s"w$i")
    val big = Seq(
      (1L, words.take(2000).mkString(" "), "pa"),          // 2000 tokens
      (2L, words.slice(1000, 3000).mkString(" "), "pb"))   // 2000, 1000 shared
      .toDF("doc_id", "text", "source")
    val b = Sketches.kmvSetOps(big, "text", "source", k = 64).collect()(0)
    assert(b.getAs[Long]("exact_union") == 3000 && b.getAs[Long]("exact_inter") == 1000)
    assert(math.abs(b.getAs[Long]("est_union") - 3000L) < 1200,
      s"union est ${b.getAs[Long]("est_union")}")
    assert(math.abs(b.getAs[Long]("est_inter") - 1000L) < 700,
      s"inter est ${b.getAs[Long]("est_inter")}")
    assert(math.abs(b.getAs[Long]("est_a") - 2000L) < 800)
  }

  test("graft_sorted_intersect_n == size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    // 200 random sorted-distinct pairs over a small alphabet (so
    // overlaps actually occur), plus the edges: empty sides, full
    // overlap, disjoint, and binary-order-sensitive tokens
    val rnd = new scala.util.Random(907)
    val alpha = Vector("a", "ab", "b", "ba", "c0x", "c10x", "c1x", "z", "zz", "é", "")
    def randSet() = rnd.shuffle(alpha).take(rnd.nextInt(alpha.size + 1)).toSeq
    val cases = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq.empty[String]),
      (alpha, alpha),
      (Seq("a", "b"), Seq("c0x", "z"))) ++ (1 to 200).map(_ => (randSet(), randSet()))
    val df = cases.toDF("ra", "rb")
      .select(sort_array($"ra").as("wa"), sort_array($"rb").as("wb"))
      .select(
        graft.functions.SortedIntersectCol($"wa", $"wb").as("native"),
        size(array_intersect($"wa", $"wb")).cast("long").as("builtin"))
    assert(df.filter($"native" =!= $"builtin").count() == 0)
    // SQL registration path + null safety
    assert(spark.sql("SELECT graft_sorted_intersect_n(array('a','b','c'), array('b','c','d')) AS n")
      .collect()(0).getLong(0) == 2L)
    assert(spark.sql("SELECT graft_sorted_intersect_n(CAST(NULL AS ARRAY<STRING>), array('a')) AS n")
      .collect()(0).isNullAt(0))
  }

  test("zvalue64 interleaves 31-bit coordinates (where zvalue masks at 16)") {
    import spark.implicits._
    val df = Seq(
      (3L, 1L), // x bits {0,1} -> z bits {0,2}; y bit {0} -> z bit {1}
      (1L << 20, 0L), // a >16-bit coordinate: x bit 20 -> z bit 40
      (0L, 1L << 30), // y bit 30 -> z bit 61 (the widest in-domain bit)
      ((1L << 31) | 5L, 0L), // bit 31 masked: same key as x=5
      (65536L, 65536L)) // the 16-bit zvalue collides this with (0,0)
      .toDF("x", "y")
      .select(Layout.zvalue64($"x", $"y").as("z64"), Layout.zvalue($"x", $"y").as("z32"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(df(0) == ((7L, 7L)))
    assert(df(1) == ((1L << 40, 0L))) // 16-bit path masked it to zero
    assert(df(2)._1 == (1L << 61) && df(2)._1 > 0) // non-negative BIGINT
    assert(df(3)._1 == 17L) // spread31(5): bits {0,2} -> {0,4}
    assert(df(4)._1 == (3L << 32) && df(4)._2 == 0L) // wide keeps, narrow collides
  }
}
