package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the curation operators beyond dedup: decontamination,
  * deterministic splits/sampling, repetition signals, PII scrubbing,
  * and semantic dedup.
  */
class CurationSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("contamination flags verbatim test-set overlap; decontaminate drops it") {
    val testSet = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words then the quick brown fox jumps over the lazy dog and more"),
      (2L, "completely unrelated content with different words entirely here"),
      (3L, "quick brown fox appears briefly")).toDF("doc_id", "text")
    val scores = Curation.contamination(corpus, testSet, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 embeds the whole test doc -> shares many 3-grams; doc 3
    // shares exactly one ("quick brown fox"); doc 2 shares none
    assert(scores(1L) >= 6)
    assert(scores(3L) == 1)
    assert(!scores.contains(2L))
    val survivors = Curation.decontaminate(corpus, testSet, "text", "doc_id", n = 3, minOverlap = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(survivors.sameElements(Array(2L, 3L)))
  }

  test("hashSplit is deterministic, complete, and stable under corpus growth") {
    val docs = (0L until 500L).toDF("doc_id")
    val a = Curation.hashSplit(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val b = Curation.hashSplit(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(a == b) // re-run stable
    assert(a.size == 500)
    assert(a.values.forall { case (bucket, split) =>
      bucket >= 0 && bucket < 100 &&
        ((bucket < 90) == (split == "train")) &&
        ((bucket >= 90 && bucket < 95) == (split == "val")) &&
        ((bucket >= 95) == (split == "test"))
    })
    // growth-stable: the assignment of the first 100 ids is unchanged
    // when 400 more rows exist (hash depends on the id alone)
    val small = Curation.hashSplit((0L until 100L).toDF("doc_id"), "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(small.forall { case (k, v) => a(k) == v })
    // 90/5/5 within tolerance on 500 ids
    val trainFrac = a.values.count(_._2 == "train") / 500.0
    assert(trainFrac > 0.84 && trainFrac < 0.96, s"train frac $trainFrac")
  }

  test("stratifiedSample respects per-stratum rates deterministically") {
    val docs = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val sampled = Curation.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 500, "src1" -> 0), defaultPerMille = 100)
    val bySrc = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("src1", 0L) == 0L)          // rate 0 -> nothing
    val src0 = bySrc.getOrElse("src0", 0L) / 500.0      // ~50% of 500
    assert(src0 > 0.38 && src0 < 0.62, s"src0 frac $src0")
    val rest = (bySrc.getOrElse("src2", 0L) + bySrc.getOrElse("src3", 0L)) / 1000.0
    assert(rest > 0.05 && rest < 0.16, s"rest frac $rest")
    assert(sampled.collect().toSet == sampled.collect().toSet) // deterministic
  }

  test("repetitionStats computes exact signals on a crafted doc") {
    val docs = Seq((1L, "spam spam spam eggs and spam")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "text", "doc_id").collect()(0)
    // toks: spam spam spam eggs and spam -> 6 words, 3 duplicates of 'spam'
    assert(r.getAs[Long]("n_words") == 6)
    assert(math.abs(r.getAs[Double]("dup_word_frac") - 3.0 / 6.0) < 1e-9)
    // 2-grams: "spam spam" x2, others x1 -> top gram "spam spam", count 2
    assert(r.getAs[String]("top2_gram") == "spam spam")
    assert(r.getAs[Long]("top2_count") == 2)
    // no repeated 3-gram
    assert(r.getAs[Double]("dup3_char_frac") == 0.0)

    val rep = Seq((2L, "go go go go go")).toDF("doc_id", "text")
    val r2 = TextAnalysis.repetitionStats(rep, "text", "doc_id").collect()(0)
    assert(r2.getAs[Long]("top2_count") == 4)           // "go go" x4
    // 3-grams: "go go go" x3 -> dup = 2 * len("go go go") = 16, tot = 24
    assert(math.abs(r2.getAs[Double]("dup3_char_frac") - 16.0 / 24.0) < 1e-6) // output rounds to 6 digits
  }

  test("piiScrub counts and redacts emails, IPs, phone numbers") {
    val docs = Seq(
      (1L, "reach me at jane.doe+x@corp.example.org or 192.168.1.77 or +1-650-555-0199 thanks"),
      (2L, "no sensitive content here at all")).toDF("doc_id", "text")
    val rows = TextAnalysis.piiScrub(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    val p = rows(1L)
    assert(p.getAs[Long]("n_emails") == 1)
    assert(p.getAs[Long]("n_ipv4") == 1)
    assert(p.getAs[Long]("n_phones") == 1)
    assert(p.getAs[Boolean]("has_pii"))
    val clean = rows(2L)
    assert(!clean.getAs[Boolean]("has_pii"))
    // redaction removes every match: scrubbing the already-scrubbed
    // text is a fixpoint, and the redacted text of doc 1 differs
    val redacted = docs.filter($"doc_id" === 1L).select(
      regexp_replace(regexp_replace(regexp_replace($"text",
        TextAnalysis.EmailPattern, "<EMAIL>"),
        TextAnalysis.Ipv4Pattern, "<IP>"),
        TextAnalysis.PhonePattern, "<PHONE>").as("t")).as[String].collect()(0)
    assert(redacted == "reach me at <EMAIL> or <IP> or <PHONE> thanks")
  }

  test("tokenBudget keeps a hash-order prefix within each stratum's budget") {
    val docs = (0L until 100L).map(i => (i, ("w " * (i % 5 + 1).toInt).trim, s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
    val kept = Curation.tokenBudget(docs, "text", "doc_id", "source",
      Map("src0" -> 30L), defaultBudget = 15L).collect()
    val bySrc = kept.groupBy(_.getString(1))
    // budget respected: max cumulative total within each stratum
    assert(bySrc("src0").map(_.getLong(3)).max <= 30L)
    assert(bySrc("src1").map(_.getLong(3)).max <= 15L)
    // cum_tokens is consistent: per stratum, sorted cum = running sum of n_tokens
    bySrc.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(2)).scanLeft(0L)(_ + _).tail.sameElements(sorted.map(_.getLong(3))))
    }
    // deterministic
    val again = Curation.tokenBudget(docs, "text", "doc_id", "source",
      Map("src0" -> 30L), defaultBudget = 15L).collect()
    assert(again.map(_.toString).sorted.sameElements(kept.map(_.toString).sorted))
  }

  test("BPE learns the obvious merge first on a crafted corpus") {
    val docs = Seq((1L, "aaab aaab aaab xy"), (2L, "aaab xy xy")).toDF("doc_id", "text")
    val m = Bpe.learn(docs, "text", merges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // 'aaab' x4: 'a a' counts twice per word -> freq 8; merge 1 = a+a
    assert(m(0) == ((1L, "a", "a", "aa", 8L)))
    // 'a a a b' -> 'aa a b' (left-to-right non-overlapping); round 2
    // ties 'aa a' (4) with 'a b' (4) and the pair-ASC tie-break picks
    // 'a b' (space sorts below 'a'); round 3 merges 'aa ab'
    assert(m(1) == ((2L, "a", "b", "ab", 4L)))
    assert(m(2) == ((3L, "aa", "ab", "aaab", 4L)))
    assert(m.length == 3)
    // merged symbol concatenation is consistent
    assert(m.forall { case (_, l, r, merged, _) => merged == l + r })
  }

  test("dsirScores rank target-domain-looking docs above background docs") {
    val docs = Seq(
      (1L, "alpha alpha gamma", "tgt"),   // target domain
      (2L, "alpha gamma alpha", "tgt"),
      (3L, "beta beta gamma", "web"),     // background-only vocabulary
      (4L, "beta gamma beta", "web"),
      (5L, "alpha alpha alpha", "web")    // background doc that LOOKS like the target
    ).toDF("doc_id", "text", "source")
    val scores = Curation.dsirScores(docs, "text", "doc_id", $"source" === "tgt")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.size == 5)
    // alpha is target-heavy, beta never appears in target: every
    // alpha-doc outranks every beta-doc, including the background
    // doc 5 (that's the point of importance weighting)
    assert(Seq(1L, 2L, 5L).map(scores).min > Seq(3L, 4L).map(scores).max)
  }

  test("tfidf ranks corpus-rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common common zebra"),
      (2L, "common words here"),
      (3L, "common words there")).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidf(docs, "text", "doc_id", topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getDouble(4))).toMap
    // doc 1: 'zebra' (df=1) outranks 'common' (df=3, idf=ln(1)=0)
    assert(rows((1L, 1L))._1 == "zebra")
    assert(math.abs(rows((1L, 1L))._2 - math.log(3.0)) < 1e-6)
    // 'common' appears in every doc -> score exactly 0, ranked below
    // df=2 'words'/'here' in doc 2
    assert(rows((2L, 1L))._1 == "here" || rows((2L, 1L))._1 == "words")
    assert(rows.forall { case ((_, _), (_, s)) => s >= 0.0 })
  }

  test("semanticDedup drops the higher id of a near-identical pair, keeps distinct vectors") {
    val base = Array.fill(64)(0.1f)
    val nearA = base.clone(); val nearB = base.clone(); nearB(0) = 0.1001f
    val other = Array.tabulate(64)(i => if (i % 2 == 0) 0.5f else -0.5f)
    val emb = Seq((10L, nearA.toSeq), (20L, nearB.toSeq), (30L, other.toSeq))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val kept = Similarity.semanticDedup(emb, tau = 0.99, dim = 64)
      .select("vec_id").as[Long].collect().sorted
    // 10 and 20 are near-identical (cos ~ 1) and land in the same IVF
    // list by construction; 20 (higher id) is dropped
    assert(kept.sameElements(Array(10L, 30L)))
  }

  test("chunkDedup keeps the globally-first occurrence of each chunk and reassembles") {
    val docs = Seq(
      (1L, "a b c d e"),        // chunks: "a b c", "d e"
      (2L, "a b c x y z"),      // "a b c" already seen in doc 1 -> dropped
      (3L, "d e"),              // whole doc is doc 1's second chunk -> dropped
      (4L, "")).toDF("doc_id", "text")
    val out = Curation.chunkDedup(docs, "text", "doc_id", chunkWords = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d e")))
    assert(out(2L) == ((2L, 1L, "x y z")))
    assert(out(3L) == ((1L, 0L, "")))
    assert(out(4L) == ((0L, 0L, "")))
  }

  test("chunkDedup invariants on a boilerplate-heavy corpus: partition + exactly-once") {
    // 500 docs sharing one boilerplate chunk + a unique chunk each —
    // the hot-chunk shape (shared header repeated corpus-wide)
    val docs = (0L until 500L).map(i =>
      (i, s"shared header boilerplate line unique$i tail words here")).toDF("doc_id", "text")
    val out = Curation.chunkDedup(docs, "text", "doc_id", chunkWords = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // every doc: 2 chunks; the shared first chunk survives ONLY in doc 0
    assert(out.forall(_._2 == 2L))
    val kept = out.map(r => r._1 -> r._4).toMap
    assert(kept(0L) == "shared header boilerplate line unique0 tail words here")
    assert((1L until 500L).forall(i => kept(i) == s"unique$i tail words here"))
    // exactly-once: total kept chunks = distinct chunks in the corpus
    val totalKept = out.map(_._3).sum
    assert(totalKept == 1 + 500) // 1 shared + 500 unique
  }

  test("bloomDedup: hits match exact dups at ample m; tiny m forces false positives") {
    val docs = (0L until 30L).map { i =>
      // 20..22 re-ingest the text of 0..2; 23..29 are unique
      val text = if (i >= 20 && i <= 22) s"shared text ${i - 20}" else s"shared text $i"
      (i, text)
    }.toDF("doc_id", "text")
    val prior = col("doc_id") < 20
    val probe = col("doc_id") >= 20
    val ample = Curation.bloomDedup(docs, "text", "doc_id", prior, probe, mBits = 1 << 16, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(ample.size == 10)
    (20L to 22L).foreach(i => assert(ample(i) == ((1L, 1L, 0L)), s"doc $i"))
    (23L to 29L).foreach(i => assert(ample(i) == ((0L, 0L, 0L)), s"doc $i"))
    // 60-bit filter over 20 prior docs (~60 bit insertions) is saturated:
    // unique probes collide -> bloom_hit with exact_dup = 0
    val tiny = Curation.bloomDedup(docs, "text", "doc_id", prior, probe, mBits = 60, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (20L to 22L).foreach(i => assert(tiny(i)._1 == 1L && tiny(i)._2 == 1L, s"doc $i"))
    assert((23L to 29L).count(i => tiny(i)._3 == 1L) > 0, "expected false positives at m=60")
    // a false positive is always also a hit, never an exact dup
    tiny.values.foreach { case (hit, ex, fp) => if (fp == 1L) assert(hit == 1L && ex == 0L) }
  }

  test("packSequences lays out a contiguous per-shard token stream with exact block spans") {
    val docs = (0L until 200L).map(i => (i, ("w " * ((i % 7).toInt + 1)).trim)).toDF("doc_id", "text")
    val rows = Curation.packSequences(docs, "text", "doc_id", seqLen = 16, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == 200)
    // per shard: offsets tile the stream exactly (sorted by start,
    // each doc starts where the previous ended)
    rows.groupBy(_._2).foreach { case (_, g) =>
      val sorted = g.sortBy(_._4)
      sorted.foldLeft(0L) { case (expected, (_, _, n, start, fb, lb, nb)) =>
        assert(start == expected)
        assert(fb == start / 16)
        assert(lb == (start + math.max(n, 1) - 1) / 16)
        assert(nb == lb - fb + 1)
        start + n
      }
    }
    // deterministic across runs
    val again = Curation.packSequences(docs, "text", "doc_id", seqLen = 16, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("perplexityFilter scores in-domain text lower than out-of-domain") {
    // train slice: docs 0-9 repeat a tight phrase; doc 10 is the same
    // domain, docs 11-12 are unseen-word soup
    val docs = ((0L until 10L).map(i => (i, "the cat sat on the mat")) ++ Seq(
      (10L, "the cat sat on the mat again"),
      (11L, "zq xv wk jy pf gd bn"),
      (12L, "the mat sat"))).toDF("doc_id", "text")
    // V = 5 distinct train tokens, so a fully-unseen bigram costs
    // ln 5 ~ 1.61 nats; threshold 1.0 splits in-domain from soup
    val out = TextAnalysis.perplexityFilter(docs, "text", "doc_id",
      isTrain = col("doc_id") < 10, thresholdNats = 1.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out(0L)._1 == 5)
    assert(out(0L)._2 < out(11L)._2, "train text must score below unseen-word soup")
    assert(out(10L)._2 < out(11L)._2)
    assert(out(0L)._3 == 1L)
    assert(out(11L)._3 == 0L)
    // hand-check doc 0's exact ce: 10x each train bigram, context
    // "the" seen 20x, others 10x, V = 5
    val ce0 = -(math.log(11.0 / 25) * 2 + math.log(11.0 / 15) * 3) / 5
    assert(math.abs(out(0L)._2 - ce0) < 1e-5)
    // doc 11's bigrams are fully unseen: ce = ln(V) exactly
    assert(math.abs(out(11L)._2 - math.log(5.0)) < 1e-5)
  }

  test("Bpe.encode applies learned merges: symbol counts shrink and match the vocab") {
    // corpus where "ab" merges first: every word contains the pair
    val docs = Seq((1L, "abc abd abc"), (2L, "abe abc"), (3L, "")).toDF("doc_id", "text")
    val enc1 = Bpe.encode(docs, "text", "doc_id", merges = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // after merging 'a b': every 3-char word is 2 symbols
    assert(enc1(1L) == ((3L, 6L)))
    assert(enc1(2L) == ((2L, 4L)))
    assert(enc1(3L) == ((0L, 0L)))
    val enc0 = Bpe.encode(docs, "text", "doc_id", merges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(enc0(1L) == 9L) // unmerged chars
  }

  test("urlFilter blocks by registered domain and by full host") {
    val docs = Seq(
      (1L, "https://www.spamsite.com/p/1"),   // domain block
      (2L, "https://blog.example.org/p/2"),   // clean
      (3L, "https://cdn.example.com/p/3"),    // host block (domain example.com is clean)
      (4L, "https://shop.example.com/p/4")    // clean (same domain, different host)
    ).toDF("doc_id", "url")
    val out = Curation.urlFilter(docs, "url", "doc_id",
      Seq("spamsite.com", "cdn.example.com"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == (("www.spamsite.com", "spamsite.com", 1L, "spamsite.com")))
    assert(out(2L) == (("blog.example.org", "example.org", 0L, "")))
    assert(out(3L) == (("cdn.example.com", "example.com", 1L, "cdn.example.com")))
    assert(out(4L) == (("shop.example.com", "example.com", 0L, "")))
  }

  test("htmlExtract strips tags/scripts, decodes entities, counts links") {
    val docs = Seq(
      (1L, "<html><head><title>T1</title></head><body><p>hello &amp; bye</p>" +
        "<script>var x = 1;</script><a href=\"https://x.io/a\">go</a></body></html>"),
      (2L, "plain no tags")).toDF("doc_id", "html")
    val out = TextAnalysis.htmlExtract(docs, "html", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(out(1L) == (("T1", "T1 hello & bye go", 1L)))
    assert(out(2L) == (("", "plain no tags", 0L)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "same"), (2L, "before"), (3L, "gone")).toDF("doc_id", "text")
    val nw = Seq((1L, "same"), (2L, "after"), (4L, "fresh")).toDF("doc_id", "text")
    val out = Curation.snapshotDiff(old, nw, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("chunkDedup == independent Scala model on 30 random corpora") {
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 30) {
      val words = Vector("aa", "bb", "cc", "dd")
      val nDocs = 1 + rnd.nextInt(8)
      val corpus = (0 until nDocs).map { i =>
        val n = rnd.nextInt(9) // 0..8 words -> hits empty + partial-chunk cases
        (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val cw = 1 + rnd.nextInt(3)
      // reference model: global first-occurrence per chunk text in
      // (doc_id, chunk_idx) order
      val seen = scala.collection.mutable.Set.empty[String]
      val expect = corpus.map { case (id, text) =>
        val toks = text.split(" +").filter(_.nonEmpty)
        val chunks = toks.grouped(cw).map(_.mkString(" ")).toSeq
        val kept = chunks.filter(c => seen.add(c))
        (id, chunks.length.toLong, kept.length.toLong, kept.mkString(" "))
      }
      val got = Curation.chunkDedup(corpus.toDF("doc_id", "text"), "text", "doc_id", cw)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1)
      assert(got.sameElements(expect), s"round $round cw=$cw corpus=$corpus")
    }
  }

  test("bloomDedup never false-negatives (bloom guarantee) on random corpora") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 10) {
      val n = 20 + rnd.nextInt(30)
      val docs = (0L until n.toLong).map(i =>
        (i, s"doc ${rnd.nextInt(15)} body")) // forced collisions across batches
        .toDF("doc_id", "text")
      val m = 64 + rnd.nextInt(256)
      val out = Curation.bloomDedup(docs, "text", "doc_id",
        priorPred = col("doc_id") % 2 === 0, probePred = col("doc_id") % 2 =!= 0,
        mBits = m, k = 2)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      // exact_dup = 1 (text present in prior batch) MUST imply bloom_hit = 1
      assert(out.forall { case (hit, ex) => ex == 0L || hit == 1L }, s"m=$m")
    }
  }

  test("trainQualityLr separates a separable corpus and is deterministic") {
    val pos = (0L until 40L).map(i =>
      (i, "pos", "the cat and the dog of the house is in it and the bird is of the tree"))
    val neg = (40L until 80L).map(i =>
      (i, "neg", "zxqwv zxqwv zxqwv zxqwv"))
    val docs = (pos ++ neg).toDF("doc_id", "source", "text")
    val out = Curation.trainQualityLr(docs, "text", "doc_id",
      isPositive = col("source") === "pos", iters = 10, lr = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 5)
    assert(out.forall(_._3 == 1.0), s"expected perfect separation, got acc ${out.head._3}")
    // stopword-ratio weight must be positive (positives are stopword-rich),
    // word-length weight negative (negatives are long-word repetitive)
    val w = out.map(r => r._1 -> r._2).toMap
    assert(w(2) > 0, s"stopword weight ${w(2)}")
    assert(w(4) < 0, s"word-length weight ${w(4)}")
    val again = Curation.trainQualityLr(docs, "text", "doc_id",
      isPositive = col("source") === "pos", iters = 10, lr = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.sameElements(again))
  }

  test("mixtureWeights derives exact integer targets and rates") {
    val docs = Seq.tabulate(100)(i =>
      (i.toLong, s"src${i % 2}", ("w " * 10).trim)).toDF("doc_id", "source", "text")
    // each source: 50 docs x 10 tokens = 500 tokens
    val out = Curation.mixtureWeights(docs, "text", "doc_id", "source",
      Map("src0" -> 800L, "src1" -> 200L), totalBudget = 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("src0") == ((50L, 500L, 800L, 800L, 1000L))) // wants 800 of 500 -> capped at 1000pm
    assert(out("src1") == ((50L, 500L, 200L, 200L, 400L)))  // 200 of 500 -> 400pm
  }

  test("sampleK returns exactly k per stratum, deterministic and prefix-stable") {
    val docs = Seq.tabulate(300)(i => (i.toLong, s"src${i % 3}")).toDF("doc_id", "source")
    val out = Curation.sampleK(docs, "doc_id", "source", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == 30)
    assert(out.groupBy(_._2).forall(_._2.map(_._3).sorted.sameElements(1L to 10L)))
    // k=5 selects a prefix of the k=10 sample (hash order is fixed)
    val small = Curation.sampleK(docs, "doc_id", "source", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(small.subsetOf(out.map(r => (r._1, r._2)).toSet))
  }

  test("topNgrams counts and tie-breaks deterministically") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b x y")).toDF("doc_id", "text")
    val out = TextAnalysis.topNgrams(docs, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "a b" x3; then count-1 grams in lexical order: "b a", "b c", "b x", "x y"
    assert(out.sameElements(Array(("a b", 3L), ("b a", 1L), ("b c", 1L))))
  }

  test("tokenIds encodes with the top-k vocab, OOV as 0, order preserved") {
    val docs = Seq(
      (1L, "the cat the dog"),
      (2L, "the unicorn"),
      (3L, "")).toDF("doc_id", "text")
    // counts: the=3, cat=1, dog=1, unicorn=1; vocab top-3 by (c desc,
    // word asc): the=1, cat=2, dog=3; unicorn is OOV
    val out = TextAnalysis.tokenIds(docs, "text", "doc_id", vocabSize = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((4L, 0L, "1 2 1 3")))
    assert(out(2L) == ((2L, 1L, "1 0")))
    assert(out(3L) == ((0L, 0L, "")))
  }

  test("qualityScore computes the hand-derived logit and keep decision") {
    val docs = Seq(
      (1L, "the cat sat"),                          // stopRatio 1/3, unique 1, mwl 3
      (2L, "abcdefghij abcdefghij abcdefghij"),     // no stopwords, unique 1/3, mwl 10
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val logit1 = -0.65 + 0.02 * 3 + 2.0 * (1.0 / 3) + 1.5 * 1.0 - 0.3 * 3.0
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - logit1) < 1e-6)
    assert(out(1L)._3 == 1L)
    val logit2 = -0.65 + 0.02 * 3 + 0.0 + 1.5 * (1.0 / 3) - 0.3 * 10.0
    assert(math.abs(out(2L)._2 - logit2) < 1e-6)
    assert(out(2L)._3 == 0L)
    assert(out(3L) == ((0L, -0.65, 0L)))
  }

  test("BPE handles tokens containing quotes and backslashes") {
    // symbols reach the rewrite via lit(), never an expr string — a
    // corpus with ' or \ in its tokens must learn cleanly
    val docs = Seq((1L, "a'b a'b a'b"), (2L, "c\\d c\\d")).toDF("doc_id", "text")
    val m = Bpe.learn(docs, "text", merges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // round 1: pairs "a '" and "' b" tie at 3; pair-ASC picks "' b"
    assert(m(0) == ((1L, "'", "b", "'b", 3L)))
    // round 2: "a 'b" (3) beats the backslash pairs (2)
    assert(m(1) == ((2L, "a", "'b", "a'b", 3L)))
    val enc = Bpe.encode(docs, "text", "doc_id", merges = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(enc(1L) == 3L) // each a'b is one merged token
  }

  test("urlFilter stays one-row-per-doc when host and domain match different entries") {
    val docs = Seq(
      (1L, "https://cdn.example.com/p/1"),  // host AND domain both blocked
      (2L, "https://www.example.com/p/2"),  // domain blocked only
      (3L, "https://blog.other.org/p/3")    // clean
    ).toDF("doc_id", "url")
    val out = Curation.urlFilter(docs, "url", "doc_id",
      Seq("cdn.example.com", "example.com"))
    assert(out.count() == 3) // no fan-out
    val m = out.collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
    assert(m(1L) == ((1L, "cdn.example.com"))) // lexicographic min of the two matches
    assert(m(2L) == ((1L, "example.com")))
    assert(m(3L) == ((0L, "")))
  }

  test("distinctSketch saturates finitely when every bucket is occupied") {
    val docs = Seq((1L, "s0", (0 until 2000).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.distinctSketch(docs, "text", "source", m = 60).collect()(0)
    assert(r.getLong(1) == 60L) // all buckets set
    // greatest(m-b,1) clamp: estimate = 60*ln(60), not Infinity
    assert(r.getDouble(2) == math.floor(60.0 * math.log(60.0) * 1e6 + 0.5) / 1e6)
    assert(r.getLong(3) == 2000L)
  }

  test("boilerplateStrip deletes high-frequency chunks from every copy, keeps the rest") {
    // 4-word chunks; the banner "one two three four" appears in 3 docs
    // (> maxDocFreq=2) and must vanish everywhere; unique chunks stay
    val docs = Seq(
      (1L, "one two three four alpha beta gamma delta"),
      (2L, "one two three four epsilon zeta eta theta"),
      (3L, "one two three four iota kappa lambda mu"),
      (4L, "nu xi omicron pi")).toDF("doc_id", "text")
    val out = Curation.boilerplateStrip(docs, "text", "doc_id",
      chunkWords = 4, maxDocFreq = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((2L, 1L, 1L, "alpha beta gamma delta")))
    assert(out(2L) == ((2L, 1L, 1L, "epsilon zeta eta theta")))
    assert(out(3L) == ((2L, 1L, 1L, "iota kappa lambda mu")))
    assert(out(4L) == ((1L, 1L, 0L, "nu xi omicron pi")))
  }

  test("bm25TopK ranks term-dense short docs first and respects df weighting") {
    val docs = Seq(
      (1L, "apple apple apple banana"),          // tf(apple)=3, short
      (2L, "apple cherry cherry cherry cherry cherry cherry cherry"), // tf=1, long
      (3L, "banana banana banana banana"),       // no apple
      (4L, "apple date date date")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "text", "doc_id",
      queries = Seq((0L, "apple")), k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // docs 1/2/4 contain apple; doc 1 highest tf -> rank 1; doc 3 absent
    assert(out.length == 3)
    assert(out.head._2 == 1L)
    assert(out.map(_._2).toSet == Set(1L, 2L, 4L))
    // scores strictly ordered by construction (rank follows score desc)
    val scores = out.sortBy(_._1).map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // doc 4 (tf=1, short) outranks doc 2 (tf=1, long): length norm
    val rankOf = out.map(r => r._2 -> r._1).toMap
    assert(rankOf(4L) < rankOf(2L))
  }

  test("trainQualityLr on empty input returns zero weights, not a crash") {
    val docs = Seq((1L, "src0", "text here")).toDF("doc_id", "source", "text")
      .filter(col("doc_id") < 0)
    val out = Curation.trainQualityLr(docs, "text", "doc_id",
      isPositive = col("source") === "pos", iters = 3, lr = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 5)
    assert(out.forall(r => r._2 == 0.0 && r._3 == 0.0))
  }

  test("substringDedup removes duplicated spans keep-first, merges overlaps") {
    val docs = Seq(
      // first occurrence of the 8-gram "a b c d e f g h": untouched
      (1L, "a b c d e f g h x y"),
      // same 8-gram embedded at pos 2: span [2,10) removed -> "p q r"
      (2L, "p q a b c d e f g h r"),
      // self-repetition: 16 tokens = the same 8 twice; the second
      // window (pos 8) duplicates pos 0 -> back half removed
      (3L, "t1 t2 t3 t4 t5 t6 t7 t8 t1 t2 t3 t4 t5 t6 t7 t8"),
      // shorter than k: no grams, passes through reassembled
      (4L, "too short to have grams"),
      // overlapping duplicate windows (pos 2 copies doc1 pos 0, pos 3
      // copies doc1 pos 1): spans [2,10) and [3,11) merge to [2,11)
      (5L, "u v a b c d e f g h x w")).toDF("doc_id", "text")
    val out = Curation.substringDedup(docs, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((10L, 0L, "a b c d e f g h x y")))
    assert(out(2L) == ((11L, 8L, "p q r")))
    assert(out(3L) == ((16L, 8L, "t1 t2 t3 t4 t5 t6 t7 t8")))
    assert(out(4L) == ((5L, 0L, "too short to have grams")))
    assert(out(5L) == ((12L, 9L, "u v w")))
    // doc1's "x" at pos 8 gives doc5 the gram at pos 2 AND the gram
    // "b c d e f g h x" at pos 3 — both duplicates, merged: removed
    // count 9 = [2,11), not 8 + 8
  }

  test("temperatureMixture up-weights small sources by the sqrt rule") {
    // A: 100 docs x 100 tokens = 10000; B: 1 doc x 100 tokens = 100.
    // Proportional share of B ~1%; sqrt share = 10/110 ~9.1%
    val docs = ((0 until 100).map(i => (i.toLong, ("w " * 100).trim, "A")) :+
      (1000L, ("w " * 100).trim, "B")).toDF("doc_id", "text", "source")
    val out = Curation.temperatureMixture(docs, "text", "doc_id", "source", totalBudget = 11000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    val (na, ta) = (out("A")._2, out("A")._3)
    val (nb, tb) = (out("B")._2, out("B")._3)
    assert(na == 10000L && nb == 100L)
    // targets in the sqrt ratio: sqrt(10000)/sqrt(100) = 10
    assert(math.abs(ta.toDouble / tb.toDouble - 10.0) < 0.01, s"ratio ${ta.toDouble / tb}")
    // budget conserved (integer floor can undershoot, never overshoot)
    assert(ta + tb <= 11000L && ta + tb > 10900L)
    // B's target (1000) exceeds its 100 available tokens -> rate capped
    assert(out("B")._4 == 1000L)
    // A's target 10000 = its whole mass -> rate 1000 as well
    assert(out("A")._4 == 1000L)
  }

  test("substringDedupAgainst: prior index owns shared grams, batch keeps first within itself") {
    val prior = Seq(
      (1L, "a b c d e f g h x y")).toDF("doc_id", "text")
    val batch = Seq(
      // embeds prior's 8-gram at pos 2: removed even though it is this
      // batch's only occurrence (prior owns the first occurrence)
      (10L, "p q a b c d e f g h r"),
      // batch-internal repetition, no prior hit: keep-first applies
      (11L, "t1 t2 t3 t4 t5 t6 t7 t8 t1 t2 t3 t4 t5 t6 t7 t8"),
      // no overlap with anything: untouched
      (12L, "u v w x1 x2 x3 x4 x5 x6 x7")).toDF("doc_id", "text")
    val out = Curation.substringDedupAgainst(prior, batch, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.keySet == Set(10L, 11L, 12L)) // batch docs only
    assert(out(10L) == ((11L, 8L, "p q r")))
    assert(out(11L) == ((16L, 8L, "t1 t2 t3 t4 t5 t6 t7 t8")))
    assert(out(12L) == ((10L, 0L, "u v w x1 x2 x3 x4 x5 x6 x7")))
  }

  test("normalizeText: NFC composition, control strip, whitespace collapse") {
    val docs = Seq(
      (1L, "Cafe\u0301 au lait"), // decomposed e-acute -> composed
      (2L, "a\u0007b\u0000c"), // BEL + NUL stripped, no space left behind
      (3L, "  a \t b\n\nc  "), // collapse + trim
      (4L, "already clean"), // unchanged -> changed = 0
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeText(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((13L, 12L, 1L, "Café au lait")))
    assert(out(2L) == ((5L, 3L, 1L, "abc")))
    assert(out(3L) == ((12L, 5L, 1L, "a b c")))
    assert(out(4L) == ((13L, 13L, 0L, "already clean")))
    assert(out(5L) == ((0L, 0L, 0L, "")))
  }

  test("rolling gram hash: equal grams collide, distinct grams don't (property)") {
    // the rolling-update recurrence must agree with itself across
    // positions: equal token windows -> equal keys (the correctness
    // contract), and on a small random sample distinct windows never
    // collide (the 64-bit birthday argument at test scale)
    val rnd = new scala.util.Random(7L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    (1 to 50).foreach { _ =>
      val k = 2 + rnd.nextInt(4)
      val toks = Vector.fill(10 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
      val row = spark.range(1).select(
          Curation.gramHashUdf(
            org.apache.spark.sql.functions.lit(toks.toArray),
            org.apache.spark.sql.functions.lit(k)).as("g"))
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      val byPos = row.map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byPos.size == toks.length - k + 1)
      val grams = toks.sliding(k).toVector
      grams.indices.foreach { i =>
        grams.indices.foreach { j =>
          if (grams(i) == grams(j)) assert(byPos(i.toLong) == byPos(j.toLong),
            s"equal grams at $i/$j hash apart")
          else assert(byPos(i.toLong) != byPos(j.toLong),
            s"distinct grams at $i/$j collide")
        }
      }
    }
  }
}
