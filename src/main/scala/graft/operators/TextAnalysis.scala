package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: quality
  * statistics, token counting (whitespace + BPE-ish regex), an n-gram
  * language-ID heuristic, and document fingerprinting (see
  * [[Dedup.fingerprint]]). All pure column algebra (whole-stage
  * codegen, no UDFs, no shuffles beyond the caller's).
  */
object TextAnalysis {
  private[graft] val Stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** BPE-ish tokenizer pattern: letter runs, digit runs, or single
    * non-space symbols — the standard pre-tokenization shape (ASCII
    * subset so Java and RE2 regex agree).
    */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Per-document quality statistics: char/word counts, mean word
    * length, punctuation ratio, stopword ratio, uppercase ratio.
    */
  def qualityStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val nChars = length(col(textCol))
    val nPunct = length(col(textCol)) - length(regexp_replace(col(textCol), "[^A-Za-z0-9 ]", ""))
    val nUpper = length(col(textCol)) - length(regexp_replace(col(textCol), "[A-Z]", ""))
    val nStop = size(filter(toks, t => array_contains(lit(Stopwords.toArray), t)))
    docs.select(
      col(idCol).as("doc_id"),
      nChars.cast("long").as("n_chars"),
      size(toks).cast("long").as("n_words"),
      round(length(concat_ws("", toks)).cast("double") / greatest(size(toks), lit(1)).cast("double"), 6)
        .as("mean_word_len"),
      round(nPunct.cast("double") / greatest(nChars, lit(1)).cast("double"), 6).as("punct_ratio"),
      round(nStop.cast("double") / greatest(size(toks), lit(1)).cast("double"), 6).as("stopword_ratio"),
      round(nUpper.cast("double") / greatest(nChars, lit(1)).cast("double"), 6).as("upper_ratio"))
  }

  /** Token counts: whitespace tokens and BPE-ish regex tokens. */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(Dedup.tokens(col(textCol))).cast("long").as("n_ws_tokens"),
      size(filter(regexp_extract_all(col(textCol), lit(BpeTokenPattern), lit(0)), t => length(t) > 0))
        .cast("long").as("n_bpe_tokens"))

  /** Fixed-weight linear quality classifier (fastText / FineWeb-Edu
    * classifier shape): a logit over cheap text features — capped word
    * count, stopword ratio, vocabulary diversity, mean word length —
    * with frozen weights, thresholded into a keep decision. A real
    * pipeline loads trained weights; the *operator* — a wide frozen
    * linear layer evaluated corpus-wide in one codegen'd projection,
    * zero shuffles — is identical at any weight count.
    *
    * The logit uses only +, *, / and min (no transcendentals), so with
    * an identical evaluation order IEEE-754 makes it bit-reproducible
    * across engines — `keep` thresholds the RAW double safely.
    */
  def qualityScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val nWords = size(toks)
    val nWordsD = greatest(nWords, lit(1)).cast("double")
    val stopRatio = size(filter(toks, t => array_contains(lit(Stopwords.toArray), t)))
      .cast("double") / nWordsD
    val uniqueRatio = size(array_distinct(toks)).cast("double") / nWordsD
    val meanWordLen = length(concat_ws("", toks)).cast("double") / nWordsD
    val logit = lit(-0.65) +
      lit(0.02) * least(nWords, lit(500)).cast("double") +
      lit(2.0) * stopRatio +
      lit(1.5) * uniqueRatio -
      lit(0.3) * meanWordLen
    docs.select(
      col(idCol).as("doc_id"),
      nWords.cast("long").as("n_words"),
      round(logit, 6).as("quality_logit"),
      when(logit > 0, lit(1L)).otherwise(lit(0L)).as("keep"))
  }

  /** Language-marker profiles: tiny function-word lists per language.
    * A real system ships n-gram profiles; the *operator shape* — score
    * per (doc, lang), argmax with deterministic tie-break — is what
    * matters and is identical at any profile size.
    */
  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "la", "y", "es", "los"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni"))

  /** Union of every token the curation gates inspect (stopwords +
    * language markers). Soak corpus builders keep exactly these tokens
    * unchanged when growing the entity space (all other tokens get a
    * per-copy prefix), so each scaled copy passes the gates identically
    * to the original while its shingle/token space stays disjoint —
    * the "grow entities, don't replicate rows" soak rule applied to a
    * gate-bearing pipeline.
    */
  private[graft] val GateVocab: Set[String] =
    (Stopwords ++ LangProfiles.flatMap(_._2)).toSet

  /** Fused curation gate: language-marker AND quality thresholds in ONE
    * projection over ONE scan — the composed-pipeline shape for scale
    * (the unfused version reads the corpus once per gate; at 100 TB
    * each extra pass is a full-corpus read). Returns the eligible
    * (idCol, textCol) rows; semantics identical to
    * `langId(...).filter(marker_hits >= minMarkers)` ∩
    * `qualityStats(...).filter(n_words >= minWords && stopword_ratio
    * <= maxStopRatio)`.
    */
  def curationGate(docs: DataFrame, textCol: String, idCol: String,
                   minMarkers: Int, minWords: Int, maxStopRatio: Double): DataFrame =
    curationGateAll(docs, textCol, minMarkers, minWords, maxStopRatio)
      .select(col(idCol), col(textCol))

  /** [[curationGate]] preserving every input column — the stateless
    * form the streaming pipeline composes under a watermark (a
    * trailing select would drop the event-time column).
    */
  def curationGateAll(docs: DataFrame, textCol: String,
                      minMarkers: Int, minWords: Int, maxStopRatio: Double): DataFrame = {
    docs
      .withColumn("__toks", Dedup.tokens(col(textCol)))
      .withColumn("__hits", greatest(LangProfiles.map { case (_, words) =>
        size(filter(col("__toks"), t => array_contains(lit(words.toArray), t)))
      }: _*))
      .withColumn("__nw", size(col("__toks")))
      .withColumn("__stop", round(
        size(filter(col("__toks"), t => array_contains(lit(Stopwords.toArray), t))).cast("double")
          / greatest(col("__nw"), lit(1)).cast("double"), 6))
      .filter(col("__hits") >= minMarkers && col("__nw") >= minWords && col("__stop") <= maxStopRatio)
      .drop("__toks", "__hits", "__nw", "__stop")
  }

  /** Repetition-based quality signals (the Gopher/MassiveText rules
    * adapted to the schema): duplicate-word fraction, most-frequent
    * word-2-gram (count + character fraction), and the character
    * fraction sitting in repeated word-3-grams. High values mark
    * boilerplate/spam — the single most effective heuristic family for
    * web-scale pretraining filters.
    *
    * ZERO shuffle: all per-gram counting happens inside ONE scalar UDF
    * pass over the document's own token array, so the work a naive
    * implementation does with explode + groupBy(doc, gram) +
    * window-argmax (three exchanges of ~|doc| rows per document) stays
    * map-side. (A pure HOF-fold formulation over sorted gram arrays was
    * tried first — semantically identical but it falls out of
    * whole-stage codegen and ran ~7x slower than this UDF, the same
    * pathology as the minhash HOF tree; see Dedup.nearDupPairs.)
    * Determinism: top gram = highest count, ties broken by
    * lexicographically smallest gram; corpus text is ASCII so Java
    * UTF-16 ordering, Spark UTF-8 binary ordering, and the DuckDB
    * oracle's string ordering agree. Fractions/rounding stay in column
    * algebra so oracle parity is exactly the division semantics Spark
    * and DuckDB already share.
    */
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), length(col(textCol)).as("__nc"),
        size(toks).as("__nw"), repCountsUdf(toks).as("rc"))
      .select(
        col("doc_id"),
        col("__nw").cast("long").as("n_words"),
        round((col("__nw") - col("rc._1")).cast("double")
          / greatest(col("__nw"), lit(1)).cast("double"), 6).as("dup_word_frac"),
        col("rc._2").as("top2_gram"),
        col("rc._3").cast("long").as("top2_count"),
        round(col("rc._3").cast("double") * length(col("rc._2")).cast("double")
          / greatest(col("__nc"), lit(1)).cast("double"), 6).as("top2_char_frac"),
        round(col("rc._4").cast("double")
          / greatest(col("rc._5"), lit(1)).cast("double"), 6).as("dup3_char_frac"))
  }

  /** Per-document gram-count kernel of [[repetitionStats]]: distinct
    * word count, the (count DESC, gram ASC)-best 2-gram, and the
    * repeated-3-gram char numerator/denominator — one imperative pass,
    * two small hash maps, no array materialization beyond the tokens
    * the projection already built. Returns a tuple (nDistinct,
    * top2Gram, top2Count, dup3Dup, dup3Tot): case classes nested in
    * objects break encoder codegen and silently drop the projection to
    * interpreted eval.
    */
  private val repCountsUdf = udf { (toksIn: Seq[String]) =>
    val arr = toksIn.toArray
    val n = arr.length
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { distinct.add(arr(i)); i += 1 }
    val m2 = new java.util.HashMap[String, Long]()
    i = 0
    while (i + 1 < n) { m2.merge(arr(i) + " " + arr(i + 1), 1L, (a, b) => a + b); i += 1 }
    var bestCnt = 0L
    var bestGram = ""
    val it2 = m2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val c = e.getValue
      if (c > bestCnt || (c == bestCnt && c > 0 && e.getKey.compareTo(bestGram) < 0)) {
        bestCnt = c; bestGram = e.getKey
      }
    }
    val m3 = new java.util.HashMap[String, Long]()
    i = 0
    while (i + 2 < n) { m3.merge(arr(i) + " " + arr(i + 1) + " " + arr(i + 2), 1L, (a, b) => a + b); i += 1 }
    var dup = 0L
    var tot = 0L
    val it3 = m3.entrySet().iterator()
    while (it3.hasNext) {
      val e = it3.next()
      val c = e.getValue
      val len = e.getKey.length.toLong
      dup += (c - 1) * len
      tot += c * len
    }
    (distinct.size, bestGram, bestCnt, dup, tot)
  }

  /** Top-`topK` terms per document by TF-IDF — the classic relevance /
    * keyword-extraction primitive (and the scoring core of DSIR-style
    * importance weighting). Returns `(doc_id, rank, term, tf, score)`.
    *
    * Scale shape: term frequencies are one map-side-combined aggregate
    * on (doc, term), CHECKPOINTED — document frequencies derive from
    * that materialized table (Catalyst does not share subtrees, so
    * without the checkpoint the corpus is scanned and the TF aggregate
    * recomputed once per consumer — verified in the formatted plan);
    * the corpus size joins in as a broadcast 1-row aggregate over a
    * column-pruned scan, never a driver-side count. Ranking orders by
    * the RAW score with term as tie-break: exact ties come from equal
    * (tf, df) pairs, which are bitwise-equal doubles within each
    * engine, so cross-engine ln() rounding cannot reorder them.
    */
  def tfidf(docs: DataFrame, textCol: String, idCol: String, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.agg(count(lit(1)).as("__n"))
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds both the score join and the DF aggregate
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val raw = col("tf").cast("double") * log(col("__n").cast("double") / col("df").cast("double"))
    val w = Window.partitionBy("doc_id").orderBy(raw.desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), round(raw, 6).as("score"))
  }

  /** PII regexes in the Java/RE2 common subset (no lookaround, no
    * backreferences) so Spark and the DuckDB oracle match identically.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]"

  /** PII detection + redaction: per-document match counts for
    * email/IPv4/phone shapes and the redacted text (matches replaced
    * by <EMAIL>/<IP>/<PHONE>, in that order). Pure regex column
    * algebra — one codegen'd projection, no UDF, no shuffle; at 100 TB
    * this runs at scan speed, which is the entire requirement for a
    * compliance pass over a crawl.
    */
  def piiScrub(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"),
        PhonePattern, "<PHONE>")
    docs.select(
      col(idCol).as("doc_id"),
      regexp_count(t, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(t, lit(Ipv4Pattern)).cast("long").as("n_ipv4"),
      regexp_count(t, lit(PhonePattern)).cast("long").as("n_phones"),
      (regexp_count(t, lit(EmailPattern)) + regexp_count(t, lit(Ipv4Pattern))
        + regexp_count(t, lit(PhonePattern)) > 0).as("has_pii"),
      md5(redacted).as("redacted_md5"))
  }

  /** n-gram/function-word language-ID heuristic: count profile hits per
    * language over the token set, argmax score with lexicographic
    * tie-break, 'und' (undetermined) when nothing matches.
    */
  def langId(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val scores = LangProfiles.map { case (lang, words) =>
      struct(
        size(filter(toks, t => array_contains(lit(words.toArray), t))).as("score"),
        lit(lang).as("lang"))
    }
    // max over (score, reversed-lang) = highest score, then alphabetically
    // first language on ties; array_max on structs compares fieldwise
    val best = array_max(array(scores.map(s =>
      struct(s.getField("score").as("score"),
        // negate lang ordering by storing it reversed-complemented is
        // overkill; instead sort_array ascending and take the last of
        // equal scores — we keep it simple: prefer the LAST profile on
        // ties via index weighting
        s.getField("lang").as("lang"))): _*))
    val withScore = docs.select(
      col(idCol).as("doc_id"),
      best.getField("score").as("best_score"),
      best.getField("lang").as("lang_guess"))
    withScore.select(
      col("doc_id"),
      when(col("best_score") > 0, col("lang_guess")).otherwise(lit("und")).as("lang_guess"),
      col("best_score").cast("long").as("marker_hits"))
  }

  /** HTML text extraction (the first stage of every web-corpus
    * pipeline): pull the title, strip script blocks and tags, decode
    * the common entities, collapse whitespace, and count links. A
    * production extractor (trafilatura-class) adds boilerplate
    * heuristics; the *operator* — pure per-row string surgery in one
    * codegen'd projection, zero shuffle, scan-speed — is the same.
    *
    * Regexes stay in the Java/RE2 common subset (`[^>]*` character
    * classes, no backrefs or lookaround) so Spark and the DuckDB
    * oracle transform identically.
    */
  def htmlExtract(docs: DataFrame, htmlCol: String, idCol: String): DataFrame = {
    val noScript = regexp_replace(col(htmlCol), "<script>[^<]*</script>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    docs.select(
      col(idCol).as("doc_id"),
      regexp_extract(col(htmlCol), "<title>([^<]*)</title>", 1).as("title"),
      trim(regexp_replace(decoded, " +", " ")).as("body_text"),
      size(regexp_extract_all(col(htmlCol), lit("<a href=\"[^\"]*\""), lit(0)))
        .cast("long").as("n_links"))
  }

  /** Histogram quantiles — the mergeable at-scale alternative to exact
    * percentiles (`q_length_quantiles` is exact type-7; an exact
    * percentile at 100 TB sorts or multi-passes the column, while a
    * fixed-width histogram is ONE map-side-combined aggregate of
    * bounded size, mergeable across partitions/batches by
    * construction). Returns, per stratum and requested per-mille
    * quantile, the lower edge of the bin containing that quantile —
    * deterministic, so the oracle reproduces it bit-for-bit (which no
    * t-digest/GK sketch can promise).
    *
    * Integer algebra end to end: bin = value div binWidth; the rank
    * threshold is ceil(n * p / 1000) in BIGINT.
    */
  def histQuantiles(docs: DataFrame, textCol: String, idCol: String,
                    strataCol: String, binWidth: Int,
                    quantilesPermille: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = docs
      .select(col(strataCol).as("source"),
        expr(s"CAST(size(filter(split(lower(${textCol}), ' +'), t -> length(t) > 0)) AS BIGINT) div $binWidth").as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the histogram is tiny (max_value/binWidth rows) — checkpoint it
    // so the per-quantile selects below don't re-run the corpus scan
    val cum = bins
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("total", sum(col("c")).over(Window.partitionBy(col("source"))))
      .localCheckpoint()
    val qs = quantilesPermille.map { p =>
      cum.filter(col("cum") >= expr(s"(total * $p + 999) div 1000"))
        .groupBy("source").agg(min(col("bin")).as("bin"))
        .select(col("source"), lit(p.toLong).as("p_permille"),
          (col("bin") * binWidth).as("bin_lo"))
    }
    qs.reduce(_.union(_))
  }

  /** Linear-counting distinct sketch — deterministic cardinality
    * estimation (the fixed-size-state answer to COUNT(DISTINCT) at
    * 100 TB, where the exact aggregate shuffles every distinct value).
    * Hash each value into one of `m` buckets, OR the bucket bitmap
    * (one map-side-combined `bit_or` aggregate over m/60 words —
    * mergeable state, like every sketch), count occupied buckets b,
    * estimate = m * ln(m / (m - b)).
    *
    * md5 bucketing + integer bitmap means — unlike HLL with its
    * engine-specific hash — the DuckDB oracle reproduces the sketch
    * AND the estimate bit-for-bit. The exact distinct count rides
    * along as the accuracy report.
    */
  def distinctSketch(docs: DataFrame, textCol: String, strataCol: String,
                     m: Int = 4096): DataFrame = {
    val tok = docs.select(col(strataCol).as("source"),
      explode(Dedup.tokens(col(textCol))).as("word"))
    val words = tok
      .select(col("source"),
        pmod(conv(substring(md5(concat(lit("lc|"), col("word"))), 1, 15), 16, 10).cast("long"),
          lit(m.toLong)).as("p"))
      .select(col("source"), expr("p div 60").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 60 AS INT))").as("bm"))
      .groupBy("source", "w").agg(expr("bit_or(bm)").as("bits"))
    val setBits = words
      .groupBy("source").agg(sum(expr("bit_count(bits)")).as("b"))
    val exact = tok.groupBy("source").agg(count_distinct(col("word")).as("n_exact"))
    // greatest(m - b, 1): linear-counting saturation fallback — with
    // every bucket occupied (b == m) the raw estimate divides by zero.
    setBits.join(exact, "source")
      .select(col("source"), col("b").as("buckets_set"),
        round(lit(m.toDouble) *
          log(lit(m.toDouble) / greatest(lit(m.toLong) - col("b"), lit(1L)).cast("double")), 6)
          .as("estimate"),
        col("n_exact"))
  }

  /** Corpus-wide top-k word n-grams (boilerplate detection / vocab
    * seeding): one explode + map-side-combined count + a k-row
    * total-order take with deterministic ties (count DESC, gram ASC).
    * The global top-k never materializes the full ordered set —
    * Spark's `orderBy.limit(k)` runs as TakeOrderedAndProject
    * (per-partition top-k, then a k-row driver merge).
    */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs
      .select(explode(Dedup.shinglesRaw(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)

  /** Vocabulary id encoding (the materialization step before
    * training): build the top-`vocabSize` word vocabulary (count DESC,
    * word ASC; ids 1..vocabSize, OOV = 0) and encode every document as
    * its space-joined id sequence.
    *
    * Scale shape: the vocab is a k-row broadcast; encoding explodes
    * tokens WITH position, broadcast-joins ids, and reassembles with
    * one groupBy — the same two-shuffle explode/regroup contract as
    * [[Curation.chunkDedup]]. Output ids ride in one string column so
    * the row stays flat for the writer (and the oracle hash).
    */
  def tokenIds(docs: DataFrame, textCol: String, idCol: String,
               vocabSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // top-k FIRST (TakeOrderedAndProject — distributed per-partition
    // top-k + k-row merge), THEN the id-assignment window over only k
    // rows; a row_number over the full distinct-word vocab would be a
    // single-partition window on hundreds of millions of rows
    val vocab = docs
      .select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(vocabSize)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("c").desc, col("word"))).cast("long"))
      .select("word", "token_id")
    val encoded = docs
      .select(col(idCol).as("doc_id"), posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "word")))
      .join(broadcast(vocab), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), coalesce(col("token_id"), lit(0L)).as("tid")))),
          x => x.getField("tid").cast("string")), " ").as("ids"))
    docs.select(col(idCol).as("doc_id")).join(encoded, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("ids"), lit("")).as("ids"))
  }

  /** CCNet-style perplexity filtering: score every document by the
    * cross-entropy of an add-one-smoothed word-BIGRAM language model
    * trained on the in-domain slice (`isTrain`), keep documents whose
    * per-token cross-entropy stays under `thresholdNats`. CCNet uses a
    * KenLM 5-gram; the *operator* — train an n-gram LM in one
    * aggregate, score the corpus with LM-table joins, threshold — is
    * order-independent, and bigrams keep the oracle exact.
    *
    * Model: P(b|a) = (c(a,b)+1) / (c(a,*)+V), with c(a,*) derived from
    * the bigram table itself (so contexts and totals are consistent by
    * construction) and V = distinct train-token count.
    *
    * Scale + determinism: the LM is two vocab-scale tables — bigram
    * counts (one map-side-combined aggregate over the train slice,
    * checkpointed) and context totals derived FROM that aggregate (no
    * second corpus scan) — plus a 1-row V broadcast. Scoring joins
    * per-doc bigram counts against the LM on the bigram key: a plain
    * shuffle join that AQE broadcasts whenever the LM fits. Per-doc
    * sums add FIXED-POINT contributions (floor(ln P x 1e9) longs, exact
    * integer smoothing inputs), so the distributed sum is exact under
    * any partitioning and the keep decision compares LONGS — no float
    * threshold ambiguity at the boundary ([[Curation.dsirScores]]
    * recipe).
    */
  def perplexityFilter(docs: DataFrame, textCol: String, idCol: String,
                       isTrain: Column, thresholdNats: Double): DataFrame = {
    val thresholdFp = math.floor(thresholdNats * 1e9).toLong
    val train = docs.filter(isTrain)
    val bgStats = train
      .select(explode(Dedup.shinglesRaw(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cab"))
      .localCheckpoint() // vocab-scale; ctx totals derive from it
    val ctxStats = bgStats
      .groupBy(substring_index(col("bg"), " ", 1).as("ctx"))
      .agg(sum("cab").as("ca"))
    val vTot = train
      .select(explode(Dedup.tokens(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(Dedup.shinglesRaw(col(textCol), 2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
    val lnp = log(
      (coalesce(col("cab"), lit(0L)) + 1).cast("double") /
        (coalesce(col("ca"), lit(0L)) + col("v")).cast("double"))
    val scored = perDoc
      .join(bgStats, Seq("bg"), "left")
      .join(ctxStats, substring_index(col("bg"), " ", 1) === col("ctx"), "left")
      .crossJoin(broadcast(vTot))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * floor(lnp * lit(1e9)).cast("long")).as("score_fp"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round((-coalesce(col("score_fp"), lit(0L))).cast("double") /
          (greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)) * lit(1000000000L)).cast("double"), 6)
          .as("cross_entropy"),
        when(-coalesce(col("score_fp"), lit(0L)) <=
          lit(thresholdFp) * coalesce(col("n_bigrams"), lit(0L)), lit(1L))
          .otherwise(lit(0L)).as("keep"))
  }

  /** BM25 keyword retrieval over the corpus — the lexical-search half
    * of a retrieval/decontamination stage (quality-by-query mining,
    * targeted corpus probes, RAG-index ground truth). Scores the
    * Okapi BM25 of each query against every document and returns the
    * top `k` per query.
    *
    * Constants `k1`/`b` must be exact binary fractions (defaults 1.5,
    * 0.75) so Spark and the oracle parse identical doubles. The
    * per-term contribution idf*tfn is floored to FIXED-POINT e9 longs
    * and summed — the per-(query,doc) score is exact and
    * partitioning-independent (the [[perplexityFilter]]/DSIR sum
    * pattern); `score_e9` is that long.
    *
    * Scale shape: the query-term table is tiny and broadcast; the
    * corpus explodes its tokens ONCE and the broadcast semi-join
    * discards every non-query term before any shuffle, so the tf
    * aggregate carries only (query-term x containing-doc) rows. df
    * derives from the tf table (no second corpus scan — the
    * [[tfidf]] trick), N/avgdl from one 1-row aggregate. Ranking is a
    * distributed window over per-query candidate sets.
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queries: Seq[(Long, String)], k: Int,
               k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("dl"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val terms = queries.toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    val tf = toks.select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .join(broadcast(terms), "term")
      .groupBy("query_id", "term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    // df per TERM (a term shared by two queries counts its docs once)
    val df = tf.select(col("term"), col("doc_id")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfn = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))
    val scored = tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", avgdl)
      .withColumn("c_e9", floor(idf * tfn * lit(1e9)).cast("long"))
      .groupBy("query_id", "doc_id").agg(sum(col("c_e9")).as("score_e9"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score_e9").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_e9"))
  }

  /** Per-document token Shannon entropy (lexical-diversity quality
    * signal: near-zero entropy = keyword stuffing / repeated
    * boilerplate, the complement of [[repetitionStats]]'s gram rules).
    * Per-term contributions -(c/n) ln(c/n) are floored to 1e-9 fixed
    * point and summed as BIGINT, so the distributed per-doc sum is
    * exact and partitioning-independent (the dsir/perplexity ln-parity
    * precedent). Token-less documents produce no rows.
    *
    * Scale shape: one (doc, word) count aggregate, then the per-doc
    * totals ride a window over the SAME doc partitioning as the final
    * aggregate — two shuffles total, no joins, state bounded by
    * per-doc distinct words.
    */
  def tokenEntropy(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = docs
      .select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val ratio = col("c").cast("double") / col("__n").cast("double")
    wc
      .withColumn("__n", sum(col("c")).over(wDoc))
      .withColumn("__nd", count(lit(1)).over(wDoc))
      .withColumn("__fp", floor(-ratio * log(ratio) * lit(1e9)).cast("long"))
      .groupBy("doc_id")
      .agg(max(col("__n")).as("n_tokens"),
        max(col("__nd")).as("n_distinct"),
        sum(col("__fp")).as("entropy_fp"))
  }

  /** Unicode NFC normalization (UAX #15 canonical composition) as a
    * scalar function — java.text.Normalizer under the hood, which
    * implements the same normative algorithm DuckDB's `nfc_normalize`
    * does, so the oracle recomputes it independently. Null-total.
    */
  private val nfcUdf = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  /** Text normalization gate — the stage every pretraining pipeline
    * runs before hashing/dedup, because byte-distinct but canonically-
    * equal strings (decomposed accents, stray control characters,
    * run-on whitespace) otherwise defeat exact dedup and skew token
    * counts. Order: NFC composition -> control-char strip (C0 minus
    * \t\n\f\r, plus DEL) -> whitespace collapse ([ \t\n\r\f]+ -> one
    * space; the class is the Java/RE2 common subset — never \s, whose
    * definition differs between engines) -> trim. Returns per doc the
    * raw/normalized code-point counts, the normalized text, and a
    * changed flag.
    *
    * Scale shape: one codegen'd projection over the scan (the NFC UDF
    * is the only non-codegen scalar; everything else is regexp_replace
    * in the fused stage), zero shuffle — normalization is free at any
    * corpus size relative to the scan it rides.
    */
  def normalizeText(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val stripped = regexp_replace(nfcUdf(col(textCol)),
      "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    val collapsed = trim(regexp_replace(stripped, "[ \\t\\n\\r\\f]+", " "))
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__raw"),
        collapsed.as("norm_text"))
      .select(col("doc_id"),
        length(col("__raw")).cast("long").as("n_chars_raw"),
        length(col("norm_text")).cast("long").as("n_chars_norm"),
        (col("norm_text") =!= col("__raw")).cast("long").as("changed"),
        col("norm_text"))
  }
}
