package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE (byte-pair-encoding) vocabulary learning — the
  * tokenizer-training half of a training-data pipeline. Classic
  * algorithm (Sennrich et al.): represent each distinct word as a
  * character-symbol sequence, repeatedly count adjacent symbol pairs
  * across the (frequency-weighted) vocabulary and merge the most
  * frequent pair. Returns the learned merge table
  * `(rank, l_sym, r_sym, merged, freq)`.
  *
  * Scale + determinism design:
  *  - the corpus is touched ONCE (word-frequency aggregate); every
  *    merge round runs over the distinct-word VOCAB table, which is
  *    orders of magnitude smaller than the corpus — this is why BPE
  *    training is tractable at 100 TB (Zipf: vocab grows ~sqrt of
  *    corpus);
  *  - per round: one map-side-combined pair-count aggregate + a 1-row
  *    argmax collect (driver state = the merge table, like every
  *    distributed trainer);
  *  - argmax ties break (freq DESC, pair ASC) — deterministic;
  *  - the merge rewrite is a plain left-to-right non-overlapping
  *    string replace on a DOUBLED-space symbol string (so adjacent
  *    matches never share a separator char), which Spark `replace` and
  *    the DuckDB oracle implement identically.
  */
object Bpe {
  /** The learn loop shared by [[learn]] and [[encode]]: returns the
    * merge table rows AND the final vocab frame `(word, freq, seq)`
    * with all merges applied (checkpointed — caller frees it).
    */
  private def learnLoop(docs: DataFrame, textCol: String, merges: Int)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    var vocab = docs
      .select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("seq", trim(regexp_replace(col("word"), "(.)", "$1 ")))
      .localCheckpoint() // vocab is tiny relative to the corpus; the
                         // corpus scan happens exactly once, here
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var exhausted = false
    for (r <- 1 to merges if !exhausted) {
      val best = vocab
        .select(col("freq"), explode(Dedup.shinglesRaw(col("seq"), 2)).as("pair"))
        .groupBy("pair").agg(sum("freq").as("pfreq"))
        .orderBy(col("pfreq").desc, col("pair"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val pfreq = best(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        learned += ((r.toLong, a, b, a + b, pfreq))
        // doubled-space rewrite: ' a  b ' -> ' ab ', then collapse.
        // Symbols are data-derived — they go in via lit(), never
        // spliced into an expr string (a corpus token containing a
        // quote or backslash must not change the plan).
        val next = vocab.withColumn("seq",
          trim(replace(replace(
            concat(lit(" "), replace(col("seq"), lit(" "), lit("  ")), lit(" ")),
            lit(s" $a  $b "), lit(s" $a$b ")),
            lit("  "), lit(" "))))
          .localCheckpoint()
        graft.plans.CheckpointHygiene.free(vocab)
        vocab = next
      }
    }
    (learned.toSeq, vocab)
  }

  /** Learn `merges` BPE merges from the corpus. */
  def learn(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    val (learned, vocab) = learnLoop(docs, textCol, merges)
    graft.plans.CheckpointHygiene.free(vocab)
    val schema = StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("l_sym", StringType, nullable = false),
      StructField("r_sym", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("freq", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(learned.toSeq.map(Row.fromTuple), 1), schema)
  }

  /** BPE encode: apply `merges` learned merges to the corpus and
    * report the per-document symbol count — the tokenizer-APPLY half
    * (the number a token-budget / packing stage actually consumes).
    *
    * Scale shape: the merges are applied to the distinct-word VOCAB
    * (the same Zipf lever as [[learn]] — the corpus text is never
    * rewritten); the corpus is then scored by joining its exploded
    * tokens against the `word -> n_syms` table, a plain shuffle join
    * that AQE broadcasts whenever the vocab fits (it is ~sqrt of
    * corpus). Per-doc totals are one map-side-combined aggregate.
    */
  def encode(docs: DataFrame, textCol: String, idCol: String, merges: Int): DataFrame = {
    val (_, vocab) = learnLoop(docs, textCol, merges)
    val wordSyms = vocab.select(col("word"),
      size(split(col("seq"), " ")).cast("long").as("n_syms"))
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("word"))
      .join(wordSyms, "word") // vocab covers every corpus word by construction
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_bpe_syms"))
    val out = docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_syms"), lit(0L)).as("n_bpe_syms"))
    // the join above consumes the checkpointed vocab lazily; freeing it
    // here would truncate lineage before the query runs, so hand the
    // blocks to the caller's between-query hygiene instead
    out
  }

  /** The shared learn-chain SQL: `WITH v0 ..., p_i/b_i/v_i` per round,
    * ending at vocab table `v<merges>`.
    */
  private def vocabChainSql(merges: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH v0 AS (SELECT word, count(*) AS freq,
        |    trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS seq
        |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), ' +'),
        |      x -> len(x) > 0)) AS word FROM documents)
        |  GROUP BY word)""".stripMargin)
    for (i <- 1 to merges) {
      sb.append(
        s""",
           |p$i AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS pfreq FROM (
           |    SELECT freq, unnest(list_transform(range(1, len(string_split(seq, ' '))),
           |      j -> string_split(seq, ' ')[j] || ' ' || string_split(seq, ' ')[j + 1])) AS pair
           |    FROM v${i - 1}) GROUP BY pair),
           |b$i AS (SELECT pair, pfreq FROM p$i ORDER BY pfreq DESC, pair LIMIT 1),
           |v$i AS (SELECT word, freq,
           |    trim(replace(replace(' ' || replace(seq, ' ', '  ') || ' ',
           |      ' ' || split_part(b.pair, ' ', 1) || '  ' || split_part(b.pair, ' ', 2) || ' ',
           |      ' ' || replace(b.pair, ' ', '') || ' '), '  ', ' ')) AS seq
           |  FROM v${i - 1} CROSS JOIN b$i b)""".stripMargin)
    }
    sb.toString
  }

  /** DuckDB mirror of [[learn]] with the merge rounds unrolled as CTE
    * chains — identical char-split, pair algebra, argmax tie-break,
    * and doubled-space rewrite, so the merge table matches
    * bit-for-bit.
    */
  def learnOracle(merges: Int): String = {
    val union = (1 to merges).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, split_part(pair, ' ', 1) AS l_sym,
         |  split_part(pair, ' ', 2) AS r_sym, replace(pair, ' ', '') AS merged, pfreq AS freq
         |FROM b$i""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "")
    vocabChainSql(merges) + union
  }

  /** DuckDB mirror of [[encode]]: the same learn chain, then the
    * per-doc token join against the final vocab's symbol counts.
    */
  def encodeOracle(merges: Int): String =
    vocabChainSql(merges) +
      s""",
         |enc AS (SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_syms FROM v$merges),
         |dt AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), ' +'),
         |    x -> len(x) > 0)) AS word FROM documents),
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |    CAST(sum(n_syms) AS BIGINT) AS n_bpe_syms
         |  FROM dt JOIN enc USING (word) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(pd.n_words, 0) AS n_words,
         |  coalesce(pd.n_bpe_syms, 0) AS n_bpe_syms
         |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""".stripMargin
}
