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
  /** Learn `merges` BPE merges from the corpus. */
  def learn(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
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
        // doubled-space rewrite: ' a  b ' -> ' ab ', then collapse
        val next = vocab.withColumn("seq",
          expr(s"trim(replace(replace(' ' || replace(seq, ' ', '  ') || ' '," +
            s" ' $a  $b ', ' $a$b '), '  ', ' '))"))
          .localCheckpoint()
        graft.plans.CheckpointHygiene.free(vocab)
        vocab = next
      }
    }
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

  /** DuckDB mirror of [[learn]] with the merge rounds unrolled as CTE
    * chains — identical char-split, pair algebra, argmax tie-break,
    * and doubled-space rewrite, so the merge table matches
    * bit-for-bit.
    */
  def learnOracle(merges: Int): String = {
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
    val union = (1 to merges).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, split_part(pair, ' ', 1) AS l_sym,
         |  split_part(pair, ' ', 2) AS r_sym, replace(pair, ' ', '') AS merged, pfreq AS freq
         |FROM b$i""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "")
    sb.append(union)
    sb.toString
  }
}
