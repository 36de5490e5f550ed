package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV sketch maintenance: the per-stratum k-minimum-values
  * distinct sketch ([[graft.operators.Sketches.kmvSketch]]) kept
  * current over an unbounded document stream with `mapGroupsWithState`
  * — the same posture as the streaming CMS/IVF maintenance rows: the
  * sketch is a BOUNDED, ORDER-INSENSITIVE state (k smallest distinct
  * hashes; min-merge is commutative/associative/idempotent), so any
  * micro-batch slicing converges to the batch sketch of the union.
  * Set-operation estimates ([[graft.operators.Sketches.kmvSetOps]]'
  * algebra) can then be answered at any moment from k-row states
  * without touching the stream's history.
  *
  * Item hashing reuses the batch algebra exactly: lowercase whitespace
  * tokens, space-joined n-gram shingles, md5 first-15-hex-chars as a
  * 60-bit value — [[hash60]] is the scalar twin of
  * `conv(substring(md5(x), 1, 15), 16, 10)`.
  */
object StreamingKmv {
  final case class DocRecord(source: String, text: String)
  final case class KmvSketchState(mins: Seq[Long])

  /** Scalar twin of `conv(substring(md5("kmv|" || s), 1, 15), 16, 10)`:
    * the first 60 bits of the md5, exactly as the batch column algebra
    * and the DuckDB oracle compute them.
    */
  def hash60(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(("kmv|" + s).getBytes("UTF-8"))
    var h = 0L
    var b = 0
    while (b < 8) {
      val v = dig(b) & 0xff
      h = if (b < 7) (h << 8) | v else (h << 4) | (v >> 4)
      b += 1
    }
    h
  }

  private[streaming] def itemHashes(text: String, shingleN: Int): Iterator[Long] = {
    val toks = Option(text).getOrElse("")
      .toLowerCase(java.util.Locale.ROOT)
      .split(" +").filter(_.nonEmpty)
    if (shingleN <= 0) toks.iterator.distinct.map(hash60)
    else {
      val seen = scala.collection.mutable.HashSet.empty[String]
      Iterator.range(0, toks.length - shingleN + 1)
        .map(i => toks.slice(i, i + shingleN).mkString(" "))
        .filter(seen.add)
        .map(hash60)
    }
  }

  /** Maintain the per-source sketch; emits each source's current
    * (source, mins) after every micro-batch that touches it (update
    * mode). `mins` is ascending and at most k long — the exact rows
    * the batch [[graft.operators.Sketches.kmvSketch]] would produce
    * for the stream-so-far.
    */
  def sketch(docs: Dataset[DocRecord], k: Int, shingleN: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocRecord], state: GroupState[KmvSketchState]) =>
          val prior = state.getOption.map(_.mins).getOrElse(Seq.empty)
          val batchMins = rows.flatMap(d => itemHashes(d.text, shingleN))
          val merged = (prior.iterator ++ batchMins).toArray
            .distinct.sorted.take(k).toSeq
          state.update(KmvSketchState(merged))
          (source, merged)
      }
      .toDF("source", "mins")
  }

  /** The output mode [[sketch]]'s plan requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
