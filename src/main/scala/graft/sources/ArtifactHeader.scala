package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Self-describing parameter headers for persisted index artifacts —
  * the round-12 IVF-PQ trust convention generalized. An index's rows
  * are meaningless without the parameters they were computed under
  * (an LSH band index probed with different shingle/band/row settings
  * produces a DIFFERENT key space and silently surfaces ~no
  * candidates; a gram index probed at the wrong k never matches), so
  * the build params ride WITH the artifact as a tiny `_`-prefixed
  * sidecar (invisible to parquet listings, travels on copy,
  * preserved by [[ArtifactCompaction]]), content-hashed so corruption
  * refuses loudly.
  *
  * Reference analog: content-addressed identity as the trust
  * mechanism (crates/esvc-core/src/graph.rs:136-154).
  */
object ArtifactHeader {

  /** Integrity failure of a stored header — a SUBTYPE of
    * IllegalArgumentException so existing refusal handling keeps
    * working, but typed so format-compat fallbacks (the IVF-PQ
    * legacy reader) can catch exactly this case instead of
    * string-matching the message.
    */
  final class CorruptHeaderException(msg: String) extends IllegalArgumentException(msg)

  /** The sidecar file name for `kind` — exposed so compat readers
    * address the same file this writer owns instead of duplicating
    * the literal.
    */
  def sidecarName(kind: String): String = s"_graft_${kind}_header"

  private def headerPath(path: String, kind: String) =
    new Path(path, sidecarName(kind))

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Canonical content hash over the sorted k=v lines. */
  def paramsHash(kind: String, params: Seq[(String, String)]): String =
    graft.core.Hashes.contentHash(
      (kind +: params.sortBy(_._1).map { case (k, v) => s"$k=$v" }).mkString("\n"))

  /** Write (or re-stamp) the header. The format is line-oriented
    * (`k=v` per line), so keys must not contain `=` or newlines and
    * values must not contain newlines — refused here rather than
    * silently mis-parsed on the next read. Duplicate keys are refused
    * too (the read side's Map would silently keep one).
    */
  def write(spark: SparkSession, path: String, kind: String,
            params: Seq[(String, String)]): Unit = {
    params.foreach { case (k, v) =>
      require(!k.contains('=') && !k.exists(c => c == '\n' || c == '\r'),
        s"header key '$k' may not contain '=' or newlines")
      require(k != "hash",
        "header key 'hash' is reserved for the integrity line: a param " +
          "named 'hash' would be dropped from the recomputation on read " +
          "and permanently fail the integrity check")
      require(!v.exists(c => c == '\n' || c == '\r'),
        s"header value for '$k' may not contain newlines")
    }
    require(params.map(_._1).distinct.size == params.size,
      s"duplicate header keys: ${params.map(_._1).diff(params.map(_._1).distinct).mkString(", ")}")
    val text = (s"graft-$kind-header v1" +:
      params.sortBy(_._1).map { case (k, v) => s"$k=$v" } :+
      s"hash=${paramsHash(kind, params)}").mkString("\n")
    val (fs, _) = fsOf(spark, path)
    // write-tmp-then-rename(OVERWRITE): header stamps are ATOMIC for
    // readers. Writer-class accesses (appends accumulating a stats
    // sidecar, deletes growing a tombstone set) legally run under the
    // SHARED maintenance lock concurrently with probes reading the
    // same sidecar — an in-place overwrite would expose a torn header
    // to exactly those readers (loud, via the content hash, but a
    // refusal the lock discipline promises cannot happen). The tmp is
    // '.'-prefixed: invisible to parquet listings and never carried
    // by the sidecar-copy rules.
    val target = headerPath(path, kind)
    val tmp = new Path(path, s".${sidecarName(kind)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(fs.getUri, spark.sessionState.newHadoopConf())
      .rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Load + integrity-check; None when the artifact predates headers. */
  def read(spark: SparkSession, path: String, kind: String): Option[Map[String, String]] = {
    val (fs, _) = fsOf(spark, path)
    val hp = headerPath(path, kind)
    if (!fs.exists(hp)) None
    else {
      val in = fs.open(hp)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      require(text.startsWith(s"graft-$kind-header v1"),
        s"unrecognized $kind header format at $path")
      val kv = text.linesIterator.flatMap { l =>
        val i = l.indexOf('=')
        if (i < 0) None else Some(l.substring(0, i) -> l.substring(i + 1))
      }.toMap
      val params = (kv - "hash").toSeq
      val recomputed = paramsHash(kind, params)
      if (!kv.get("hash").contains(recomputed))
        throw new CorruptHeaderException(
          s"$kind header at $path is corrupt: stored hash ${kv.getOrElse("hash", "?")} " +
            s"!= recomputed $recomputed")
      Some(kv - "hash")
    }
  }

  /** The append-path contract: a header-bearing artifact REFUSES
    * params that differ from its own; a headerless (pre-header or
    * brand-new) artifact is stamped with the caller's. Returns unit or
    * throws with the full header-vs-caller identity.
    */
  def validateOrStamp(spark: SparkSession, path: String, kind: String,
                      params: Seq[(String, String)]): Unit =
    read(spark, path, kind) match {
      case Some(stored) if stored != params.toMap =>
        throw new IllegalArgumentException(
          s"$kind artifact at $path was built with different parameters: " +
            s"header ${stored.toSeq.sortBy(_._1).mkString(", ")} vs caller " +
            s"${params.sortBy(_._1).mkString(", ")} — consuming it with mismatched " +
            "parameters silently produces wrong results; rebuild, or pass the " +
            "original parameters")
      case Some(_) => ()
      case None => write(spark, path, kind, params)
    }

  /** Remove a sidecar (e.g. a consumed tombstone set after its fold).
    * Returns whether a file existed — deleting an absent sidecar is a
    * no-op, not an error (absence IS the empty state on the read
    * side).
    */
  def delete(spark: SparkSession, path: String, kind: String): Boolean = {
    val (fs, _) = fsOf(spark, path)
    fs.delete(headerPath(path, kind), false)
  }

  /** The read-path contract: the header must exist (refuse with
    * guidance otherwise) and the caller either takes the stored
    * params or is validated against them.
    */
  def required(spark: SparkSession, path: String, kind: String): Map[String, String] =
    read(spark, path, kind).getOrElse(throw new IllegalArgumentException(
      s"no $kind header at $path: cannot verify which parameters built this " +
        "artifact. Grow it through its stamping append path, or stamp it " +
        "explicitly with ArtifactHeader.write."))
}
