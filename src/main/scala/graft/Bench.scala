package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Failures are recorded
  * per-query in an "errors" object (never silently timed — see
  * VERDICT r01). The noop datasource forces full evaluation (count()
  * can short-circuit scans).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // straggler armor: this box shows rare single-task stalls from
      // host-level page management (zero GC, thread parked 10-40 s —
      // see PLANS.md). The heap is pre-touched (build.sbt); speculation
      // re-launches any task 4x over the stage median so one stalled
      // thread cannot gate a whole query — which is also exactly the
      // posture a real 1000-executor job runs with.
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "1s")
      .config("spark.speculation.multiplier", "2")
      // many stages here have 3-4 tasks: at the default quantile 0.75
      // a single stalled task of 3 blocks speculation forever (2/3 <
      // 0.75); 0.5 lets the healthy majority trigger it
      .config("spark.speculation.quantile", "0.5")
      .config("spark.speculation.efficiency.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // releasing locally-checkpointed blocks between queries emits one
    // WARN per RDD ("lineage has been truncated..."); those lines land
    // directly before the final JSON line and eat the driver's stdout
    // tail capture — silence just that logger
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }

    // session/JIT/codegen warmup so the first timed query is not
    // charged for executor + whole-stage-codegen compiler startup;
    // touch both the lineitem agg path and the documents regex/
    // tokenize path (the two codegen families the queries live in)
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .limit(1000).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    try graft.operators.TextAnalysis.qualityStats(
        spark.read.parquet(s"$sfDir/documents.parquet").limit(200), "text", "doc_id")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // ...and the heaviest family: shingle explode + 12-way min-agg +
    // banded self-join + jaccard verify (codegen classes are keyed by
    // generated source, so the limited variant warms the full query)
    try graft.operators.Dedup.nearDupPairs(
        spark.read.parquet(s"$sfDir/documents.parquet").limit(64), "text", "doc_id")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    graft.plans.CheckpointHygiene.releaseAll(spark)

    // dev iteration: SPARK_GRAFT_ONLY=q_a,q_b restricts the run
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some(e.getClass.getSimpleName + ": " + Option(e.getMessage).getOrElse("").take(160))
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // free checkpoint blocks the query left behind — outside the
      // timed region; accumulation across 32 queries drags GC
      graft.plans.CheckpointHygiene.releaseAll(spark)
      (name, dt, err)
    }
    // 3-decimal seconds: with 70+ queries a full-precision Double per
    // entry pushed the one-line JSON past the driver's stdout tail
    // capture (BENCH_r04 recorded parsed:null). ~1ms resolution is
    // ample for per-query wall times; keep the line compact.
    def sec(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _) => s""""$k":${sec(v)}""" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s""""$k":"${esc(e)}"""" }
    val errsJson = if (errs.isEmpty) "" else s""","errors":${errs.mkString("{", ",", "}")}"""
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs$errsJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
