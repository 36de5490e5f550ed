package graft
import graft.core.{EventGraph, IndepCase, SearArg, SearEngine, WorkCache}
import org.apache.spark.sql.SparkSession
import scala.collection.immutable.{SortedMap, SortedSet}

/** Scale probe for shelve/try_merge — the reference's headline feature,
  * O(n^2) in parallel branches BY DESIGN (README.md:5-6): merging n
  * independent branches re-shelves each event against a frontier that
  * grows to n, so total commutation tests grow ~n^2 while each ROUND of
  * tests fans out across executors (ShelveSpark.tester). This probe
  * runs the exact q_shelve_merge flow at a scaled branch count with an
  * instrumented tester, reporting the measured test count (the n^2
  * contract), the fan-out shape (rounds vs batch sizes — parallelism
  * held?), and wall time.
  * Run: sbt "runMain graft.ShelveProbe 480"
  */
object ShelveProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 48
    // 2nd arg: minBatch forwarded to the tester — Int.MaxValue forces
    // the sequential driver path (isolates engine cost from Spark
    // per-round job overhead)
    val minBatch = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var nRounds = 0L      // tester invocations (sequential by design)
    var nTests = 0L       // commutation tests total (~n^2)
    var nSparkRounds = 0L // rounds big enough to fan out as Spark jobs
    var maxBatch = 0
    val inner = graft.plans.ShelveSpark.tester(spark, SearEngine, minBatch = minBatch)
    val counting = (cmd: Int, arg: SearArg, cur: String, cases: Seq[IndepCase[SearArg, String]]) => {
      nRounds += 1; nTests += cases.length
      if (cases.length >= 2) nSparkRounds += 1
      if (cases.length > maxBatch) maxBatch = cases.length
      inner(cmd, arg, cur, cases)
    }
    var nBaseTasks = 0L
    val innerBases = graft.plans.ShelveSpark.baseBuilder(spark, SearEngine, minBatch = minBatch)
    val countingBases = (tasks: Seq[graft.core.BaseTask[SearArg, String]]) => {
      nBaseTasks += tasks.length
      innerBases(tasks)
    }
    // 3rd arg "nofuse" keeps the two-job (bases + tests) round shape
    val fuse = !(args.length > 2 && args(2) == "nofuse")
    // 4th arg: token length — pads every branch token to this many
    // chars, scaling |Dat| to k * tokenLen bytes (the wasm-engine
    // shape where fold cost and state bytes dominate; 2048 at k=480
    // gives an MB-scale datum)
    val tokenLen = if (args.length > 3) args(3).toInt else 4
    def tok(prefix: String, i: Int): String = {
      val t = f"$prefix$i%03d"
      if (tokenLen <= t.length) t else t + "x" * (tokenLen - t.length)
    }
    // serialized bytes of the round context each fused fan-out
    // broadcasts (order + chunked anchors + scalars; entries ride the
    // RDD) — the wire cost the sqrt(n) anchor stride bounds
    var bcastBytes = 0L
    var maxAnchors = 0
    def serializedSize(o: AnyRef): Long = {
      val counter = new java.io.OutputStream {
        var n = 0L
        override def write(b: Int): Unit = n += 1
        override def write(b: Array[Byte], off: Int, len: Int): Unit = n += len
      }
      val oos = new java.io.ObjectOutputStream(counter)
      oos.writeObject(o); oos.close()
      counter.n
    }
    val innerFused = graft.plans.ShelveSpark.fusedTester(spark, SearEngine, minBatch = minBatch)
    val countingFused = (round: graft.core.ShelveRound[SearArg, String]) => {
      nRounds += 1; nTests += round.entries.length
      if (round.entries.length >= 2) {
        nSparkRounds += 1
        bcastBytes += serializedSize(round.copy(entries = Vector.empty))
        if (round.anchors.length > maxAnchors) maxAnchors = round.anchors.length
      }
      if (round.entries.length > maxBatch) maxBatch = round.entries.length
      innerFused(round)
    }
    val base = (0 until k).map(i => tok("a", i)).mkString("|")
    val g = new EventGraph[SearArg](SearEngine)
    val w = new WorkCache[SearArg, String](SearEngine, base, Some(counting),
      Some(countingBases), if (fuse) Some(countingFused) else None)
    val t0 = System.nanoTime()
    var states = SortedSet.empty[String]
    (0 until k).foreach { i =>
      states += w.shelveEvent(g, SortedSet.empty[String], 0,
        SearArg(tok("a", i), tok("b", i))).get
    }
    val tShelve = System.nanoTime()
    w.tryMerge(g, states)
    val tMerge = System.nanoTime()
    val minimized = SortedSet.from(g.foldState(
      SortedMap.from(states.iterator.map(_ -> false)), expand = false).keysIterator)
    val (dat, tt) = w.materialize(g, minimized)
    val tEnd = System.nanoTime()
    require(tt.size == k && dat.contains(tok("b", 0)), "merge lost events")
    println(s"""{"k":$k,"token_len":$tokenLen,"datum_bytes":${base.length},""" +
      s""""shelve_sec":${(tShelve - t0) / 1e9},""" +
      s""""merge_sec":${(tMerge - tShelve) / 1e9},""" +
      s""""materialize_sec":${(tEnd - tMerge) / 1e9},""" +
      s""""n_rounds":$nRounds,"n_tests":$nTests,"n_spark_rounds":$nSparkRounds,""" +
      s""""max_batch":$maxBatch,"n_base_tasks":$nBaseTasks,""" +
      s""""bcast_bytes":$bcastBytes,"max_anchors":$maxAnchors,""" +
      s""""n_events":${g.events.size}}""")
    spark.stop()
  }
}
