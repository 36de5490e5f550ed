package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-level timing probe for SetSimJoin.jaccardJoin — finds which
  * stage carries a scale soak's wall time. Dev tool; not part of the
  * query surface. Run:
  * SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt "runMain graft.SetsimProbe"
  */
object SetsimProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "256"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tauNum = 19; val tauDen = 20
    def tms[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val tok = tms("tok") {
      docs.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("word"))
        .distinct().localCheckpoint()
    }
    println("  tok rows: " + tok.count())
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("s"))
    val fr = tok.groupBy("word").agg(count(lit(1)).as("f"))
    val rk = tok.join(fr, "word")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("f"), col("word"))))
    val pf = tms("pf") {
      rk.join(sz, "doc_id")
        .filter(col("rn") <= col("s") - expr(s"($tauNum * s + ${tauDen - 1}) DIV $tauDen") + 1)
        .select(col("doc_id"), col("word"), col("rn"), col("s")).localCheckpoint()
    }
    println("  pf rows: " + pf.count())
    val pfIdx = pf.filter(col("rn") <=
      col("s") - expr(s"((2 * $tauNum) * s + ${tauNum + tauDen - 1}) DIV ${tauNum + tauDen}") + 1)
    val sa = col("a.s"); val sb = col("b.s")
    val pa = col("a.rn"); val pb = col("b.rn")
    val aId = col("a.doc_id"); val bId = col("b.doc_id")
    val alpha = expr(s"($tauNum * (a.s + b.s) + ${tauNum + tauDen - 1}) DIV ${tauNum + tauDen}")
    val ub = least(pa, pb) + least(sa - pa, sb - pb)
    val cand = tms("cand") {
      pf.as("a").join(pfIdx.as("b"),
          col("a.word") === col("b.word") &&
          (sb < sa || (sb === sa && bId < aId)) &&
          lit(tauNum) * sa <= lit(tauDen) * sb &&
          lit(tauNum) * sb <= lit(tauDen) * sa &&
          pa <= sa - alpha + 1 && pb <= sb - alpha + 1)
        .select(
          when(aId < bId, aId).otherwise(bId).as("da"),
          when(aId < bId, bId).otherwise(aId).as("db"),
          when(aId < bId, sa).otherwise(sb).as("sa"),
          when(aId < bId, sb).otherwise(sa).as("sb"),
          alpha.as("alpha"), ub.as("ub"))
        .groupBy("da", "db", "sa", "sb", "alpha")
        .agg(min(col("ub")).as("ub"))
        .filter(col("ub") >= col("alpha")).localCheckpoint()
    }
    println("  cand rows: " + cand.count())
    val sets = tms("sets") {
      tok.groupBy("doc_id").agg(sort_array(collect_list(col("word"))).as("ws")).localCheckpoint()
    }
    val out = tms("verify") {
      cand
        .join(sets.select(col("doc_id").as("da"), col("ws").as("wa")), "da")
        .join(sets.select(col("doc_id").as("db"), col("ws").as("wb")), "db")
        .withColumn("i", graft.functions.SortedIntersectCol(col("wa"), col("wb")))
        .filter(lit(tauDen + tauNum) * col("i") >= lit(tauNum) * (col("sa") + col("sb")))
        .count()
    }
    println("  result pairs: " + out)
    spark.stop()
  }
}
