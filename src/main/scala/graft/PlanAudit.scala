package graft
import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected queries — the
  * scale-audit surface (.explain) used to keep pushdown/broadcast/
  * codegen properties honest. Run: sbt "runMain graft.PlanAudit [q...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q5_region_revenue", "q1_pricing_summary", "q_replay_per_user", "q_topk_cosine")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    println("entry rows: " + SparkEntry.entry(spark).count())
    spark.stop()
  }
}
