package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operators vs hand-computed expectations on crafted frames:
  * the brute-decontamination size guard, IVF-PQ recall gating, 32-bit
  * z-order spread.
  */
class Round9OpsSpec extends AnyFunSuite with SharedSpark {

  test("semanticContamination refuses a bench side over the documented bound") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val bigBench = (100L to 104L).map(i => (i, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.semanticContamination(corpus, bigBench, threshold = 0.5,
        maxBenchRows = 4L)
    }
    assert(ex.getMessage.contains("semanticContaminationLsh"))
    // at the bound it still runs, and behavior is unchanged
    val ok = Similarity.semanticContamination(corpus, bigBench.limit(4),
      threshold = 0.5, maxBenchRows = 4L).collect()
    assert(ok.length == 1 && ok.head.getLong(0) == 1L)
  }
}
