package graft

import graft.operators.{Dimensions, QualityChecks}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-quality checks, gap filling and retention vs hand-computed
  * expectations on crafted frames.
  */
class QualitySpec extends AnyFunSuite with SharedSpark {

  test("uniqueCheck counts rows beyond the first per key") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "v")
    val out = QualityChecks.uniqueCheck(df, "u", Seq("k")).collect().head
    assert(out.getString(0) === "u" && out.getLong(1) === 2L)
    // clean key -> zero
    assert(QualityChecks.uniqueCheck(df, "u2", Seq("k", "v"))
      .collect().head.getLong(1) === 0L)
  }

  test("fkCheck counts orphans, ignores null fks") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = QualityChecks.fkCheck(child, "fk", parent, "pk", "fk").collect().head
    assert(out.getLong(1) === 1L) // only the 9
  }

  test("predicateCheck counts failures, null predicate counts as failure") {
    import spark.implicits._
    val df = Seq(Some(5.0), Some(60.0), None).toDF("x")
    val out = QualityChecks.predicateCheck(df, "rng", col("x").between(1.0, 50.0))
      .collect().head
    assert(out.getLong(1) === 2L) // 60 out of range, null unknown -> violation
    // empty input -> zero violations, not null
    assert(QualityChecks.predicateCheck(df.filter(lit(false)), "e", lit(true))
      .collect().head.getLong(1) === 0L)
  }

  test("gapFill densifies each key's bucket span") {
    import spark.implicits._
    val actual = Seq((1L, 10L, 5L), (1L, 13L, 2L), (2L, 7L, 1L))
      .toDF("k", "b", "n")
    val out = Dimensions.gapFill(actual, "k", "b")
      .select("k", "b", "n").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), Option(r.get(2)))).toMap
    assert(out.keySet === Set((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (2L, 7L)))
    assert(out((1L, 10L)) === Some(5L) && out((1L, 11L)) === None
      && out((1L, 13L)) === Some(2L))
  }

  test("retention counts users active k days after their cohort day") {
    import spark.implicits._
    // u1 first day 0, active days 0,1,3; u2 first day 1, active 1,3; u3 day 0 only
    val act = Seq((1L, 0L), (1L, 1L), (1L, 3L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 0L))
      .toDF("u", "day")
    val out = Dimensions.retention(act, "u", "day", horizon = 13)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, // u1, u3
      (0L, 1L) -> 1L, // u1
      (0L, 3L) -> 1L, // u1
      (1L, 0L) -> 1L, // u2
      (1L, 2L) -> 1L  // u2 on day 3 = offset 2
    ))
  }
}
