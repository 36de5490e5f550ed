package graft

import graft.operators.{Dimensions, Layout, TableStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 build, funnel progression, column stats and Z-order keys vs
  * hand-computed expectations on crafted frames.
  */
class WarehouseSpec extends AnyFunSuite with SharedSpark {

  test("scd2 builds validity intervals with an open current version") {
    import spark.implicits._
    val ch = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L), (2L, 5L, 50L))
      .toDF("k", "t", "v")
    val out = Dimensions.scd2(ch, "k", "t")
      .select("k", "version", "valid_from", "valid_to", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), Option(r.get(3)), r.getLong(4)))
      .toSet
    assert(out === Set(
      (1L, 1L, 10L, Some(20L), 100L),
      (1L, 2L, 20L, Some(30L), 200L),
      (1L, 3L, 30L, None, 300L),
      (2L, 1L, 5L, None, 50L)))
  }

  test("scd2 intervals tile the timeline: an asofJoin against the history " +
    "returns the version valid at each probe instant") {
    import spark.implicits._
    val ch = Seq((1L, 10L, 100L), (1L, 20L, 200L)).toDF("k", "t", "v")
    val hist = Dimensions.scd2(ch, "k", "t")
    val probes = Seq((1L, 9L, 900L), (1L, 10L, 901L), (1L, 15L, 902L), (1L, 25L, 903L))
      .toDF("k", "t", "pid")
    val got = graft.operators.Temporal.asofJoin(
      probes, hist.select(col("k"), col("valid_from").as("t"), col("v")),
      "k", "t", "v", "asof_v")
      .select("pid", "asof_v").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got(900L) === None)        // before first version
    assert(got(901L) === Some(100L))  // at version start
    assert(got(902L) === Some(100L))
    assert(got(903L) === Some(200L))
  }

  test("funnel advances only strictly after the previous stage") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes: view@10, click@20, purchase@30
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE the first view never counts; no purchase
      (2L, 10L, "click"), (2L, 15L, "view"), (2L, 18L, "click"),
      // user 3: click at the same instant as view is not "after"
      (3L, 10L, "view"), (3L, 10L, "click"),
      // user 4: never views -> absent from the funnel
      (4L, 5L, "purchase")
    ).toDF("k", "t", "et")
    val out = Dimensions.funnel(ev, "k", "t", "et", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0),
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) === ((Some(10L), Some(20L), Some(30L))))
    assert(out(2L) === ((Some(15L), Some(18L), None)))
    assert(out(3L) === ((Some(10L), None, None)))
    assert(!out.contains(4L))
  }

  test("columnStats computes n / nulls / ndv / min / max per column") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), 5.0), (Some(1.0), 6.0), (None, 7.0), (Some(3.0), 7.0)
    ).toDF("a", "b")
    val out = TableStats.columnStats(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(out("a") === ((4L, 1L, 2L, 1.0, 3.0)))
    assert(out("b") === ((4L, 0L, 3L, 5.0, 7.0)))
  }

  test("zvalue interleaves bits (known Morton codes) and orders quadrants") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L),
      (0xFFFFL, 0xFFFFL), (0x10000L, 0L)) // 17th bit masked off
    val out = pts.toDF("x", "y")
      .withColumn("z", Layout.zvalue(col("x"), col("y")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out((0L, 0L)) === 0L)
    assert(out((1L, 0L)) === 1L)
    assert(out((0L, 1L)) === 2L)
    assert(out((1L, 1L)) === 3L)
    assert(out((2L, 0L)) === 4L)
    assert(out((0xFFFFL, 0xFFFFL)) === 0xFFFFFFFFL)
    assert(out((0x10000L, 0L)) === 0L) // only low 16 bits participate
    // driver-side reference interleave agrees on random points
    val rnd = new scala.util.Random(7)
    val sample = Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = sample.toDF("x", "y").withColumn("z", Layout.zvalue(col("x"), col("y")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    sample.foreach { case (x, y) => assert(got((x, y)) === ref(x, y)) }
  }

  test("zOrderWrite round-trips rows and clusters the z-range per file") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(2000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = rows.toDF("x", "y")
    val path = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val back = Layout.zOrderWrite(df, "x", "y", path, partitions = 4)
    assert(back.count() === 2000L)
    // per-file z-ranges must be (nearly) disjoint: range-partitioning
    // by z means each file's [min,max] spans ~1/4 of the touched range
    val spans = back
      .withColumn("z", Layout.zvalue(col("x"), col("y")))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.length >= 2)
    spans.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, "file z-ranges overlap: range partitioning broken")
    }
  }
}
