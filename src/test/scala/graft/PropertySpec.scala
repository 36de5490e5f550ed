package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.collection.immutable.{SortedMap, SortedSet}

/** Property-based port of the reference fuzz target
  * (/root/reference/crates/example-sear/fuzz/fuzz_targets/sear0.rs:65-136):
  * random initial string + random sear sequence must satisfy
  * (1) replay equivalence: shelve one-by-one, compress to the frontier,
  *     replay == the plain sequential left fold, and the replayed set
  *     equals the shelved set (sear0.rs:69-122);
  * (2) merge totality: try_merge over the shelved set always succeeds
  *     (sear0.rs:124-135).
  *
  * Generators are driven manually with a fixed seed (the scalatest
  * bridge artifact isn't available offline), so failures are
  * reproducible.
  */
class SearPropertySpec extends AnyFunSuite {
  private val smallStr = Gen.chooseNum(0, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  private val nonEmptyStr = Gen.chooseNum(1, 4).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  private val searGen: Gen[(String, String)] = for {
    s <- nonEmptyStr
    r <- smallStr
  } yield (s, r)
  private val caseGen: Gen[(String, List[(String, String)])] = for {
    init <- Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    n <- Gen.chooseNum(1, 6)
    sears <- Gen.listOfN(n, searGen)
  } yield (init, sears)

  private def checkCase(init: String, sears: List[(String, String)]): Unit = {
    val expected = sears.foldLeft(init) { case (acc, (s, r)) => acc.replace(s, r) }
    val g = new EventGraph[SearArg](SearEngine)
    val w = new WorkCache[SearArg, String](SearEngine, init)
    var xs = SortedSet.empty[String]
    sears.foreach { case (s, r) =>
      w.shelveEvent(g, xs, 0, SearArg(s, r)).foreach(h => xs += h)
    }
    val minx = SortedSet.from(
      g.foldState(SortedMap.from(xs.iterator.map(_ -> false)), expand = false).keysIterator)
    val (got, tt) = w.runForeachRecursively(
      g, SortedMap.from(minx.iterator.map(_ -> (IncludeSpec.All: IncludeSpec))))
    assert(tt == xs, s"replayed set != shelved set for init=$init sears=$sears")
    assert(got == expected, s"replay != sequential fold for init=$init sears=$sears")
    // merge totality over the shelved set
    w.tryMerge(g, xs)
  }

  test("replay equivalence + merge totality, 300 random cases (sear0.rs:65-136)") {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var i = 0
    while (i < 300) {
      val (init, sears) = caseGen.pureApply(params, seed)
      withClue(s"case #$i init=$init sears=$sears: ") { checkCase(init, sears) }
      seed = seed.next
      i += 1
    }
  }
}
