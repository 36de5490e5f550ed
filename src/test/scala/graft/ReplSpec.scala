package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scripted in-JVM drive of the exvc REPL (no Spark needed for
  * sessions that never persist): append / print / substitute /
  * *state / merge-failure paths, asserting the printed protocol.
  */
class ReplSpec extends AnyFunSuite {
  private def run(script: String, args: Array[String] = Array.empty): String = {
    val in = new java.io.ByteArrayInputStream(script.getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(out, true, "UTF-8")
    // the REPL reads scala.io.Source.stdin (= System.in) and prints via
    // Console: redirect BOTH layers
    val (oldIn, oldOut) = (System.in, System.out)
    System.setIn(in); System.setOut(ps)
    try Console.withIn(in) { Console.withOut(ps) { ExvcRepl.main(args) } }
    finally { System.setIn(oldIn); System.setOut(oldOut) }
    new String(out.toByteArray, "UTF-8")
  }

  test("append, stable-numbered print, substitute, frontier listing") {
    val script =
      """0,a
        |alpha
        |beta
        |gamma
        |.
        |0,
        |1s
        |beta
        |BETA
        |1
        |*state
        |q
        |""".stripMargin
    val out = run(script)
    val lines = out.linesIterator.toVector
    // two shelved events
    assert(lines.count(_.startsWith("<< blake2b512:")) == 2)
    // full print: three numbered lines in order
    assert(lines.exists(_.matches("\\s*0\\| alpha")))
    assert(lines.exists(_.matches("\\s*1\\| beta")))
    assert(lines.exists(_.matches("\\s*2\\| gamma")))
    // selected-only print after substitute: line 1 shows the new text,
    // with its ORIGINAL line number (stable numbering)
    assert(lines.exists(_.matches("\\s*1\\| BETA")))
    assert(!lines.exists(_.matches("\\s*0\\| BETA")))
    // frontier: one antichain entry per chain head
    assert(lines.count(_.startsWith(">> blake2b512:")) >= 1)
  }

  test("no-op edits are rejected; bad addresses report, don't crash") {
    val script =
      """0,a
        |xyz
        |.
        |0s
        |nothere
        |replacement
        |,
        |q
        |""".stripMargin
    val out = run(script)
    assert(out.contains("!! no-op event, not recorded")) // pattern absent
    assert(out.contains("!! addr:")) // ',' is not an address
  }

  test("highlighted session colors print output when path has a known extension") {
    val script =
      """0,a
        |val x = 1
        |.
        |0,
        |q
        |""".stripMargin
    val out = run(script, Array("/tmp/never_persisted_session.scala"))
    assert(out.contains("\u001b[38;5;141mval")) // keyword colored
    assert(out.contains("\u001b[38;5;240m")) // grey line number
  }
}
