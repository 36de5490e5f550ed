package graft

import graft.exvc.Highlight
import org.scalatest.funsuite.AnyFunSuite

/** Syntax-highlighted print (exvc main.rs:134-159 analog): extension
  * dispatch, token coloring, and the load-bearing property that
  * block-comment state carries across lines — including lines the
  * print did not select.
  */
class HighlightSpec extends AnyFunSuite {
  private val esc = ""
  private def strip(s: String): String = s.replaceAll("\\[[0-9;]*m", "")

  test("extension dispatch: known syntaxes highlight, unknown stay plain") {
    assert(Highlight.forPath("/tmp/session/foo.scala").isDefined)
    assert(Highlight.forPath("code.rs").isDefined)
    assert(Highlight.forPath("query.sql").isDefined)
    assert(Highlight.forPath("/tmp/session").isEmpty) // no extension
    assert(Highlight.forPath("notes.xyz").isEmpty) // unknown extension
    assert(Highlight.forPath(".bashrc").isEmpty) // dotfile, not an extension
  }

  test("keywords, strings, numbers, comments are colored; text round-trips") {
    val h = Highlight.forExtension("scala").get
    val line = """val n = 42 // the answer"""
    val out = h.line(line)
    assert(strip(out) == line) // coloring never alters the text
    assert(out.contains(s"$esc[38;5;141mval")) // keyword
    assert(out.contains(s"$esc[38;5;179m42")) // number
    assert(out.contains(s"$esc[38;5;245m// the answer")) // comment
    val s = Highlight.forExtension("scala").get.line("""x = "a // not comment"""")
    assert(strip(s) == """x = "a // not comment"""")
    assert(s.contains(s"$esc[38;5;114m")) // string color
    assert(!s.contains(s"$esc[38;5;245m")) // // inside string is not a comment
  }

  test("block-comment state carries across lines (the sync property)") {
    val h = Highlight.forExtension("rs").get
    assert(h.line("let x = 1; /* begin").contains(s"$esc[38;5;141mlet"))
    // the middle line is entirely comment-colored, even though it has
    // keyword-looking words — because the highlighter is mid-block
    val mid = h.line("let fake = keyword_soup")
    assert(mid.startsWith(s"$esc[38;5;245m"))
    assert(!mid.contains(s"$esc[38;5;141m"))
    // close the block: following code highlights normally again
    h.line("end */")
    val after = h.line("let y = 2;")
    assert(after.contains(s"$esc[38;5;141mlet"))
  }

  test("sql keywords match case-insensitively") {
    val h = Highlight.forExtension("sql").get
    val out = h.line("SELECT a FROM t -- trailing")
    assert(out.contains(s"$esc[38;5;141mSELECT"))
    assert(out.contains(s"$esc[38;5;141mFROM"))
    assert(out.contains(s"$esc[38;5;245m-- trailing"))
  }

  test("property: coloring never alters text for random inputs, any syntax") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '/', '*', '"', '\'', '\\', '#', '-', '.', '_', '(', ')'),
      1 -> Gen.oneOf('\t', '{', '}', ';', '=', '+'))
    val lineGen = Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, charGen))
    val docGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, lineGen))
    var seed = Seed(42L)
    Seq("scala", "rs", "py", "sql", "sh").foreach { ext =>
      (1 to 40).foreach { i =>
        val doc = docGen.pureApply(Gen.Parameters.default, seed)
        seed = seed.next
        val h = Highlight.forExtension(ext).get
        doc.foreach { l =>
          val out = h.line(l)
          assert(strip(out) == l, s"[$ext case $i] mangled: '$l' -> '${strip(out)}'")
        }
      }
    }
  }

  test("escaped quotes stay inside the string token") {
    val h = Highlight.forExtension("py").get
    val line = """s = "he said \"hi\" ok" + tail"""
    val out = h.line(line)
    assert(strip(out) == line)
    // `tail` after the string is plain, not string-colored
    assert(out.indexOf(s"$esc[38;5;114m") < out.indexOf("tail"))
    assert(out.substring(out.indexOf("tail")).startsWith("tail"))
  }
}
