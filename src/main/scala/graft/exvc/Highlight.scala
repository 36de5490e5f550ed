package graft.exvc

/** Syntax-highlighted print for the exvc REPL — the analog of the
  * reference's syntect path (/root/reference/crates/exvc/src/main.rs:
  * 134-159): when the session file's extension names a known syntax,
  * print lines with ANSI colors; otherwise print plain. Like the
  * reference, the highlighter is STATEFUL across lines (block
  * comments span lines), and unselected spans must still be fed
  * through it so the state stays in sync (main.rs:147 comment).
  *
  * From-scratch scanner (no syntect here): per-line tokenization into
  * comments / strings / chars / numbers / keywords, with one carried
  * state bit (inside block comment). 256-color escapes; line numbers
  * in the reference's grey 240.
  */
object Highlight {
  private val Reset = "\u001b[0m"
  private val KwColor = "\u001b[38;5;141m" // violet
  private val StrColor = "\u001b[38;5;114m" // green
  private val NumColor = "\u001b[38;5;179m" // amber
  private val ComColor = "\u001b[38;5;245m" // grey
  val LineNumColor = "\u001b[38;5;240m"

  final case class Syntax(keywords: Set[String], lineComment: String,
                          blockOpen: String, blockClose: String,
                          stringDelims: Set[Char])

  private val cFamily = Set(
    "abstract", "break", "case", "catch", "class", "const", "continue", "def",
    "do", "else", "enum", "extends", "false", "final", "finally", "fn", "for",
    "if", "impl", "implicit", "import", "in", "lazy", "let", "loop", "match",
    "mut", "new", "null", "object", "override", "package", "private",
    "protected", "pub", "return", "sealed", "static", "struct", "super",
    "this", "throw", "trait", "true", "try", "type", "use", "val", "var",
    "while", "with", "yield")

  private val syntaxes: Map[String, Syntax] = Map(
    "scala" -> Syntax(cFamily, "//", "/*", "*/", Set('"', '\'')),
    "java" -> Syntax(cFamily, "//", "/*", "*/", Set('"', '\'')),
    "rs" -> Syntax(cFamily, "//", "/*", "*/", Set('"', '\'')),
    "py" -> Syntax(Set("and", "as", "assert", "break", "class", "continue",
      "def", "del", "elif", "else", "except", "False", "finally", "for",
      "from", "global", "if", "import", "in", "is", "lambda", "None", "not",
      "or", "pass", "raise", "return", "True", "try", "while", "with",
      "yield"), "#", "", "", Set('"', '\'')),
    "sh" -> Syntax(Set("case", "do", "done", "elif", "else", "esac", "fi",
      "for", "function", "if", "in", "then", "until", "while"), "#", "", "",
      Set('"', '\'')),
    "sql" -> Syntax(Set("select", "from", "where", "group", "by", "order",
      "join", "left", "right", "inner", "outer", "on", "as", "with", "union",
      "all", "distinct", "having", "limit", "insert", "into", "values",
      "update", "set", "delete", "create", "table", "and", "or", "not",
      "null", "case", "when", "then", "else", "end"), "--", "/*", "*/",
      Set('\'')))

  def forExtension(ext: String): Option[Highlighter] =
    syntaxes.get(ext.toLowerCase).map(new Highlighter(_))

  def forPath(path: String): Option[Highlighter] = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    if (dot <= 0) None else forExtension(name.substring(dot + 1))
  }

  final class Highlighter(syn: Syntax) {
    private var inBlock = false

    /** Highlight one line (call for EVERY line, selected or not — the
      * block-comment state advances either way).
      */
    def line(s: String): String = {
      val out = new StringBuilder(s.length + 16)
      var i = 0
      val n = s.length
      val sqlish = syn.keywords.contains("select")
      while (i < n) {
        if (inBlock) {
          val close = if (syn.blockClose.nonEmpty) s.indexOf(syn.blockClose, i) else -1
          if (close < 0) {
            out.append(ComColor).append(s.substring(i)).append(Reset)
            i = n
          } else {
            out.append(ComColor).append(s.substring(i, close + syn.blockClose.length)).append(Reset)
            i = close + syn.blockClose.length
            inBlock = false
          }
        } else if (syn.lineComment.nonEmpty && s.startsWith(syn.lineComment, i)) {
          out.append(ComColor).append(s.substring(i)).append(Reset)
          i = n
        } else if (syn.blockOpen.nonEmpty && s.startsWith(syn.blockOpen, i)) {
          inBlock = true // closed (possibly) by the branch above on the next pass
          out.append(ComColor).append(syn.blockOpen)
          i += syn.blockOpen.length
          out.append(Reset)
        } else {
          val c = s.charAt(i)
          if (syn.stringDelims.contains(c)) {
            val start = i
            i += 1
            var closed = false
            while (i < n && !closed) {
              if (s.charAt(i) == '\\' && i + 1 < n) i += 2
              else if (s.charAt(i) == c) { i += 1; closed = true }
              else i += 1
            }
            out.append(StrColor).append(s.substring(start, i)).append(Reset)
          } else if (c.isDigit) {
            val start = i
            while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '.' || s.charAt(i) == '_')) i += 1
            out.append(NumColor).append(s.substring(start, i)).append(Reset)
          } else if (c.isLetter || c == '_') {
            val start = i
            while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
            val word = s.substring(start, i)
            val hit = syn.keywords.contains(if (sqlish) word.toLowerCase else word)
            if (hit) out.append(KwColor).append(word).append(Reset)
            else out.append(word)
          } else {
            out.append(c)
            i += 1
          }
        }
      }
      out.result()
    }
  }
}
