package graft.exvc

/** `ed`-style addresses and their parser — the reference's only
  * filter/selection surface (/root/reference/crates/exvc/src/addr.rs:6-11,
  * 47-97). `'` is the escape char inside `/regex/` ('n -> newline,
  * 't -> tab, anything else literal).
  */
sealed trait Address
object Address {
  final case class Rgx(pat: String) extends Address
  final case class Rng(start: Int, end: Int) extends Address // [start, end)
  final case class RngF(start: Int) extends Address // [start, ...)
  case object Last extends Address

  private def parseLnum(s: String): Option[(Int, String)] = {
    val n = s.takeWhile(_.isDigit)
    if (n.isEmpty) None else Some((n.toInt, s.substring(n.length)))
  }

  /** Parse one address off the front of `s`; returns the address and the
    * unconsumed rest. Mirrors `parse_address` (addr.rs:47-97).
    */
  def parse(s: String): Either[String, (Address, String)] =
    if (s.startsWith("$")) Right((Last, s.substring(1)))
    else if (s.startsWith("/")) {
      val body = s.substring(1)
      val pat = new StringBuilder
      var i = 0
      var escaped = false
      var closed = false
      while (!closed && i < body.length) {
        val c = body.charAt(i)
        if (escaped) {
          pat += (c match {
            case '\'' | '/' => c
            case 'n' => '\n'
            case 't' => '\t'
            case other => other
          })
          escaped = false
        } else if (c == '\'') escaped = true
        else if (c == '/') closed = true
        else pat += c
        i += 1
      }
      if (escaped) Left("regex: escaped EOL")
      else Right((Rgx(pat.result()), body.substring(i)))
    } else {
      parseLnum(s) match {
        case None => Left(s"addr: unable to parse address at '$s'")
        case Some((start, rest)) =>
          if (rest.startsWith(",")) {
            parseLnum(rest.substring(1)) match {
              case Some((end, rest2)) =>
                if (start < end) Right((Rng(start, end), rest2))
                else Left(s"addr: unable to parse range $start,$end")
              case None => Right((RngF(start), rest.substring(1)))
            }
          } else Right((Rng(start, start + 1), rest))
      }
    }
}
