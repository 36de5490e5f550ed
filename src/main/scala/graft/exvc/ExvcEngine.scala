package graft.exvc

import graft.core.{Engine, EngineException}
import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.ConcurrentHashMap
import java.util.regex.{Pattern, PatternSyntaxException}

/** Edit commands — reference `CommandKind`
  * (/root/reference/crates/exvc/src/en.rs:13-21).
  */
sealed trait CommandKind
object CommandKind {
  final case class Append(lines: Vector[String]) extends CommandKind
  final case class Change(lines: Vector[String]) extends CommandKind
  case object Delete extends CommandKind
  final case class Insert(lines: Vector[String]) extends CommandKind
  final case class Substitute(pat: String, repl: String) extends CommandKind
}

/** A full edit command: address + kind (en.rs:46-60). */
final case class Command(addr: Address, kind: CommandKind)

/** Input command letters, after the address (en.rs:73-103). A bare
  * address means print.
  */
sealed trait InpCommandKind
object InpCommandKind {
  case object Print extends InpCommandKind
  case object Append extends InpCommandKind
  case object Change extends InpCommandKind
  case object Delete extends InpCommandKind
  case object Insert extends InpCommandKind
  case object Substitute extends InpCommandKind

  /** Mirrors `parse_command` (en.rs:84-103). */
  def parse(s: String): Either[String, (Address, InpCommandKind)] =
    Address.parse(s).flatMap { case (addr, rest) =>
      rest.headOption match {
        case None => Right((addr, Print))
        case Some('a') => Right((addr, Append))
        case Some('c') => Right((addr, Change))
        case Some('d') => Right((addr, Delete))
        case Some('i') => Right((addr, Insert))
        case Some('s') => Right((addr, Substitute))
        case Some(x) => Left(s"unknown command '$x'")
      }
    }
}

/** The `ex`/`ed`-like line-editor engine over `Dat = Vector[String]` —
  * the reference's user-facing UDF surface
  * (/root/reference/crates/exvc/src/en.rs:105-258). The DataFrame/Column
  * flavor of the same commands (higher-order array functions, codegen'd)
  * lives in [[graft.operators.ExvcColumns]].
  */
object ExvcEngine extends Engine[Command, Vector[String]] {
  // process-wide compiled-regex cache, mirroring the reference's
  // Mutex<HashMap<pat, Regex>> (en.rs:8-10, 177-182)
  private val rgxCache = new ConcurrentHashMap[String, Pattern]()

  private def compiled(pat: String): Pattern =
    try rgxCache.computeIfAbsent(pat, p => Pattern.compile(p))
    catch { case e: PatternSyntaxException => throw new EngineException(s"bad regex '$pat': ${e.getMessage}") }

  /** Partition `dat` into (segment, selected) spans. Mirrors
    * `resolve_addr` (en.rs:105-156), incl. the empty-data rule: only
    * `0,` and `$` select on empty input (initial insert).
    */
  def resolveAddr(dat: Vector[String], addr: Address): Vector[(Vector[String], Boolean)] = {
    import Address._
    if (dat.isEmpty) {
      addr match {
        case RngF(0) | Last => Vector((Vector.empty, true))
        case _ => Vector.empty
      }
    } else addr match {
      case Rng(start, end) =>
        if (start >= dat.length || start >= end) Vector((dat, false))
        else if (end >= dat.length) Vector((dat.take(start), false), (dat.drop(start), true))
        else Vector((dat.take(start), false), (dat.slice(start, end), true), (dat.drop(end), false))
      case RngF(start) =>
        if (start < dat.length) Vector((dat.take(start), false), (dat.drop(start), true))
        else if (start == dat.length) Vector((dat, false), (Vector.empty, true))
        else Vector((dat, false))
      case Rgx(pat) =>
        val re = compiled(pat)
        dat.map(line => (Vector(line), re.matcher(line).find()))
      case Last =>
        Vector((dat.init, false), (Vector(dat.last), true))
    }
  }

  /** Apply one command kind to a selected span. Mirrors `run_command`
    * (en.rs:158-188).
    */
  def runCommand(kind: CommandKind, dat: Vector[String]): Vector[String] = {
    import CommandKind._
    kind match {
      case Append(a) => dat ++ a
      case Insert(a) => a ++ dat
      case Change(c) => c
      case Delete => Vector.empty
      case Substitute(pat, repl) =>
        val re = compiled(pat)
        dat.map(line => re.matcher(line).replaceAll(repl))
    }
  }

  /** `run_event_bare` (en.rs:220-257): resolve the address, apply the
    * command to selected spans, re-flatten.
    */
  override def runEvent(cmd: Int, arg: Command, dat: Vector[String]): Vector[String] = {
    require(cmd == 0, s"exvc engine only has command 0, got $cmd")
    resolveAddr(dat, arg.addr).flatMap { case (span, selected) =>
      if (selected) runCommand(arg.kind, span) else span
    }
  }

  /** Canonical bytes of a Command for content-addressing; deterministic
    * layout (tag bytes + length-prefixed strings), same stability contract
    * as [[Hashes.canonicalEncode]].
    */
  override def encodeArg(arg: Command): Array[Byte] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def str(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      val lb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(b.length.toLong).array()
      parts += lb += b
    }
    def lines(tag: Byte, ls: Vector[String]): Unit = {
      parts += Array(tag)
      val lb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(ls.length.toLong).array()
      parts += lb
      ls.foreach(str)
    }
    import Address._
    arg.addr match {
      case Rgx(p) => parts += Array(0.toByte); str(p)
      case Rng(s, e) =>
        parts += Array(1.toByte)
        parts += ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN).putLong(s.toLong).putLong(e.toLong).array()
      case RngF(s) =>
        parts += Array(2.toByte)
        parts += ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(s.toLong).array()
      case Last => parts += Array(3.toByte)
    }
    import CommandKind._
    arg.kind match {
      case Append(ls) => lines(10.toByte, ls)
      case Change(ls) => lines(11.toByte, ls)
      case Delete => parts += Array(12.toByte)
      case Insert(ls) => lines(13.toByte, ls)
      case Substitute(p, r) => parts += Array(14.toByte); str(p); str(r)
    }
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p => System.arraycopy(p, 0, out, off, p.length); off += p.length }
    out
  }

  override def decodeArg(bytes: Array[Byte]): Command = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def str(): String = {
      val n = buf.getLong.toInt
      val b = new Array[Byte](n)
      buf.get(b)
      new String(b, StandardCharsets.UTF_8)
    }
    def lines(): Vector[String] = Vector.fill(buf.getLong.toInt)(str())
    import Address._
    val addr = buf.get() match {
      case 0 => Rgx(str())
      case 1 => Rng(buf.getLong.toInt, buf.getLong.toInt)
      case 2 => RngF(buf.getLong.toInt)
      case 3 => Last
      case t => throw new EngineException(s"bad address tag $t")
    }
    import CommandKind._
    val kind = buf.get() match {
      case 10 => Append(lines())
      case 11 => Change(lines())
      case 12 => Delete
      case 13 => Insert(lines())
      case 14 => Substitute(str(), str())
      case t => throw new EngineException(s"bad command tag $t")
    }
    Command(addr, kind)
  }
}
