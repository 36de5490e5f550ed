package graft.core

import scala.collection.immutable.ArraySeq

/** The external-UDF engine registry — the reference's WASM engine
  * *contract* (/root/reference/crates/esvc-wasm/src/lib.rs:16-108):
  * commands are byte-opaque transforms `(arg: bytes, dat: bytes) ->
  * bytes`, registered in id ranges via [[addCommands]] (mirrors
  * `add_commands`' `(first_id, count)` return, lib.rs:92-108), schema
  * erased to bytes so the module decides (`Arg = Dat = Vec<u8>`,
  * lib.rs:11-15).
  *
  * The wasmtime hosting itself is out of scope (no sandbox runtime in
  * this build — SURVEY §2 OP-20 scopes the *registry contract* as the
  * requirement); a production build would compile WASM modules to these
  * closures at registration, like the reference compiles modules in
  * parallel (lib.rs:100-105). Purity remains the caller's contract, as
  * with the reference's fresh Store/Instance per call.
  *
  * `Bytes = ArraySeq[Byte]` so event payload equality (ensure_event's
  * collision check) is structural.
  */
final class ExternalEngine extends Engine[ArraySeq[Byte], ArraySeq[Byte]] {
  type Bytes = ArraySeq[Byte]
  private val modules = scala.collection.mutable.ArrayBuffer.empty[(Bytes, Bytes) => Bytes]

  /** Register a batch of modules; returns (firstId, count). */
  def addCommands(ms: Seq[(Bytes, Bytes) => Bytes]): (Int, Int) = synchronized {
    val first = modules.length
    modules ++= ms
    (first, ms.length)
  }

  override def runEvent(cmd: Int, arg: Bytes, dat: Bytes): Bytes = {
    if (cmd < 0 || cmd >= modules.length)
      throw new EngineException(s"engine couldn't find command with ID $cmd")
    modules(cmd)(arg, dat)
  }

  override def encodeArg(arg: Bytes): Array[Byte] = arg.toArray
  override def decodeArg(bytes: Array[Byte]): Bytes = ArraySeq.unsafeWrapArray(bytes.clone())
}

object ExternalEngine {
  import java.nio.charset.StandardCharsets.UTF_8

  /** The canonical example module — sear as a byte transform, arg =
    * `search NUL replacement` (the reference's module parses a JSON arg,
    * wasm-crates/example-sear/src/lib.rs:4-11; the framing is the
    * module's own business either way).
    */
  val searModule: (ArraySeq[Byte], ArraySeq[Byte]) => ArraySeq[Byte] = { (arg, dat) =>
    val s = new String(arg.toArray, UTF_8)
    val i = s.indexOf('\u0000')
    require(i >= 0, "sear arg must be 'search NUL replacement'")
    val out = new String(dat.toArray, UTF_8).replace(s.substring(0, i), s.substring(i + 1))
    ArraySeq.unsafeWrapArray(out.getBytes(UTF_8))
  }

  def searArg(search: String, replacement: String): ArraySeq[Byte] =
    ArraySeq.unsafeWrapArray((search + "\u0000" + replacement).getBytes(UTF_8))

  def bytes(s: String): ArraySeq[Byte] = ArraySeq.unsafeWrapArray(s.getBytes(UTF_8))
}
