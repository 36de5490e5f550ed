package graft.core

import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}

/** Literal search-and-replace argument — the reference's canonical demo
  * command, implemented three times there (test engine
  * /root/reference/crates/esvc-core/src/workcache.rs:500-511, fuzz engine
  * crates/example-sear/fuzz/fuzz_targets/sear0.rs:8-17, WASM module
  * wasm-crates/example-sear/src/lib.rs:4-11).
  */
final case class SearArg(search: String, replacement: String)

/** `Dat = String`, op = replace-all occurrences of a literal. */
object SearEngine extends Engine[SearArg, String] {
  override def runEvent(cmd: Int, arg: SearArg, dat: String): String = {
    require(cmd == 0, s"sear engine only has command 0, got $cmd")
    dat.replace(arg.search, arg.replacement)
  }

  override def encodeArg(arg: SearArg): Array[Byte] = {
    val s = arg.search.getBytes(StandardCharsets.UTF_8)
    val r = arg.replacement.getBytes(StandardCharsets.UTF_8)
    val buf = ByteBuffer.allocate(16 + s.length + r.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(s.length.toLong).put(s).putLong(r.length.toLong).put(r)
    buf.array()
  }

  override def decodeArg(bytes: Array[Byte]): SearArg = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def str(): String = {
      val n = buf.getLong.toInt
      val b = new Array[Byte](n)
      buf.get(b)
      new String(b, StandardCharsets.UTF_8)
    }
    SearArg(str(), str())
  }
}
