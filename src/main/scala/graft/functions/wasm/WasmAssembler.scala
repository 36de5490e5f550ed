package graft.functions.wasm

import scala.collection.mutable.ArrayBuffer

/** Emitter for the WebAssembly binary format (spec §5) — builds small,
  * fully valid .wasm modules in-process. Exists because this build is
  * zero-egress (no toolchain to compile C/Rust to wasm), and the wasm
  * engine should be exercised against REAL binaries, not mocks: the
  * bytes these helpers emit go through the same [[WasmModule.decode]]
  * path any external module would.
  */
object WasmAssembler {
  final class FuncBuilder(val params: Int, val results: Int, val locals: Int) {
    private[wasm] val code = ArrayBuffer.empty[Byte]
    private def op(b: Int): this.type = { code += b.toByte; this }
    private def u(v: Int): this.type = { code ++= uleb(v); this }
    private def s(v: Int): this.type = { code ++= sleb(v); this }

    def i32Const(v: Int): this.type = op(0x41).s(v)
    def localGet(i: Int): this.type = op(0x20).u(i)
    def localSet(i: Int): this.type = op(0x21).u(i)
    def localTee(i: Int): this.type = op(0x22).u(i)
    def globalGet(i: Int): this.type = op(0x23).u(i)
    def globalSet(i: Int): this.type = op(0x24).u(i)
    def load(offset: Int = 0): this.type = op(0x28).u(2).u(offset)
    def load8u(offset: Int = 0): this.type = op(0x2d).u(0).u(offset)
    def store(offset: Int = 0): this.type = op(0x36).u(2).u(offset)
    def store8(offset: Int = 0): this.type = op(0x3a).u(0).u(offset)
    def memorySize: this.type = op(0x3f).op(0x00)
    def memoryGrow: this.type = op(0x40).op(0x00)
    def add: this.type = op(0x6a)
    def sub: this.type = op(0x6b)
    def mul: this.type = op(0x6c)
    def and: this.type = op(0x71)
    def or: this.type = op(0x72)
    def xor: this.type = op(0x73)
    def shl: this.type = op(0x74)
    def shrU: this.type = op(0x76)
    def eq: this.type = op(0x46)
    def ne: this.type = op(0x47)
    def eqz: this.type = op(0x45)
    def ltU: this.type = op(0x49)
    def geU: this.type = op(0x4f)
    def drop: this.type = op(0x1a)
    def select: this.type = op(0x1b)
    def call(f: Int): this.type = op(0x10).u(f)
    def ret: this.type = op(0x0f)
    def unreachable: this.type = op(0x00)
    def block: this.type = op(0x02).op(0x40)
    def loop: this.type = op(0x03).op(0x40)
    def ifVoid: this.type = op(0x04).op(0x40)
    def ifI32: this.type = op(0x04).op(0x7f) // typed if: arms yield one i32
    def els: this.type = op(0x05)
    def end: this.type = op(0x0b)
    def br(depth: Int): this.type = op(0x0c).u(depth)
    def brIf(depth: Int): this.type = op(0x0d).u(depth)
  }

  final case class GlobalSpec(mutable: Boolean, init: Int)

  /** Assemble a module: i32-only functions, one memory, globals,
    * exports (`name -> func index`; memory is always exported as
    * "memory" — the reference host requires it, lib.rs:40-42).
    */
  def module(funcs: Seq[FuncBuilder], memPages: Int, globals: Seq[GlobalSpec],
             exports: Map[String, Int], data: Seq[(Int, Array[Byte])] = Nil): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    out ++= Array[Byte](0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00) // magic + version

    // type section: one functype per function (dedup is an
    // optimization, not a correctness need)
    section(out, 1) { b =>
      b ++= uleb(funcs.length)
      funcs.foreach { f =>
        b += 0x60.toByte
        b ++= uleb(f.params); (0 until f.params).foreach(_ => b += 0x7f.toByte)
        b ++= uleb(f.results); (0 until f.results).foreach(_ => b += 0x7f.toByte)
      }
    }
    section(out, 3) { b => // function section
      b ++= uleb(funcs.length)
      funcs.indices.foreach(i => b ++= uleb(i))
    }
    section(out, 5) { b => // memory section (min only)
      b ++= uleb(1); b += 0x00.toByte; b ++= uleb(memPages)
    }
    if (globals.nonEmpty) section(out, 6) { b =>
      b ++= uleb(globals.length)
      globals.foreach { g =>
        b += 0x7f.toByte
        b += (if (g.mutable) 1 else 0).toByte
        b += 0x41.toByte; b ++= sleb(g.init); b += 0x0b.toByte
      }
    }
    section(out, 7) { b => // export section (funcs + memory)
      b ++= uleb(exports.size + 1)
      exports.foreach { case (name, idx) =>
        val nb = name.getBytes("UTF-8")
        b ++= uleb(nb.length); b ++= nb
        b += 0x00.toByte; b ++= uleb(idx)
      }
      val mb = "memory".getBytes("UTF-8")
      b ++= uleb(mb.length); b ++= mb
      b += 0x02.toByte; b ++= uleb(0)
    }
    section(out, 10) { b => // code section
      b ++= uleb(funcs.length)
      funcs.foreach { f =>
        val body = ArrayBuffer.empty[Byte]
        if (f.locals > 0) { body ++= uleb(1); body ++= uleb(f.locals); body += 0x7f.toByte }
        else body ++= uleb(0)
        body ++= f.code
        body += 0x0b.toByte // end
        b ++= uleb(body.length); b ++= body
      }
    }
    if (data.nonEmpty) section(out, 11) { b =>
      b ++= uleb(data.length)
      data.foreach { case (off, bytes) =>
        b ++= uleb(0)
        b += 0x41.toByte; b ++= sleb(off); b += 0x0b.toByte
        b ++= uleb(bytes.length); b ++= bytes
      }
    }
    out.toArray
  }

  private def section(out: ArrayBuffer[Byte], id: Int)(fill: ArrayBuffer[Byte] => Unit): Unit = {
    val b = ArrayBuffer.empty[Byte]
    fill(b)
    out += id.toByte
    out ++= uleb(b.length)
    out ++= b
  }

  private[wasm] def uleb(v0: Int): Seq[Byte] = {
    var v = v0
    val out = ArrayBuffer.empty[Byte]
    while ({
      val byte = v & 0x7f
      v = v >>> 7
      out += (if (v != 0) byte | 0x80 else byte).toByte
      v != 0
    }) ()
    out.toSeq
  }

  private[wasm] def sleb(v0: Int): Seq[Byte] = {
    var v = v0
    val out = ArrayBuffer.empty[Byte]
    var more = true
    while (more) {
      val byte = v & 0x7f
      v = v >> 7
      if ((v == 0 && (byte & 0x40) == 0) || (v == -1 && (byte & 0x40) != 0)) {
        out += byte.toByte; more = false
      } else out += (byte | 0x80).toByte
    }
    out.toSeq
  }
}
