package graft.functions.wasm

import graft.core.{Engine, EngineException}

import scala.collection.immutable.ArraySeq
import scala.collection.mutable.ArrayBuffer
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.DurationInt

/** Sandboxed WASM UDF engine — the executable analog of the
  * reference's `WasmEngine`
  * (/root/reference/crates/esvc-wasm/src/lib.rs:16-108), with the
  * in-repo [[WasmInstance]] interpreter standing in for wasmtime
  * (zero-egress build: no external runtime to link).
  *
  * Faithful host-side protocol (lib.rs:36-77):
  *  - modules are decoded once at registration, in parallel
  *    (lib.rs:100-105 compiles with rayon; here `Future.traverse`);
  *  - every `runEvent` gets a FRESH instance — own memory, own
  *    globals — mirroring the fresh `Store` + `Instance` per call, so
  *    purity is enforced by construction, not convention;
  *  - the wasm-bindgen ABI is preserved: exports `memory`,
  *    `__wbindgen_add_to_stack_pointer`, `__wbindgen_malloc` and
  *    `transform(retptr, argptr, arglen, datptr, datlen)`, with the
  *    result read as an (ptr, len) i32 pair at retptr.
  *
  * `Bytes = ArraySeq[Byte]` for structural equality (collision checks),
  * same as [[graft.core.ExternalEngine]].
  */
final class WasmEngine extends Engine[ArraySeq[Byte], ArraySeq[Byte]] {
  type Bytes = ArraySeq[Byte]
  private val cmds = ArrayBuffer.empty[WasmModule]

  /** Register compiled modules; returns (firstId, count) like the
    * reference's `add_commands`.
    */
  def addCommands(wasms: Seq[Array[Byte]]): (Int, Int) = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val mods = Await.result(
      Future.traverse(wasms.toVector)(w => Future(WasmModule.decode(w))), 1.minute)
    synchronized {
      val first = cmds.length
      cmds ++= mods
      (first, mods.length)
    }
  }

  override def runEvent(cmd: Int, arg: Bytes, dat: Bytes): Bytes = {
    val mod = synchronized {
      if (cmd < 0 || cmd >= cmds.length)
        throw new EngineException(s"engine couldn't find command with ID $cmd")
      cmds(cmd)
    }
    try {
      val inst = new WasmInstance(mod) // fresh store per event
      val retptr = inst.invoke("__wbindgen_add_to_stack_pointer", -16)
      val argptr = inst.invoke("__wbindgen_malloc", arg.length)
      inst.writeBytes(argptr, arg.toArray)
      val datptr = inst.invoke("__wbindgen_malloc", dat.length)
      inst.writeBytes(datptr, dat.toArray)
      inst.invoke("transform", retptr, argptr, arg.length, datptr, dat.length)
      val pair = inst.readBytes(retptr, 8)
      def le32(o: Int) = (pair(o) & 0xff) | ((pair(o + 1) & 0xff) << 8) |
        ((pair(o + 2) & 0xff) << 16) | ((pair(o + 3) & 0xff) << 24)
      ArraySeq.unsafeWrapArray(inst.readBytes(le32(0), le32(4)))
    } catch {
      case WasmTrap(msg) => throw new EngineException(s"wasm trap in cmd $cmd: $msg")
    }
  }

  override def encodeArg(arg: Bytes): Array[Byte] = arg.toArray
  override def decodeArg(bytes: Array[Byte]): Bytes = ArraySeq.unsafeWrapArray(bytes.clone())
}

/** Example modules in the wasm-bindgen ABI, assembled in-process
  * (real binaries through the real decode path). The reference analog
  * is wasm-crates/example-sear.
  */
object WasmModules {
  import WasmAssembler._

  /** Module skeleton: func 0 = __wbindgen_malloc (bump allocator over
    * global 0, grows memory on demand), func 1 =
    * __wbindgen_add_to_stack_pointer (global 1), func 2 = transform.
    * Heap base and shadow stack start at 2048 (stack grows down).
    */
  private def abiModule(transform: FuncBuilder): Array[Byte] = {
    val malloc = new FuncBuilder(params = 1, results = 1, locals = 1)
    malloc
      .globalGet(0).localTee(1)
      .localGet(0).i32Const(3).add.i32Const(-4).and
      .add.globalSet(0)
      .block
        .loop
          .memorySize.i32Const(16).shl
          .globalGet(0).geU
          .brIf(1)
          .i32Const(1).memoryGrow.drop
          .br(0)
        .end
      .end
      .localGet(1)

    val stackPtr = new FuncBuilder(params = 1, results = 1, locals = 0)
    stackPtr
      .globalGet(1).localGet(0).add.globalSet(1)
      .globalGet(1)

    module(
      funcs = Seq(malloc, stackPtr, transform),
      memPages = 1,
      globals = Seq(GlobalSpec(mutable = true, init = 2048), GlobalSpec(mutable = true, init = 2048)),
      exports = Map(
        "__wbindgen_malloc" -> 0,
        "__wbindgen_add_to_stack_pointer" -> 1,
        "transform" -> 2))
  }

  /** transform: out[i] = dat[i] XOR arg[0] (arg may be empty -> key 0).
    * Self-inverse, so revert shows up in shelve's commutation tests.
    */
  def xorModule: Array[Byte] = {
    // params: 0 retptr, 1 argptr, 2 arglen, 3 datptr, 4 datlen
    // locals: 5 i, 6 out, 7 key
    val t = new FuncBuilder(params = 5, results = 0, locals = 3)
    t
      .localGet(4).call(0).localSet(6) // out = malloc(datlen)
      .localGet(2).eqz
      .ifVoid
        .i32Const(0).localSet(7)
      .els
        .localGet(1).load8u().localSet(7)
      .end
      .block
        .loop
          .localGet(5).localGet(4).geU.brIf(1) // i >= datlen -> done
          .localGet(6).localGet(5).add // &out[i]
          .localGet(3).localGet(5).add.load8u() // dat[i]
          .localGet(7).xor
          .store8()
          .localGet(5).i32Const(1).add.localSet(5)
          .br(0)
        .end
      .end
      .localGet(0).localGet(6).store() // *retptr = out
      .localGet(0).localGet(4).store(4) // *(retptr+4) = len
    abiModule(t)
  }

  /** transform: byte-sear — every dat byte equal to arg[0] becomes
    * arg[1] (arg must be 2 bytes). The wasm flavor of example-sear.
    */
  def byteSearModule: Array[Byte] = {
    // params as above; locals: 5 i, 6 out, 7 from, 8 to, 9 v
    val t = new FuncBuilder(params = 5, results = 0, locals = 5)
    t
      .localGet(2).i32Const(2).ltU
      .ifVoid
        .unreachable // malformed arg -> trap (host surfaces EngineException)
      .end
      .localGet(4).call(0).localSet(6)
      .localGet(1).load8u().localSet(7)
      .localGet(1).load8u(1).localSet(8)
      .block
        .loop
          .localGet(5).localGet(4).geU.brIf(1)
          .localGet(3).localGet(5).add.load8u().localSet(9)
          .localGet(6).localGet(5).add // &out[i]
          .localGet(8).localGet(9) // a = to, b = v
          .localGet(9).localGet(7).eq // c = (v == from)
          .select
          .store8()
          .localGet(5).i32Const(1).add.localSet(5)
          .br(0)
        .end
      .end
      .localGet(0).localGet(6).store()
      .localGet(0).localGet(4).store(4)
    abiModule(t)
  }

  def arg2(from: Byte, to: Byte): ArraySeq[Byte] = ArraySeq(from, to)
}
