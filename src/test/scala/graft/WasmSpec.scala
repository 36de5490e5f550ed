package graft

import graft.core._
import graft.functions.wasm._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.{ArraySeq, SortedSet}

/** The sandboxed WASM UDF engine: decoder + interpreter + host ABI.
  * Mirrors the reference's wasmtime hosting path
  * (esvc-wasm/src/lib.rs:36-77) including the wasm-bindgen export
  * names and the retptr result protocol; the modules under test are
  * REAL binaries (assembled in-process, decoded through the same
  * binary-format path any external .wasm would take).
  */
class WasmSpec extends AnyFunSuite {
  private def bytes(s: String): ArraySeq[Byte] =
    ArraySeq.unsafeWrapArray(s.getBytes("UTF-8"))

  test("decoder round-trips an assembled module (sections, types, exports)") {
    val mod = WasmModule.decode(WasmModules.xorModule)
    assert(mod.funcs.length == 3)
    assert(mod.exports.keySet ==
      Set("__wbindgen_malloc", "__wbindgen_add_to_stack_pointer", "transform", "memory"))
    assert(mod.memMinPages == 1)
    assert(mod.globals.length == 2 && mod.globals.forall(_.mutable))
  }

  test("interpreter: arithmetic, branches, calls, select") {
    import WasmAssembler._
    // gcd(a, b), a,b > 0: subtract-while-unequal — loops, compares,
    // if/else, locals
    val gcd = new FuncBuilder(params = 2, results = 1, locals = 0)
    gcd
      .block
        .loop
          .localGet(0).localGet(1).eq.brIf(1) // a == b -> done
          .localGet(0).localGet(1).geU
          .ifVoid
            .localGet(0).localGet(1).sub.localSet(0)
          .els
            .localGet(1).localGet(0).sub.localSet(1)
          .end
          .br(0)
        .end
      .end
      .localGet(0)
    val wasm = module(Seq(gcd), memPages = 1, globals = Nil, exports = Map("gcd" -> 0))
    val inst = new WasmInstance(WasmModule.decode(wasm))
    assert(inst.invoke("gcd", 48, 36) == 12)
    assert(inst.invoke("gcd", 17, 5) == 1)
    assert(inst.invoke("gcd", 7, 7) == 7)
  }

  test("interpreter: memory grow, loads/stores, bounds traps, fuel cap") {
    import WasmAssembler._
    // touch(addr): grow memory until addr fits, store then load a byte
    val touch = new FuncBuilder(params = 1, results = 1, locals = 0)
    touch
      .block
        .loop
          .memorySize.i32Const(16).shl
          .localGet(0).i32Const(1).add.geU.brIf(1)
          .i32Const(1).memoryGrow.drop
          .br(0)
        .end
      .end
      .localGet(0).i32Const(0x5a).store8()
      .localGet(0).load8u()
    val spin = new FuncBuilder(params = 0, results = 0, locals = 0)
    spin.loop.br(0).end
    val wasm = module(Seq(touch, spin), memPages = 1, globals = Nil,
      exports = Map("touch" -> 0, "spin" -> 1))
    val mod = WasmModule.decode(wasm)

    val inst = new WasmInstance(mod, maxPages = 4)
    assert(inst.invoke("touch", 3 * 65536 + 5) == 0x5a) // grew to 4 pages
    assert(inst.memorySize == 4 * 65536)
    // beyond maxPages: grow returns -1 forever -> loop burns fuel -> trap
    val cramped = new WasmInstance(mod, maxPages = 2, fuel = 100_000)
    val t1 = intercept[WasmTrap](cramped.invoke("touch", 3 * 65536))
    assert(t1.msg.contains("fuel"))
    // a spinning module cannot hang the host
    val t2 = intercept[WasmTrap](new WasmInstance(mod, fuel = 10_000).invoke("spin"))
    assert(t2.msg.contains("fuel"))
    // raw OOB access traps
    val t3 = intercept[WasmTrap](new WasmInstance(mod, maxPages = 1).invoke("touch", 2 * 65536))
  }

  test("imports are rejected: the sandbox is closed") {
    // minimal module with an import section: magic+version, then
    // section 2 declaring one function import "e"."f"
    val withImport = Array[Byte](0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00,
      0x02, 0x07, 0x01, 0x01, 'e', 0x01, 'f', 0x00, 0x00)
    val t = intercept[WasmTrap](WasmModule.decode(withImport))
    assert(t.msg.contains("imports"))
  }

  test("wasm engine: xor module runs through the full wbindgen ABI") {
    val en = new WasmEngine
    val (first, count) = en.addCommands(Seq(WasmModules.xorModule))
    assert((first, count) == (0, 1))
    val key = ArraySeq[Byte](0x2a)
    val out = en.runEvent(0, key, bytes("hello"))
    assert(out.toArray.toSeq == "hello".getBytes("UTF-8").toSeq.map(b => (b ^ 0x2a).toByte))
    // xor is self-inverse: applying twice restores the input
    assert(en.runEvent(0, key, out) == bytes("hello"))
    // empty arg = key 0 = identity
    assert(en.runEvent(0, ArraySeq.empty[Byte], bytes("abc")) == bytes("abc"))
    intercept[EngineException](en.runEvent(5, key, bytes("x")))
  }

  test("wasm engine: payload larger than one page forces in-module memory.grow") {
    val en = new WasmEngine
    en.addCommands(Seq(WasmModules.xorModule))
    val big = ArraySeq.unsafeWrapArray(Array.tabulate[Byte](200 * 1024)(i => (i % 251).toByte))
    val out = en.runEvent(0, ArraySeq[Byte](0x11), big)
    assert(out.length == big.length)
    assert(out(12345) == (big(12345) ^ 0x11).toByte)
  }

  test("wasm engine: malformed arg traps in-module and surfaces as EngineException") {
    val en = new WasmEngine
    en.addCommands(Seq(WasmModules.byteSearModule))
    val e = intercept[EngineException](en.runEvent(0, ArraySeq[Byte](1), bytes("x")))
    assert(e.getMessage.contains("wasm trap"))
  }

  test("fuzz: interpreter matches the scala model on random payload/arg/command chains") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val en = new WasmEngine
    en.addCommands(Seq(WasmModules.byteSearModule, WasmModules.xorModule))
    def model(cmd: Int, arg: Array[Byte], dat: Array[Byte]): Array[Byte] = cmd match {
      case 0 => dat.map(b => if (b == arg(0)) arg(1) else b)
      case 1 => val k = if (arg.isEmpty) 0 else arg(0); dat.map(b => (b ^ k).toByte)
    }
    val caseGen = for {
      n <- Gen.chooseNum(0, 300)
      dat <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
      steps <- Gen.chooseNum(1, 6)
      cmds <- Gen.listOfN(steps, for {
        cmd <- Gen.oneOf(0, 1)
        a <- Gen.chooseNum(-128, 127).map(_.toByte)
        b <- Gen.chooseNum(-128, 127).map(_.toByte)
      } yield (cmd, Array(a, b)))
    } yield (dat.toArray, cmds)
    var seed = Seed(20260812L)
    (1 to 150).foreach { i =>
      val (dat0, cmds) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      var expected = dat0
      var got: ArraySeq[Byte] = ArraySeq.unsafeWrapArray(dat0)
      cmds.foreach { case (cmd, arg) =>
        expected = model(cmd, arg, expected)
        got = en.runEvent(cmd, ArraySeq.unsafeWrapArray(arg), got)
      }
      assert(got.toArray.toSeq == expected.toSeq, s"case $i diverged")
    }
  }

  test("full stack: shelve + merge through the WASM engine (byte-sear)") {
    val en = new WasmEngine
    val (first, _) = en.addCommands(Seq(WasmModules.byteSearModule, WasmModules.xorModule))
    assert(first == 0)
    val g = new EventGraph[ArraySeq[Byte]](en)
    val w = new WorkCache[ArraySeq[Byte], ArraySeq[Byte]](en, bytes("abcabc"))
    var xs = SortedSet.empty[String]
    xs += w.shelveEvent(g, xs, 0, WasmModules.arg2('a', 'x')).get
    xs += w.shelveEvent(g, xs, 0, WasmModules.arg2('b', 'y')).get
    w.tryMerge(g, xs)
    val (dat, _) = w.materialize(g, xs)
    assert(new String(dat.toArray, "UTF-8") == "xycxyc")
    // sequential composition on a fresh cache agrees (order b then a)
    val w2 = new WorkCache[ArraySeq[Byte], ArraySeq[Byte]](en, bytes("abcabc"))
    var ys = SortedSet.empty[String]
    ys += w2.shelveEvent(g, ys, 0, WasmModules.arg2('b', 'y')).get
    ys += w2.shelveEvent(g, ys, 0, WasmModules.arg2('a', 'x')).get
    val (dat2, _) = w2.materialize(g, ys)
    assert(new String(dat2.toArray, "UTF-8") == "xycxyc")
  }
}
