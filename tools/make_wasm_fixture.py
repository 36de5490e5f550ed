#!/usr/bin/env python3
"""Hand-assembles the checked-in .wasm test fixtures (no external deps).

Emits src/test/resources/graft/wasm/{sear_bindgen.wasm,probe.wasm}.

`sear_bindgen.wasm` is shaped like rustc/wasm-bindgen output for the
reference's example-sear module (/root/reference/wasm-crates/example-sear):
a shadow-stack-pointer global, a growing bump allocator, the wbindgen
export surface (`memory`, `__wbindgen_malloc`, `__wbindgen_free`,
`__wbindgen_add_to_stack_pointer`, `transform`) with the retptr result
protocol, a funcref table dispatched through `call_indirect`, a
`br_table` mode switch, and bulk-memory `memory.copy`/`memory.fill` —
i.e. the opcode surface rustc emits, which the in-repo WasmAssembler
deliberately cannot produce. The binary is committed so the test run
does not depend on python; re-run this script only to regenerate.

transform arg protocol (mode byte first):
  [0]                                  -> identity copy
  [1][slen:u16le][rlen:u16le][s][r]    -> replace every occurrence of s by r
  [2][slen:u16le][s]                   -> redact: overwrite occurrences with '*'
  [3][delta:i8]                        -> add delta to every byte (wrapping)
  anything else                        -> trap (unreachable)

`probe.wasm` unit-probes the remaining non-assembler opcodes
(extend8_s/extend16_s, load16_s/u, store16, br_table default/negative
selector, call_indirect null-entry and type-mismatch traps).
"""
import os

OUT_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "graft", "wasm")


def uleb(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def sleb(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        done = (v == 0 and not (b & 0x40)) or (v == -1 and (b & 0x40))
        out.append(b if done else b | 0x80)
        if done:
            return bytes(out)


class Asm:
    """Flat byte emitter for one function body."""

    def __init__(self):
        self.b = bytearray()

    def op(self, *bs):
        self.b.extend(bs)
        return self

    def u(self, v):
        self.b.extend(uleb(v))
        return self

    def s(self, v):
        self.b.extend(sleb(v))
        return self

    # control
    def block(self): return self.op(0x02, 0x40)
    def loop(self): return self.op(0x03, 0x40)
    def if_(self): return self.op(0x04, 0x40)
    def else_(self): return self.op(0x05)
    def end(self): return self.op(0x0B)
    def br(self, d): return self.op(0x0C).u(d)
    def br_if(self, d): return self.op(0x0D).u(d)

    def br_table(self, targets, default):
        self.op(0x0E).u(len(targets))
        for t in targets:
            self.u(t)
        return self.u(default)

    def ret(self): return self.op(0x0F)
    def call(self, f): return self.op(0x10).u(f)
    def call_indirect(self, ti): return self.op(0x11).u(ti).u(0)
    def unreachable(self): return self.op(0x00)
    def drop(self): return self.op(0x1A)
    def select(self): return self.op(0x1B)

    # variables
    def lget(self, i): return self.op(0x20).u(i)
    def lset(self, i): return self.op(0x21).u(i)
    def ltee(self, i): return self.op(0x22).u(i)
    def gget(self, i): return self.op(0x23).u(i)
    def gset(self, i): return self.op(0x24).u(i)

    # memory (align then offset)
    def load(self, off=0): return self.op(0x28).u(2).u(off)
    def load8u(self, off=0): return self.op(0x2D).u(0).u(off)
    def load16s(self, off=0): return self.op(0x2E).u(1).u(off)
    def load16u(self, off=0): return self.op(0x2F).u(1).u(off)
    def store(self, off=0): return self.op(0x36).u(2).u(off)
    def store8(self, off=0): return self.op(0x3A).u(0).u(off)
    def store16(self, off=0): return self.op(0x3B).u(1).u(off)
    def memsize(self): return self.op(0x3F, 0x00)
    def memgrow(self): return self.op(0x40, 0x00)
    def memcopy(self): return self.op(0xFC).u(10).op(0x00, 0x00)
    def memfill(self): return self.op(0xFC).u(11).op(0x00)

    # numeric
    def i32(self, v): return self.op(0x41).s(v)
    def eqz(self): return self.op(0x45)
    def eq(self): return self.op(0x46)
    def ne(self): return self.op(0x47)
    def lt_u(self): return self.op(0x49)
    def gt_u(self): return self.op(0x4B)
    def ge_u(self): return self.op(0x4F)
    def add(self): return self.op(0x6A)
    def sub(self): return self.op(0x6B)
    def mul(self): return self.op(0x6C)
    def and_(self): return self.op(0x71)
    def shl(self): return self.op(0x74)
    def extend8_s(self): return self.op(0xC0)
    def extend16_s(self): return self.op(0xC1)


def section(sid, payload):
    return bytes([sid]) + uleb(len(payload)) + payload


def functype(params, results):
    return (bytes([0x60]) + uleb(params) + b"\x7f" * params +
            uleb(results) + b"\x7f" * results)


def module(types, func_types, funcs, table_size=0, elems=(), mem_pages=1,
           globals_=(), exports=(), data=()):
    """funcs: list of (n_locals, Asm); exports: (name, kind, idx) with
    kind 0=func 2=memory; elems: (offset, [func idx]); globals_:
    (mutable, init); data: (offset, bytes)."""
    out = bytearray(b"\x00asm\x01\x00\x00\x00")
    out += section(1, uleb(len(types)) + b"".join(functype(p, r) for p, r in types))
    out += section(3, uleb(len(func_types)) + b"".join(uleb(t) for t in func_types))
    if table_size:
        out += section(4, uleb(1) + b"\x70\x00" + uleb(table_size))
    out += section(5, uleb(1) + b"\x00" + uleb(mem_pages))
    if globals_:
        g = uleb(len(globals_))
        for mut, init in globals_:
            g += b"\x7f" + bytes([1 if mut else 0]) + b"\x41" + sleb(init) + b"\x0b"
        out += section(6, g)
    e = uleb(len(exports))
    for name, kind, idx in exports:
        nb = name.encode()
        e += uleb(len(nb)) + nb + bytes([kind]) + uleb(idx)
    out += section(7, e)
    if elems:
        el = uleb(len(elems))
        for off, fidx in elems:
            el += uleb(0) + b"\x41" + sleb(off) + b"\x0b" + uleb(len(fidx))
            el += b"".join(uleb(f) for f in fidx)
        out += section(9, el)
    c = uleb(len(funcs))
    for n_locals, asm in funcs:
        body = (uleb(1) + uleb(n_locals) + b"\x7f" if n_locals else uleb(0))
        body += bytes(asm.b) + b"\x0b"
        c += uleb(len(body)) + body
    out += section(10, c)
    if data:
        d = uleb(len(data))
        for off, bs in data:
            d += uleb(0) + b"\x41" + sleb(off) + b"\x0b" + uleb(len(bs)) + bs
        out += section(11, d)
    return bytes(out)


def sear_bindgen():
    # types: t0 (i32)->i32, t1 (i32,i32)->(), t2 match_at, t3 transform
    types = [(1, 1), (2, 0), (5, 1), (5, 0)]

    # f0 __wbindgen_malloc: bump allocator over global 1, aligned 4,
    # grows memory until the heap fits (the shape rustc's dlmalloc
    # collapses to for the small-alloc path).
    malloc = Asm()
    (malloc.gget(1).ltee(1)
     .lget(0).i32(3).add().i32(-4).and_()
     .add().gset(1)
     .block().loop()
     .memsize().i32(16).shl().gget(1).ge_u().br_if(1)
     .i32(1).memgrow().drop().br(0)
     .end().end()
     .lget(1))

    # f1 __wbindgen_add_to_stack_pointer over global 0 (shadow stack)
    addsp = Asm()
    addsp.gget(0).lget(0).add().gset(0).gget(0)

    # f2 __wbindgen_free: no-op for a bump allocator (exported because
    # wbindgen always exports it; the reference host never calls it)
    free = Asm()

    # f3 match_at(datptr, datlen, i, sptr, slen) -> 1 if dat[i..i+slen)==s
    # local 5 = j
    m = Asm()
    (m.lget(2).lget(4).add().lget(1).gt_u()
     .if_().i32(0).ret().end()
     .block().loop()
     .lget(5).lget(4).ge_u().br_if(1)
     .lget(0).lget(2).add().lget(5).add().load8u()
     .lget(3).lget(5).add().load8u()
     .ne()
     .if_().i32(0).ret().end()
     .lget(5).i32(1).add().lset(5)
     .br(0)
     .end().end()
     .i32(1))

    # f4 transform(retptr, argptr, arglen, datptr, datlen)
    # locals: 5 mode/delta, 6 slen, 7 rlen, 8 sptr, 9 rptr, 10 out,
    #         11 i, 12 o, 13 cnt
    t = Asm()
    t.lget(2).eqz().if_().unreachable().end()
    t.lget(1).load8u().lset(5)
    t.block().block().block().block().block()
    t.lget(5).br_table([0, 1, 2, 3], 4)
    t.end()
    # ---- mode 0: identity ----
    (t.lget(4).call(0).lset(10)
     .lget(10).lget(3).lget(4).memcopy()
     .lget(0).lget(10).store()
     .lget(0).lget(4).store(4)
     .ret())
    t.end()
    # ---- mode 1: sear ----
    (t.lget(1).load16u(1).lset(6)
     .lget(1).load16u(3).lset(7)
     .lget(1).i32(5).add().lset(8)
     .lget(8).lget(6).add().lset(9)
     .lget(6).eqz().if_().unreachable().end())
    # pass 1: count matches (call_indirect through table entry 1)
    (t.block().loop()
     .lget(11).lget(4).ge_u().br_if(1)
     .lget(3).lget(4).lget(11).lget(8).lget(6)
     .i32(1).call_indirect(2)
     .if_()
     .lget(13).i32(1).add().lset(13)
     .lget(11).lget(6).add().lset(11)
     .else_()
     .lget(11).i32(1).add().lset(11)
     .end()
     .br(0)
     .end().end())
    # out = malloc(datlen + cnt*rlen - cnt*slen)
    (t.lget(4).lget(13).lget(7).mul().add()
     .lget(13).lget(6).mul().sub()
     .call(0).lset(10))
    # pass 2: emit
    t.i32(0).lset(11)
    (t.block().loop()
     .lget(11).lget(4).ge_u().br_if(1)
     .lget(3).lget(4).lget(11).lget(8).lget(6)
     .i32(1).call_indirect(2)
     .if_()
     .lget(10).lget(12).add().lget(9).lget(7).memcopy()
     .lget(12).lget(7).add().lset(12)
     .lget(11).lget(6).add().lset(11)
     .else_()
     .lget(10).lget(12).add()
     .lget(3).lget(11).add().load8u()
     .store8()
     .lget(12).i32(1).add().lset(12)
     .lget(11).i32(1).add().lset(11)
     .end()
     .br(0)
     .end().end())
    (t.lget(0).lget(10).store()
     .lget(0).lget(12).store(4)
     .ret())
    t.end()
    # ---- mode 2: redact ----
    (t.lget(1).load16u(1).lset(6)
     .lget(1).i32(3).add().lset(8)
     .lget(6).eqz().if_().unreachable().end()
     .lget(4).call(0).lset(10)
     .lget(10).lget(3).lget(4).memcopy())
    (t.block().loop()
     .lget(11).lget(4).ge_u().br_if(1)
     .lget(3).lget(4).lget(11).lget(8).lget(6)
     .i32(1).call_indirect(2)
     .if_()
     .lget(10).lget(11).add().i32(42).lget(6).memfill()
     .lget(11).lget(6).add().lset(11)
     .else_()
     .lget(11).i32(1).add().lset(11)
     .end()
     .br(0)
     .end().end())
    (t.lget(0).lget(10).store()
     .lget(0).lget(4).store(4)
     .ret())
    t.end()
    # ---- mode 3: shift by signed delta ----
    (t.lget(2).i32(2).lt_u().if_().unreachable().end()
     .lget(1).load8u(1).extend8_s().lset(5)
     .lget(4).call(0).lset(10))
    (t.block().loop()
     .lget(11).lget(4).ge_u().br_if(1)
     .lget(10).lget(11).add()
     .lget(3).lget(11).add().load8u()
     .lget(5).add()
     .store8()
     .lget(11).i32(1).add().lset(11)
     .br(0)
     .end().end())
    (t.lget(0).lget(10).store()
     .lget(0).lget(4).store(4)
     .ret())
    t.end()
    # ---- default: unknown mode ----
    t.unreachable()

    return module(
        types=types,
        func_types=[0, 0, 1, 2, 3],
        funcs=[(1, malloc), (0, addsp), (0, free), (1, m), (9, t)],
        table_size=2,
        elems=[(1, [3])],  # entry 0 null, like rustc's table slot 0
        mem_pages=2,       # page 0 = shadow stack, heap starts above
        globals_=[(True, 65536), (True, 131072)],
        exports=[("memory", 2, 0),
                 ("__wbindgen_malloc", 0, 0),
                 ("__wbindgen_add_to_stack_pointer", 0, 1),
                 ("__wbindgen_free", 0, 2),
                 ("transform", 0, 4)])


def probe():
    # types: p0 (i32)->i32, p1 (i32,i32)->i32, p2 (i32,i32,i32)->i32
    types = [(1, 1), (2, 1), (3, 1)]

    sext8 = Asm(); sext8.lget(0).extend8_s()
    sext16 = Asm(); sext16.lget(0).extend16_s()
    ld16s = Asm(); ld16s.lget(0).load16s()
    ld16u = Asm(); ld16u.lget(0).load16u()
    st16 = Asm(); st16.lget(0).lget(1).store16().lget(0).load16u()

    pick = Asm()  # br_table incl. out-of-range/negative -> default
    pick.block().block().block().block()
    pick.lget(0).br_table([0, 1, 2], 3)
    pick.end().i32(10).ret()
    pick.end().i32(20).ret()
    pick.end().i32(30).ret()
    pick.end().i32(99)

    add2 = Asm(); add2.lget(0).lget(1).add()
    mul2 = Asm(); mul2.lget(0).lget(1).mul()
    tcall = Asm()  # tcall(elem, a, b) = table[elem](a, b)
    tcall.lget(1).lget(2).lget(0).call_indirect(1)

    return module(
        types=types,
        func_types=[0, 0, 0, 0, 1, 0, 1, 1, 2],
        funcs=[(0, sext8), (0, sext16), (0, ld16s), (0, ld16u), (0, st16),
               (0, pick), (0, add2), (0, mul2), (0, tcall)],
        table_size=4,
        # 0 null, 1 add, 2 mul, 3 a (i32)->i32 func = type mismatch for p1
        elems=[(1, [6, 7]), (3, [0])],
        mem_pages=1,
        exports=[("memory", 2, 0), ("sext8", 0, 0), ("sext16", 0, 1),
                 ("ld16s", 0, 2), ("ld16u", 0, 3), ("st16", 0, 4),
                 ("pick", 0, 5), ("tcall", 0, 8)],
        data=[(16, bytes([0x34, 0x12, 0xFE, 0xFF]))])


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, wasm in [("sear_bindgen.wasm", sear_bindgen()),
                       ("probe.wasm", probe())]:
        path = os.path.join(OUT_DIR, name)
        with open(path, "wb") as f:
            f.write(wasm)
        print(f"wrote {path} ({len(wasm)} bytes)")
