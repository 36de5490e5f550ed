//! example-sear's LITERAL protocol, compiled by REAL rustc to
//! wasm32-unknown-unknown: the reference module
//! (/root/reference/wasm-crates/example-sear/src/lib.rs:4-11) parses
//! its arg as JSON `{"search": "...", "replacement": "..."}` via
//! serde_json, requires dat to be valid UTF-8, and returns
//! `dat.replace(search, replacement)`. This crate reimplements exactly
//! that contract — the JSON subset serde_json accepts for it (object
//! of scalar/nested values, full string escapes incl. \uXXXX surrogate
//! pairs, strict trailing-garbage rejection), strict UTF-8 validation
//! of arg and dat, and Rust `str::replace` semantics INCLUDING the
//! empty-pattern case (replacement emitted at every char boundary:
//! "ab".replace("", "-") == "-a-b-"). Every `.unwrap()` panic in the
//! reference (invalid JSON, missing/non-string key, invalid UTF-8)
//! becomes a wasm trap (`abort` -> unreachable), which is precisely
//! how a wasm-bindgen panic surfaces to the host.
//!
//! The container has no wasm32 libcore (zero egress), so this is a
//! `#![no_core]` crate with the same inline lang-item prelude and
//! wbindgen-shaped ABI as tools/sear_nocore.rs. Build:
//!   rustc +nightly --target wasm32-unknown-unknown --crate-type cdylib
//!     -Copt-level=2 -Ctarget-cpu=mvp
//!     -Ctarget-feature=+bulk-memory,+sign-ext tools/sear_json.rs
//!     -o src/test/resources/graft/wasm/sear_json.wasm
#![no_std]
#![no_core]
#![no_main]
#![allow(internal_features)]
#![feature(no_core, lang_items, intrinsics, link_llvm_intrinsics)]

// ---- minimal lang-item prelude (no libcore for wasm32 in image) ----
#[lang = "pointee_sized"]
pub trait PointeeSized {}
#[lang = "meta_sized"]
pub trait MetaSized: PointeeSized {}
#[lang = "sized"]
pub trait Sized: MetaSized {}
#[lang = "copy"]
pub trait Copy {}
impl Copy for bool {}
impl Copy for u8 {}
impl Copy for i8 {}
impl Copy for u16 {}
impl Copy for i32 {}
impl Copy for u32 {}
impl Copy for usize {}
impl<T: PointeeSized> Copy for *const T {}
impl<T: PointeeSized> Copy for *mut T {}

#[lang = "add"]
pub trait Add<R = Self> { type Output; fn add(self, r: R) -> Self::Output; }
#[lang = "sub"]
pub trait Sub<R = Self> { type Output; fn sub(self, r: R) -> Self::Output; }
#[lang = "mul"]
pub trait Mul<R = Self> { type Output; fn mul(self, r: R) -> Self::Output; }
#[lang = "bitand"]
pub trait BitAnd<R = Self> { type Output; fn bitand(self, r: R) -> Self::Output; }
#[lang = "bitor"]
pub trait BitOr<R = Self> { type Output; fn bitor(self, r: R) -> Self::Output; }
#[lang = "shl"]
pub trait Shl<R = Self> { type Output; fn shl(self, r: R) -> Self::Output; }
#[lang = "shr"]
pub trait Shr<R = Self> { type Output; fn shr(self, r: R) -> Self::Output; }

macro_rules! arith {
    ($t:ty) => {
        impl Add for $t { type Output = $t; fn add(self, r: $t) -> $t { self + r } }
        impl Sub for $t { type Output = $t; fn sub(self, r: $t) -> $t { self - r } }
        impl Mul for $t { type Output = $t; fn mul(self, r: $t) -> $t { self * r } }
        impl BitAnd for $t { type Output = $t; fn bitand(self, r: $t) -> $t { self & r } }
        impl BitOr for $t { type Output = $t; fn bitor(self, r: $t) -> $t { self | r } }
        impl Shl for $t { type Output = $t; fn shl(self, r: $t) -> $t { self << r } }
        impl Shr for $t { type Output = $t; fn shr(self, r: $t) -> $t { self >> r } }
    };
}
arith!(i32);
arith!(usize);

#[lang = "legacy_receiver"]
pub trait LegacyReceiver {}
impl<T: PointeeSized> LegacyReceiver for &T {}
impl<T: PointeeSized> LegacyReceiver for &mut T {}

#[lang = "eq"]
pub trait PartialEq<R = Self> {
    fn eq(&self, r: &R) -> bool;
    fn ne(&self, r: &R) -> bool { !self.eq(r) }
}
#[lang = "partial_ord"]
pub trait PartialOrd<R = Self>: PartialEq<R> {
    fn lt(&self, r: &R) -> bool;
    fn le(&self, r: &R) -> bool;
    fn gt(&self, r: &R) -> bool;
    fn ge(&self, r: &R) -> bool;
}
#[lang = "not"]
pub trait Not { type Output; fn not(self) -> Self::Output; }
impl Not for bool { type Output = bool; fn not(self) -> bool { !self } }

macro_rules! cmp {
    ($t:ty) => {
        impl PartialEq for $t {
            fn eq(&self, r: &$t) -> bool { *self == *r }
            fn ne(&self, r: &$t) -> bool { *self != *r }
        }
        impl PartialOrd for $t {
            fn lt(&self, r: &$t) -> bool { *self < *r }
            fn le(&self, r: &$t) -> bool { *self <= *r }
            fn gt(&self, r: &$t) -> bool { *self > *r }
            fn ge(&self, r: &$t) -> bool { *self >= *r }
        }
    };
}
cmp!(i32);
cmp!(usize);

#[rustc_intrinsic]
fn abort() -> !;

#[lang = "drop_glue"]
pub unsafe fn drop_glue<T: PointeeSized>(_to_drop: *mut T) {}

extern "C" {
    #[link_name = "llvm.wasm.memory.grow.i32.i32"]
    fn wasm_memory_grow(mem: i32, delta: i32) -> i32;
    #[link_name = "llvm.wasm.memory.size.i32"]
    fn wasm_memory_size(mem: i32) -> i32;
    static __heap_base: u8;
}

// ---- wbindgen-shaped ABI surface ----

static mut HEAP_NEXT: usize = 0;
static mut STACK: [u8; 4096] = [0; 4096];
static mut SP_OFF: usize = 4096;

unsafe fn grow_to(end: usize) {
    let mut have = (wasm_memory_size(0) as usize) << 16;
    while have < end {
        if wasm_memory_grow(0, 1) == 0 - 1 { abort() }
        have = have + (1 << 16);
    }
}

#[no_mangle]
pub unsafe extern "C" fn __wbindgen_malloc(size: i32) -> i32 {
    if HEAP_NEXT == 0 {
        HEAP_NEXT = (&__heap_base) as *const u8 as usize;
    }
    let p = (HEAP_NEXT + 3) & 0xFFFF_FFFCusize;
    HEAP_NEXT = p + (size as usize);
    grow_to(HEAP_NEXT);
    p as i32
}

#[no_mangle]
pub unsafe extern "C" fn __wbindgen_free(_ptr: i32, _size: i32) {}

#[no_mangle]
pub unsafe extern "C" fn __wbindgen_add_to_stack_pointer(delta: i32) -> i32 {
    SP_OFF = ((SP_OFF as i32) + delta) as usize;
    ((&raw mut STACK) as *mut u8 as usize + SP_OFF) as i32
}

// ---- byte helpers ----

unsafe fn ld(p: usize) -> i32 {
    *(p as *const u8) as i32
}
unsafe fn st(p: usize, v: i32) {
    *(p as *mut u8) = v as u8;
}

/// strict UTF-8 validation (RFC 3629: no overlongs, no surrogates,
/// max U+10FFFF) — `std::str::from_utf8(...).unwrap()` in the
/// reference traps on exactly these inputs
unsafe fn utf8_ok(p: usize, len: usize) -> bool {
    let mut i = 0usize;
    while i < len {
        let b0 = ld(p + i);
        if b0 < 0x80 { i = i + 1; }
        else if b0 < 0xC2 { return false } // continuation or overlong lead
        else if b0 < 0xE0 {
            if i + 1 >= len { return false }
            if (ld(p + i + 1) & 0xC0) != 0x80 { return false }
            i = i + 2;
        } else if b0 < 0xF0 {
            if i + 2 >= len { return false }
            let b1 = ld(p + i + 1);
            if (b1 & 0xC0) != 0x80 { return false }
            if b0 == 0xE0 && b1 < 0xA0 { return false } // overlong
            if b0 == 0xED && b1 > 0x9F { return false } // surrogate
            if (ld(p + i + 2) & 0xC0) != 0x80 { return false }
            i = i + 3;
        } else if b0 < 0xF5 {
            if i + 3 >= len { return false }
            let b1 = ld(p + i + 1);
            if (b1 & 0xC0) != 0x80 { return false }
            if b0 == 0xF0 && b1 < 0x90 { return false } // overlong
            if b0 == 0xF4 && b1 > 0x8F { return false } // > U+10FFFF
            if (ld(p + i + 2) & 0xC0) != 0x80 { return false }
            if (ld(p + i + 3) & 0xC0) != 0x80 { return false }
            i = i + 4;
        } else { return false }
    }
    true
}

// ---- JSON parser (the serde_json subset the reference exercises) ----

static mut POS: usize = 0;
static mut END: usize = 0;
// last parsed string (unescaped, malloc'd)
static mut STR_PTR: usize = 0;
static mut STR_LEN: usize = 0;
// extracted keys
static mut S_PTR: usize = 0;
static mut S_LEN: usize = 0;
static mut S_SET: bool = false;
static mut R_PTR: usize = 0;
static mut R_LEN: usize = 0;
static mut R_SET: bool = false;

unsafe fn skip_ws() {
    while POS < END {
        let c = ld(POS);
        if c == 0x20 || c == 0x09 || c == 0x0A || c == 0x0D { POS = POS + 1 }
        else { return }
    }
}

unsafe fn expect(c: i32) {
    if POS >= END || ld(POS) != c { abort() }
    POS = POS + 1;
}

unsafe fn hex1() -> i32 {
    if POS >= END { abort() }
    let c = ld(POS);
    POS = POS + 1;
    if c >= 48 && c <= 57 { c - 48 }
    else if c >= 97 && c <= 102 { c - 87 }
    else if c >= 65 && c <= 70 { c - 55 }
    else { abort() }
}

unsafe fn hex4() -> i32 {
    let a = hex1(); let b = hex1(); let c = hex1(); let d = hex1();
    (a << 12) | (b << 8) | (c << 4) | d
}

unsafe fn emit_utf8(out: usize, o: usize, cp: i32) -> usize {
    if cp < 0x80 {
        st(out + o, cp); o + 1
    } else if cp < 0x800 {
        st(out + o, 0xC0 | (cp >> 6));
        st(out + o + 1, 0x80 | (cp & 0x3F)); o + 2
    } else if cp < 0x10000 {
        st(out + o, 0xE0 | (cp >> 12));
        st(out + o + 1, 0x80 | ((cp >> 6) & 0x3F));
        st(out + o + 2, 0x80 | (cp & 0x3F)); o + 3
    } else {
        st(out + o, 0xF0 | (cp >> 18));
        st(out + o + 1, 0x80 | ((cp >> 12) & 0x3F));
        st(out + o + 2, 0x80 | ((cp >> 6) & 0x3F));
        st(out + o + 3, 0x80 | (cp & 0x3F)); o + 4
    }
}

/// parse a JSON string at POS (opening quote pending) into a fresh
/// buffer; leaves (STR_PTR, STR_LEN). Unescaped length never exceeds
/// the escaped span, so the span length bounds the allocation.
unsafe fn parse_string() {
    expect(0x22); // '"'
    // find the raw span first to size the buffer
    let start = POS;
    let mut i = POS;
    loop {
        if i >= END { abort() }
        let c = ld(i);
        if c == 0x22 { break }
        if c == 0x5C {
            if i + 1 >= END { abort() }
            i = i + 2;
        } else { i = i + 1 }
    }
    let out = __wbindgen_malloc((i - start) as i32) as usize;
    let mut o = 0usize;
    while POS < i {
        let c = ld(POS);
        if c < 0x20 { abort() } // raw control char: serde_json rejects
        if c == 0x5C {
            POS = POS + 1;
            let e = ld(POS);
            POS = POS + 1;
            if e == 0x22 || e == 0x5C || e == 0x2F { st(out + o, e); o = o + 1 }
            else if e == 0x62 { st(out + o, 0x08); o = o + 1 } // \b
            else if e == 0x66 { st(out + o, 0x0C); o = o + 1 } // \f
            else if e == 0x6E { st(out + o, 0x0A); o = o + 1 } // \n
            else if e == 0x72 { st(out + o, 0x0D); o = o + 1 } // \r
            else if e == 0x74 { st(out + o, 0x09); o = o + 1 } // \t
            else if e == 0x75 { // \uXXXX, surrogate pairs combined
                let u = hex4();
                if u >= 0xD800 && u <= 0xDBFF {
                    // high surrogate: the low half MUST follow
                    if POS + 1 >= END || ld(POS) != 0x5C || ld(POS + 1) != 0x75 { abort() }
                    POS = POS + 2;
                    let lo = hex4();
                    if lo < 0xDC00 || lo > 0xDFFF { abort() }
                    let cp = 0x10000 + ((u - 0xD800) << 10) + (lo - 0xDC00);
                    o = emit_utf8(out, o, cp);
                } else if u >= 0xDC00 && u <= 0xDFFF {
                    abort() // lone low surrogate
                } else {
                    o = emit_utf8(out, o, u);
                }
            } else { abort() }
        } else {
            st(out + o, c); o = o + 1; POS = POS + 1;
        }
    }
    POS = POS + 1; // closing quote
    STR_PTR = out;
    STR_LEN = o;
}

/// skip any JSON value (the reference's serde_json::Value accepts all
/// of them as map values; only the two string keys are consulted)
unsafe fn skip_value() {
    skip_ws();
    if POS >= END { abort() }
    let c = ld(POS);
    if c == 0x22 { parse_string(); }
    else if c == 0x7B { // object
        POS = POS + 1;
        skip_ws();
        if POS < END && ld(POS) == 0x7D { POS = POS + 1; return }
        loop {
            skip_ws();
            parse_string();
            skip_ws();
            expect(0x3A);
            skip_value();
            skip_ws();
            if POS >= END { abort() }
            let d = ld(POS);
            POS = POS + 1;
            if d == 0x7D { return }
            if d != 0x2C { abort() }
        }
    } else if c == 0x5B { // array
        POS = POS + 1;
        skip_ws();
        if POS < END && ld(POS) == 0x5D { POS = POS + 1; return }
        loop {
            skip_value();
            skip_ws();
            if POS >= END { abort() }
            let d = ld(POS);
            POS = POS + 1;
            if d == 0x5D { return }
            if d != 0x2C { abort() }
        }
    } else if c == 0x74 { // true
        if POS + 4 > END || ld(POS + 1) != 0x72 || ld(POS + 2) != 0x75 || ld(POS + 3) != 0x65 { abort() }
        POS = POS + 4;
    } else if c == 0x66 { // false
        if POS + 5 > END || ld(POS + 1) != 0x61 || ld(POS + 2) != 0x6C || ld(POS + 3) != 0x73 || ld(POS + 4) != 0x65 { abort() }
        POS = POS + 5;
    } else if c == 0x6E { // null
        if POS + 4 > END || ld(POS + 1) != 0x75 || ld(POS + 2) != 0x6C || ld(POS + 3) != 0x6C { abort() }
        POS = POS + 4;
    } else if c == 0x2D || (c >= 48 && c <= 57) { // number
        // serde_json's exact grammar -- -?(0|[1-9][0-9]*)(\.[0-9]+)?
        // ([eE][+-]?[0-9]+)? -- so malformed numbers under SKIPPED keys
        // (bare '-', '01', '1..2', '1e+-3') trap exactly where the
        // reference's from_str().unwrap() panics
        if c == 0x2D {
            POS = POS + 1;
            if POS >= END { abort() }
        }
        let d0 = ld(POS);
        if d0 == 48 { POS = POS + 1 } // leading 0 takes no more digits
        else if d0 >= 49 && d0 <= 57 {
            POS = POS + 1;
            while POS < END && ld(POS) >= 48 && ld(POS) <= 57 { POS = POS + 1 }
        } else { abort() }
        if POS < END && ld(POS) == 0x2E { // one fraction, >= 1 digit
            POS = POS + 1;
            if POS >= END || ld(POS) < 48 || ld(POS) > 57 { abort() }
            while POS < END && ld(POS) >= 48 && ld(POS) <= 57 { POS = POS + 1 }
        }
        if POS < END && (ld(POS) == 0x65 || ld(POS) == 0x45) { // one exponent
            POS = POS + 1;
            if POS < END && (ld(POS) == 0x2B || ld(POS) == 0x2D) { POS = POS + 1 }
            if POS >= END || ld(POS) < 48 || ld(POS) > 57 { abort() }
            while POS < END && ld(POS) >= 48 && ld(POS) <= 57 { POS = POS + 1 }
        }
    } else { abort() }
}

unsafe fn key_is_search(p: usize, len: usize) -> bool {
    len == 6 && ld(p) == 115 && ld(p + 1) == 101 && ld(p + 2) == 97
        && ld(p + 3) == 114 && ld(p + 4) == 99 && ld(p + 5) == 104
}

unsafe fn key_is_replacement(p: usize, len: usize) -> bool {
    len == 11 && ld(p) == 114 && ld(p + 1) == 101 && ld(p + 2) == 112
        && ld(p + 3) == 108 && ld(p + 4) == 97 && ld(p + 5) == 99
        && ld(p + 6) == 101 && ld(p + 7) == 109 && ld(p + 8) == 101
        && ld(p + 9) == 110 && ld(p + 10) == 116
}

/// top-level parse: `{ "k": v, ... }`, extracting the two string keys.
/// Duplicate keys keep the LAST value (serde_json map semantics);
/// a non-string value under either key leaves it unset -> as_str()
/// -> unwrap() -> trap, exactly the reference's failure.
unsafe fn parse_arg(argp: usize, arglen: usize) {
    POS = argp;
    END = argp + arglen;
    skip_ws();
    expect(0x7B);
    skip_ws();
    if POS < END && ld(POS) == 0x7D { POS = POS + 1 }
    else {
        loop {
            skip_ws();
            parse_string();
            let kp = STR_PTR;
            let kl = STR_LEN;
            skip_ws();
            expect(0x3A);
            skip_ws();
            let is_str = POS < END && ld(POS) == 0x22;
            skip_value();
            if key_is_search(kp, kl) {
                if is_str { S_PTR = STR_PTR; S_LEN = STR_LEN; S_SET = true }
                else { S_SET = false }
            } else if key_is_replacement(kp, kl) {
                if is_str { R_PTR = STR_PTR; R_LEN = STR_LEN; R_SET = true }
                else { R_SET = false }
            }
            skip_ws();
            if POS >= END { abort() }
            let d = ld(POS);
            POS = POS + 1;
            if d == 0x7D { break }
            if d != 0x2C { abort() }
        }
    }
    skip_ws();
    if POS != END { abort() } // trailing garbage: from_str rejects
}

// ---- the transform: dat.replace(search, replacement) ----

unsafe fn matches_at(dat: usize, datlen: usize, i: usize, s: usize, slen: usize) -> bool {
    if i + slen > datlen { return false }
    let mut j = 0usize;
    while j < slen {
        if ld(dat + i + j) != ld(s + j) { return false }
        j = j + 1;
    }
    true
}

#[no_mangle]
pub unsafe extern "C" fn transform(retptr: i32, argptr: i32, arglen: i32,
                                   datptr: i32, datlen: i32) -> () {
    let arg = argptr as usize;
    let alen = arglen as usize;
    let dat = datptr as usize;
    let dlen = datlen as usize;
    // the reference: str::from_utf8(arg).unwrap(), from_str(...).unwrap(),
    // v["search"].as_str().unwrap(), str::from_utf8(dat).unwrap()
    if !utf8_ok(arg, alen) { abort() }
    S_SET = false;
    R_SET = false;
    parse_arg(arg, alen);
    if !S_SET || !R_SET { abort() }
    if !utf8_ok(dat, dlen) { abort() }
    let s = S_PTR; let slen = S_LEN;
    let r = R_PTR; let rlen = R_LEN;
    let out: usize;
    let outlen: usize;
    if slen == 0 {
        // str::replace("") inserts the replacement at EVERY char
        // boundary, both ends included: "ab" -> r a r b r
        let mut nchars = 0usize;
        let mut i = 0usize;
        while i < dlen {
            if (ld(dat + i) & 0xC0) != 0x80 { nchars = nchars + 1 }
            i = i + 1;
        }
        outlen = dlen + (nchars + 1) * rlen;
        out = __wbindgen_malloc(outlen as i32) as usize;
        let mut o = out;
        i = 0;
        while i < dlen {
            if (ld(dat + i) & 0xC0) != 0x80 {
                let mut j = 0usize;
                while j < rlen { st(o, ld(r + j)); o = o + 1; j = j + 1 }
            }
            st(o, ld(dat + i));
            o = o + 1;
            i = i + 1;
        }
        let mut j = 0usize;
        while j < rlen { st(o, ld(r + j)); o = o + 1; j = j + 1 }
    } else {
        // two-pass non-overlapping byte replace: for valid UTF-8 text
        // and pattern, byte matches are always char-aligned (UTF-8
        // prefix property), so this IS str::replace
        let mut count = 0usize;
        let mut i = 0usize;
        while i < dlen {
            if matches_at(dat, dlen, i, s, slen) { count = count + 1; i = i + slen }
            else { i = i + 1 }
        }
        outlen = dlen - count * slen + count * rlen;
        out = __wbindgen_malloc(outlen as i32) as usize;
        let mut o = out;
        i = 0;
        while i < dlen {
            if matches_at(dat, dlen, i, s, slen) {
                let mut j = 0usize;
                while j < rlen { st(o, ld(r + j)); o = o + 1; j = j + 1 }
                i = i + slen;
            } else {
                st(o, ld(dat + i));
                o = o + 1;
                i = i + 1;
            }
        }
    }
    let rp = retptr as usize;
    store32(rp, out as i32);
    store32(rp + 4, outlen as i32);
}

unsafe fn store32(p: usize, v: i32) {
    st(p, v);
    st(p + 1, v >> 8);
    st(p + 2, v >> 16);
    st(p + 3, v >> 24);
}
