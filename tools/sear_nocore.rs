//! example-sear, compiled by REAL rustc to wasm32-unknown-unknown.
//!
//! The container has no wasm32 libcore (zero egress), so this is a
//! `#![no_core]` crate: the handful of lang items rustc needs are
//! declared inline (the same trait shapes libcore itself uses).
//! The transform protocol matches tools/make_wasm_fixture.py:
//!   [0]                                -> identity copy
//!   [1][slen:u16le][rlen:u16le][s][r]  -> replace occurrences of s by r
//!   [2][slen:u16le][s]                 -> redact occurrences with '*'
//!   [3][delta:i8]                      -> wrapping-add delta to bytes
//!   anything else / empty arg / empty s -> trap (unreachable)
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

// ---- the sear transform ----

unsafe fn ld(p: usize) -> i32 {
    *(p as *const u8) as i32
}
unsafe fn st(p: usize, v: i32) {
    *(p as *mut u8) = v as u8;
}
unsafe fn u16le(p: usize) -> usize {
    (ld(p) | (ld(p + 1) << 8)) as usize
}
/// non-overlapping match of s (slen bytes) at dat[i..]
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
    if alen < 1 { abort() }
    let mode = ld(arg);
    let out: usize;
    let outlen: usize;
    if mode == 0 {
        out = __wbindgen_malloc(datlen) as usize;
        outlen = dlen;
        let mut i = 0usize;
        while i < dlen { st(out + i, ld(dat + i)); i = i + 1 }
    } else if mode == 1 {
        if alen < 5 { abort() }
        let slen = u16le(arg + 1);
        let rlen = u16le(arg + 3);
        if slen == 0 { abort() }
        if alen < 5 + slen + rlen { abort() }
        let s = arg + 5;
        let r = arg + 5 + slen;
        // pass 1: count non-overlapping occurrences
        let mut count = 0usize;
        let mut i = 0usize;
        while i < dlen {
            if matches_at(dat, dlen, i, s, slen) { count = count + 1; i = i + slen }
            else { i = i + 1 }
        }
        outlen = dlen - count * slen + count * rlen;
        out = __wbindgen_malloc(outlen as i32) as usize;
        // pass 2: emit
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
    } else if mode == 2 {
        if alen < 3 { abort() }
        let slen = u16le(arg + 1);
        if slen == 0 { abort() }
        if alen < 3 + slen { abort() }
        let s = arg + 3;
        outlen = dlen;
        out = __wbindgen_malloc(datlen) as usize;
        let mut i = 0usize;
        while i < dlen { st(out + i, ld(dat + i)); i = i + 1 }
        i = 0;
        while i < dlen {
            if matches_at(dat, dlen, i, s, slen) {
                let mut j = 0usize;
                while j < slen { st(out + i + j, 42); j = j + 1 } // '*'
                i = i + slen;
            } else { i = i + 1 }
        }
    } else if mode == 3 {
        if alen < 2 { abort() }
        let delta = ld(arg + 1); // raw byte; wrapping add then truncate
        outlen = dlen;
        out = __wbindgen_malloc(datlen) as usize;
        let mut i = 0usize;
        while i < dlen { st(out + i, ld(dat + i) + delta); i = i + 1 }
    } else {
        abort()
    }
    let rp = retptr as usize;
    // little-endian i32 pair (ptr, len) at retptr
    store32(rp, out as i32);
    store32(rp + 4, outlen as i32);
}

unsafe fn store32(p: usize, v: i32) {
    st(p, v);
    st(p + 1, v >> 8);
    st(p + 2, v >> 16);
    st(p + 3, v >> 24);
}
