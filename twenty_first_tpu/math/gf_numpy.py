"""Vectorized Goldilocks arithmetic on host (numpy uint64).

Used for twiddle-table precompute, constants derivation, and as an independent
oracle for the device kernels in tests. numpy has native 64-bit integers, so
the 128-bit products are formed from 32-bit halves (each partial product is
exact in uint64).
"""

from __future__ import annotations

import functools

import numpy as np


def _wrapping(fn):
    """Mod-2^64 wrap-around is intentional here; silence numpy's scalar
    overflow warnings inside field ops."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with np.errstate(over="ignore"):
            return fn(*args, **kwargs)

    return wrapped

P = np.uint64(0xFFFF_FFFF_0000_0001)
EPSILON = np.uint64(0xFFFF_FFFF)
_M32 = np.uint64(0xFFFF_FFFF)
_S32 = np.uint64(32)

# Same-shape elementwise ops route through the native C++ core (u128
# arithmetic, one pass). Measured (this host): native wins at EVERY size —
# 3x at n=16 (10us vs 31us: the numpy limb dance is ~13 python-dispatched
# passes vs one ctypes call) to 11x at n=65536 — so the threshold only
# excludes scalars/tiny shapes where ctypes pointer setup isn't worth it.
# Disable with TWENTY_FIRST_TPU_NATIVE_HOST=0. The numpy forms below remain
# the reference oracle (and the fallback), bit-identical on all u64 inputs.
_NATIVE_MIN = 16
_NATIVE = None


def _native_mod():
    global _NATIVE
    if _NATIVE is None:
        import os

        if os.environ.get("TWENTY_FIRST_TPU_NATIVE_HOST") == "0":
            _NATIVE = False
        else:
            try:
                from .. import native as nat
                _NATIVE = nat if nat.available() else False
            except Exception:
                _NATIVE = False
    return _NATIVE


def _native_binop(name: str, a: np.ndarray, b: np.ndarray):
    nat = _native_mod()
    if nat is False:
        return None
    if a.shape != b.shape:
        # a broadcast copy is ONE numpy pass; the numpy fallbacks are ~13
        # passes (mul) / ~4 (add, sub), so materializing pays for all three
        # once the result is a few cache lines
        try:
            shape = np.broadcast_shapes(a.shape, b.shape)
        except ValueError:
            return None
        if int(np.prod(shape)) < (_NATIVE_MIN if name == "gl_mul_arrays"
                                  else 4 * _NATIVE_MIN):
            return None
        a = np.ascontiguousarray(np.broadcast_to(a, shape))
        b = np.ascontiguousarray(np.broadcast_to(b, shape))
    elif a.size < _NATIVE_MIN:
        return None
    else:
        if not a.flags.c_contiguous:
            a = np.ascontiguousarray(a)
        if not b.flags.c_contiguous:
            b = np.ascontiguousarray(b)
    out = np.empty_like(a)
    getattr(nat._load(), name)(
        nat._u64p(a), nat._u64p(b), nat._u64p(out), a.size)
    return out


def _split(x):
    return x & _M32, x >> _S32


@_wrapping
def mul(a, b):
    """Canonical modular product of uint64 arrays (inputs may be any u64)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    fast = _native_binop("gl_mul_arrays", a, b)
    if fast is not None:
        return fast
    a0, a1 = _split(a)
    b0, b1 = _split(b)
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # mid = lh + hl, tracking the carry (worth 2^32 at bit 32 => 2^64 overall)
    mid = lh + hl
    midc = (mid < lh).astype(np.uint64)
    lo = ll + (mid << _S32)
    c = (lo < ll).astype(np.uint64)
    hi = hh + (mid >> _S32) + (midc << _S32) + c
    return reduce128(lo, hi)


@_wrapping
def reduce128(lo, hi):
    """Reduce lo + hi * 2^64 mod p to canonical form."""
    hi_lo, hi_hi = _split(hi)
    t = lo - hi_hi
    borrow = lo < hi_hi
    t = np.where(borrow, t - EPSILON, t)
    t1 = hi_lo * EPSILON
    res = t + t1
    carry = res < t
    res = np.where(carry, res + EPSILON, res)
    return np.where(res >= P, res - P, res)


@_wrapping
def add(a, b):
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    fast = _native_binop("gl_add_arrays", a, b)
    if fast is not None:
        return fast
    s = a + b
    wrapped = s < a
    s = np.where(wrapped, s + EPSILON, s)
    return np.where(s >= P, s - P, s)


@_wrapping
def sub(a, b):
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    fast = _native_binop("gl_sub_arrays", a, b)
    if fast is not None:
        return fast
    d = a - b
    borrow = a < b
    return np.where(borrow, d - EPSILON, d)


def neg(a):
    return sub(np.uint64(0), a)


def pow_scalar(base: int, e: int) -> int:
    return pow(int(base), int(e), int(P))


def inverse(a):
    """Elementwise inverse-or-zero via the fixed Goldilocks addition chain
    for x^(p-2) (b_field_element.rs:252-284), fully vectorized. 0 -> 0.

    Arrays route through the native zero-tolerant batch inversion (one
    inverse + 3n muls in one C pass vs the chain's ~72 vector passes)."""
    x = np.asarray(a, dtype=np.uint64)
    if x.size >= 32:
        nat = _native_mod()
        if nat is not False:
            return nat.batch_inverse_or_zero(x).reshape(x.shape)

    def nsquare(v, n):
        for _ in range(n):
            v = mul(v, v)
        return v

    bin2 = mul(mul(x, x), x)
    bin3 = mul(mul(bin2, bin2), x)
    bin6 = mul(nsquare(bin3, 3), bin3)
    bin12 = mul(nsquare(bin6, 6), bin6)
    bin24 = mul(nsquare(bin12, 12), bin12)
    bin30 = mul(nsquare(bin24, 6), bin6)
    bin31 = mul(mul(bin30, bin30), x)
    bin31_z = mul(bin31, bin31)
    bin32 = mul(mul(bin31, bin31), x)
    return mul(nsquare(bin31_z, 32), bin32)


def powers(base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ..., base^(n-1)] as uint64, by chunk doubling."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = 1
    filled = 1
    while filled < n:
        take = min(filled, n - filled)
        step = np.uint64(pow(int(base) % int(P), filled, int(P)))
        out[filled:filled + take] = mul(out[:take], step)
        filled += take
    return out
