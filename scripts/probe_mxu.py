"""Probe MXU integer-matmul support + throughput on this TPU.

Tests exactness and speed of candidate exact-integer matmul routes for a
digit-decomposed DFT-64:
  a) int8 x int8 -> int32   (preferred_element_type)
  b) bf16 x bf16 -> f32     (7-bit digits, exact for small ints)
  c) u32 VPU elementwise roofline reference (one radix-4 stage equivalent)
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, k_lo=1, k_hi=9, reps=3):
    for k in (k_lo, k_hi):
        r = fn(*args, k=k)
        jax.tree.map(lambda a: a.block_until_ready(), r)
        int(np.asarray(r).ravel()[0])
    lows, highs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(np.asarray(fn(*args, k=k_lo)).ravel()[0])
        lows.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        int(np.asarray(fn(*args, k=k_hi)).ravel()[0])
        highs.append(time.perf_counter() - t0)
    return (min(highs) - min(lows)) / (k_hi - k_lo)


rng = np.random.default_rng(0)
print("device:", jax.devices()[0])

# --- exactness: int8 dot -----------------------------------------------------
a8 = rng.integers(-128, 128, size=(256, 64), dtype=np.int8)
b8 = rng.integers(-128, 128, size=(64, 64), dtype=np.int8)
try:
    got = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ))(a8, b8)
    expect = a8.astype(np.int64) @ b8.astype(np.int64)
    ok = np.array_equal(np.asarray(got, dtype=np.int64), expect)
    print("int8->int32 dot: compiles, exact =", ok, ", dtype =", got.dtype)
except Exception as e:
    print("int8->int32 dot FAILED:", repr(e)[:200])

# --- exactness: bf16 dot with f32 accum --------------------------------------
a7 = rng.integers(0, 128, size=(256, 64)).astype(jnp.bfloat16)
b7 = rng.integers(0, 128, size=(64, 64)).astype(jnp.bfloat16)
try:
    got = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ))(a7, b7)
    expect = np.asarray(a7, dtype=np.float64) @ np.asarray(b7, dtype=np.float64)
    ok = np.array_equal(np.asarray(got, dtype=np.float64), expect)
    print("bf16->f32 dot: compiles, exact =", ok, ", dtype =", got.dtype)
except Exception as e:
    print("bf16->f32 dot FAILED:", repr(e)[:200])

# --- throughput: big int8 matmul ---------------------------------------------
B = 1 << 18
A = rng.integers(-128, 128, size=(B, 64), dtype=np.int8)
W = rng.integers(-128, 128, size=(64, 64), dtype=np.int8)


@functools.partial(jax.jit, static_argnames=("k",))
def int8_chain(a, w, k):
    acc = jnp.zeros((), jnp.int32)
    x = a
    for _ in range(k):
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        acc = acc + jnp.sum(y)
        x = (y & 127).astype(jnp.int8)
    return acc


try:
    t = timed(int8_chain, (A, W))
    macs = B * 64 * 64
    print(f"int8 matmul (2^18x64 @ 64x64): {t*1e3:.3f} ms -> {macs/t/1e12:.1f} Tmac/s")
except Exception as e:
    print("int8 matmul bench FAILED:", repr(e)[:200])

# --- throughput: big bf16 matmul ----------------------------------------------
Abf = rng.integers(0, 128, size=(B, 64)).astype(jnp.bfloat16)
Wbf = rng.integers(0, 128, size=(64, 64)).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("k",))
def bf16_chain(a, w, k):
    acc = jnp.zeros((), jnp.float32)
    x = a
    for _ in range(k):
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = acc + jnp.sum(y)
        x = jnp.mod(y, 128.0).astype(jnp.bfloat16)
    return acc


try:
    t = timed(bf16_chain, (Abf, Wbf))
    macs = B * 64 * 64
    print(f"bf16 matmul (2^18x64 @ 64x64): {t*1e3:.3f} ms -> {macs/t/1e12:.1f} Tmac/s")
except Exception as e:
    print("bf16 matmul bench FAILED:", repr(e)[:200])

# --- VPU reference: one radix-4 stage over 2^24 -------------------------------
from twenty_first_tpu.math import gf, ntt

P = (1 << 64) - (1 << 32) + 1
vals = rng.integers(0, P, size=1 << 24, dtype=np.uint64)
LO = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
HI = jnp.asarray((vals >> 32).astype(np.uint32))
_, _, pairs = ntt._device_tables_r4(12, False)


@functools.partial(jax.jit, static_argnames=("k",))
def stage_chain(lo, hi, k):
    lo = lo.reshape(4096, 4096)
    hi = hi.reshape(4096, 4096)
    for _ in range(k):
        lo, hi = ntt._radix4_true_ax2((lo, hi), pairs[2], 16, 4096, False,
                                      trivial=False)
    return (jnp.sum(lo.astype(jnp.uint32)) ^ jnp.sum(hi.astype(jnp.uint32)))


t = timed(stage_chain, (LO, HI))
print(f"one radix-4 stage over 2^24 (ax2): {t*1e3:.3f} ms")


@functools.partial(jax.jit, static_argnames=("k",))
def mul_chain(lo, hi, k):
    a = (lo, hi)
    b = (hi, lo)
    for _ in range(k):
        a = gf.mul(a, b)
    return (jnp.sum(a[0].astype(jnp.uint32)) ^ jnp.sum(a[1].astype(jnp.uint32)))


t = timed(mul_chain, (LO, HI))
print(f"one gf.mul over 2^24: {t*1e3:.3f} ms")
