"""Probe: does XLA:TPU's native u64 emulation beat our manual 2xu32 limb mul?

Times k-fold chained Goldilocks multiplies at 2^22 elements three ways:
  a) current gf.mul_lazy on (lo, hi) u32 limb planes
  b) u64 arrays (jax_enable_x64) with the same Goldilocks reduction written
     in u64 ops (XLA emulates 64-bit mul/add on TPU with its own strategy)
  c) u64 lazy add chain (for the add/sub cost comparison)

Run: python scripts/x64_mul_probe.py
"""
import functools
import time

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from twenty_first_tpu.math import gf

P = (1 << 64) - (1 << 32) + 1
N = 1 << 22
rng = np.random.default_rng(0)
a64 = rng.integers(0, P, size=N, dtype=np.uint64)
b64 = rng.integers(0, P, size=N, dtype=np.uint64)


def mul64_u64(a, b):
    """Goldilocks mulmod on u64 arrays using XLA's 64-bit emulation.

    Full 128-bit product via 32-bit halves but in u64 registers:
    4 partial products, each exact in u64."""
    alo = a & 0xFFFFFFFF
    ahi = a >> 32
    blo = b & 0xFFFFFFFF
    bhi = b >> 32
    ll = alo * blo
    lh = alo * bhi
    hl = ahi * blo
    hh = ahi * bhi
    # mid = lh + hl (can carry into bit 65)
    mid = lh + hl
    midc = (mid < lh).astype(jnp.uint64)  # carry worth 2^64 at bit-32 pos
    lo = ll + (mid << 32)
    c = (lo < ll).astype(jnp.uint64)
    hi = hh + (mid >> 32) + (midc << 32) + c
    # reduce 128-bit (lo, hi) mod p: hi = x2 + 2^32 x3
    x2 = hi & 0xFFFFFFFF
    x3 = hi >> 32
    # t = lo - x3, wrap fix -EPS
    t = lo - x3
    br = (lo < x3)
    t = jnp.where(br, t - 0xFFFFFFFF, t)
    # t += x2 * (2^32 - 1)
    m = (x2 << 32) - x2
    t2 = t + m
    c2 = (t2 < t)
    out = jnp.where(c2, t2 + 0xFFFFFFFF, t2)
    return out


def timed(fn, args, k_lo, k_hi, reps=4):
    for k in (k_lo, k_hi):
        jax.block_until_ready(fn(*args, k=k))
    lows, highs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, k=k_lo))
        lows.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, k=k_hi))
        highs.append(time.perf_counter() - t0)
    return (min(highs) - min(lows)) / (k_hi - k_lo)


@functools.partial(jax.jit, static_argnames=("k",))
def chain_u32(al, ah, bl, bh, k):
    o = (al, ah)
    for _ in range(k):
        o = gf.mul_lazy(o, (bl, bh))
    return jnp.sum(o[0], dtype=jnp.uint32) + jnp.sum(o[1], dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("k",))
def chain_u64(a, b, k):
    o = a
    for _ in range(k):
        o = mul64_u64(o, b)
    return jnp.sum(o, dtype=jnp.uint64)


@functools.partial(jax.jit, static_argnames=("k",))
def chain_add_u32(al, ah, bl, bh, k):
    o = (al, ah)
    for _ in range(k):
        o = gf.add_lazy(o, (bl, bh))
    return jnp.sum(o[0], dtype=jnp.uint32) + jnp.sum(o[1], dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("k",))
def chain_add_u64(a, b, k):
    o = a
    for _ in range(k):
        s = o + b
        c = s < o
        o = jnp.where(c, s + 0xFFFFFFFF, s)
    return jnp.sum(o, dtype=jnp.uint64)


def main():
    lo, hi = gf.to_limbs(a64)
    bl, bh = gf.to_limbs(b64)
    lo, hi, bl, bh = (jax.device_put(v) for v in (lo, hi, bl, bh))
    da = jax.device_put(jnp.asarray(a64))
    db = jax.device_put(jnp.asarray(b64))

    # correctness cross-check on a small slice
    ref = np.asarray(gf.from_limbs(gf.canon(gf.mul_lazy((lo[:64], hi[:64]), (bl[:64], bh[:64])))))
    got = np.asarray(mul64_u64(da[:64], db[:64]))
    got = np.where(got >= P, got - P, got)
    assert np.array_equal(ref, got), (ref[:4], got[:4])
    print("correctness ok")

    t_u32 = timed(chain_u32, (lo, hi, bl, bh), 2, 18)
    print(f"mul u32-limb   : {t_u32*1e3:8.3f} ms/chain-step  ({N/t_u32/1e9:.2f}G mul/s)")
    t_u64 = timed(chain_u64, (da, db), 2, 18)
    print(f"mul u64-native : {t_u64*1e3:8.3f} ms/chain-step  ({N/t_u64/1e9:.2f}G mul/s)")
    t_a32 = timed(chain_add_u32, (lo, hi, bl, bh), 2, 34)
    print(f"add u32-limb   : {t_a32*1e3:8.3f} ms/chain-step")
    t_a64 = timed(chain_add_u64, (da, db), 2, 34)
    print(f"add u64-native : {t_a64*1e3:8.3f} ms/chain-step")


if __name__ == "__main__":
    main()
