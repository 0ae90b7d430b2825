"""Microbenchmark VPU primitive throughput on the real chip.

Measures per-element cost of: f32 mul (baseline), u32 mul, u32 add,
u32 shift, compare+select, gf.mul_lazy, gf.add_lazy, gf.mul_by_pow2_lazy,
and a candidate Karatsuba mul32. Chained-k inside one jit, data-dependent
so nothing folds away.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from twenty_first_tpu.math import gf

N = 1 << 24
rng = np.random.default_rng(0)
A = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
B = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint32))
AF = jnp.asarray(rng.random(N, dtype=np.float32))
BF = jnp.asarray(rng.random(N, dtype=np.float32))


def timed(fn, args, k_lo=2, k_hi=18, reps=3):
    for k in (k_lo, k_hi):
        int(fn(*args, k=k))
    lows, highs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(fn(*args, k=k_lo))
        lows.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        int(fn(*args, k=k_hi))
        highs.append(time.perf_counter() - t0)
    return (min(highs) - min(lows)) / (k_hi - k_lo)


def chain(op, two_in=True):
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(a, b, k):
        x, y = a, b
        for _ in range(k):
            x, y = op(x, y)
        return jnp.sum(x.astype(jnp.uint32) if x.dtype != jnp.float32 else x.astype(jnp.int32).astype(jnp.uint32)).astype(jnp.uint64)
    return run


def chain_pair(op):
    """op takes/returns ((lo,hi),(lo,hi))."""
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(alo, ahi, blo, bhi, k):
        x, y = (alo, ahi), (blo, bhi)
        for _ in range(k):
            x, y = op(x, y)
        return (jnp.sum(x[0].astype(jnp.uint64)) + jnp.sum(x[1].astype(jnp.uint64))).astype(jnp.uint64)
    return run


def report(name, t):
    print(f"{name:28s}: {t*1e3:7.3f} ms  ({N/t/1e9:7.2f} G elems/s)", flush=True)


def main(which):
    print("device:", jax.devices()[0], flush=True)

    if "f32mul" in which:
        t = timed(chain(lambda x, y: (x * y + 1.0, y)), (AF, BF))
        report("f32 mul+add", t)
    if "u32mul" in which:
        t = timed(chain(lambda x, y: (x * y + jnp.uint32(1), y)), (A, B))
        report("u32 mul+add", t)
    if "u32mul16" in which:
        a16 = A >> 16
        b16 = B >> 16
        t = timed(chain(lambda x, y: ((x & jnp.uint32(0xFFFF)) * y + jnp.uint32(1), y)), (a16, b16))
        report("u32 mul (<2^16 vals)+mask", t)
    if "u32add" in which:
        t = timed(chain(lambda x, y: (x + y, y + jnp.uint32(3))), (A, B))
        report("u32 add (x2)", t)
    if "u32shift" in which:
        t = timed(chain(lambda x, y: ((x >> 7) + y, y)), (A, B))
        report("u32 shift+add", t)
    if "u32cmp" in which:
        t = timed(chain(lambda x, y: (jnp.where(x < y, x + jnp.uint32(1), y), y)), (A, B))
        report("u32 cmp+select+add", t)
    if "gfmul" in which:
        t = timed(chain_pair(lambda x, y: (gf.mul_lazy(x, y), y)), (A, B, B, A))
        report("gf.mul_lazy", t)
    if "gfmulc" in which:
        t = timed(chain_pair(lambda x, y: (gf.mul(x, y), y)), (A, B, B, A))
        report("gf.mul (canonical)", t)
    if "gfadd" in which:
        t = timed(chain_pair(lambda x, y: (gf.add_lazy(x, y), y)), (A, B, B, A))
        report("gf.add_lazy", t)
    if "gfpow2" in which:
        t = timed(chain_pair(lambda x, y: (gf.mul_by_pow2_lazy(x, 48), y)), (A, B, B, A))
        report("gf.mul_by_pow2_lazy(48)", t)
    if "mul32" in which:
        t = timed(chain(lambda x, y: gf.mul32(x, y)), (A, B))
        report("gf.mul32 (32x32->64)", t)


if __name__ == "__main__":
    which = sys.argv[1:] or ["f32mul", "u32mul", "u32mul16", "u32add", "u32shift",
                             "u32cmp", "mul32", "gfmul", "gfmulc", "gfadd", "gfpow2"]
    main(which)
