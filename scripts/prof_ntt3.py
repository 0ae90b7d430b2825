"""Slab variants: smaller slabs + dynamic-slice loop (no transpose copies)."""

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

from twenty_first_tpu.math import gf, ntt

P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(0)


def timed(fn, args, k_lo=1, k_hi=3, reps=3):
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


def checksum(lo, hi):
    return jnp.sum(lo.astype(jnp.uint32)) ^ jnp.sum(hi.astype(jnp.uint32))


vals = rng.integers(0, P, size=1 << 24, dtype=np.uint64)
LO = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32).reshape(4096, 4096))
HI = jnp.asarray((vals >> 32).astype(np.uint32).reshape(4096, 4096))
perm, tw = ntt._device_tables(12, False)

which = sys.argv[1:] or ["small", "dyn"]
print("device:", jax.devices()[0])

if "small" in which:
    for slab in (32, 64, 128):
        nslab = 4096 // slab

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_slab(lo, hi, k, slab=slab, nslab=nslab):
            for _ in range(k):
                slo = lo.reshape(4096, nslab, slab).transpose(1, 0, 2)
                shi = hi.reshape(4096, nslab, slab).transpose(1, 0, 2)
                out = jax.lax.map(
                    lambda s: ntt._ntt_core_ax2(s, perm, tw, 12), (slo, shi))
                lo = out[0].transpose(1, 0, 2).reshape(4096, 4096)
                hi = out[1].transpose(1, 0, 2).reshape(4096, 4096)
            return checksum(lo, hi)

        t0 = time.time()
        t = timed(run_slab, (LO, HI))
        print(f"map slab={slab}: {t*1e3:.3f} ms [wall {time.time()-t0:.0f}s]")

if "dyn" in which:
    for slab in (128, 256):
        nslab = 4096 // slab

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_dyn(lo, hi, k, slab=slab, nslab=nslab):
            for _ in range(k):
                def body(i, out):
                    olo, ohi = out
                    c0 = i * slab
                    slo = jax.lax.dynamic_slice(lo, (0, c0), (4096, slab))
                    shi = jax.lax.dynamic_slice(hi, (0, c0), (4096, slab))
                    rlo, rhi = ntt._ntt_core_ax2((slo, shi), perm, tw, 12)
                    return (jax.lax.dynamic_update_slice(olo, rlo, (0, c0)),
                            jax.lax.dynamic_update_slice(ohi, rhi, (0, c0)))
                lo, hi = jax.lax.fori_loop(
                    0, nslab, body,
                    (jnp.zeros_like(lo), jnp.zeros_like(hi)))
            return checksum(lo, hi)

        t0 = time.time()
        t = timed(run_dyn, (LO, HI))
        print(f"dyn slab={slab}: {t*1e3:.3f} ms [wall {time.time()-t0:.0f}s]")
