"""Sweep _SLAB width and four-step split asymmetry at 2^24 (full pipeline).

Usage: python scripts/prof_slab_split.py [name ...]
Names: slab128 slab256 slab512 split11_13 split13_11 split10_14
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

from twenty_first_tpu.math import ntt

LOG_N = int(os.environ.get("LOG_N", "24"))
N = 1 << LOG_N
P = (1 << 64) - (1 << 32) + 1

rng = np.random.default_rng(0)
vals = rng.integers(0, P, size=N, dtype=np.uint64)
LO = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
HI = jnp.asarray((vals >> 32).astype(np.uint32))


def timed(fn, args, k_lo=1, k_hi=5, reps=3):
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
    return (jnp.sum(lo.astype(jnp.uint64)) + jnp.sum(hi.astype(jnp.uint64))).astype(jnp.uint64)


def clear_caches():
    ntt._four_step_diag_host.cache_clear()
    ntt._four_step_diag_device.cache_clear()


def run_config(name, slab=128, split=None):
    old_slab, old_split = ntt._SLAB, ntt._four_step_split
    ntt._SLAB = slab
    if split is not None:
        ntt._four_step_split = lambda log_n: split
    clear_caches()
    try:
        diag = ntt._four_step_diag_device(LOG_N, False)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run(lo, hi, dlo, dhi, k):
            for _ in range(k):
                lo, hi = ntt.four_step_ntt_traceable((lo, hi), LOG_N, False, (dlo, dhi))
            return checksum(lo, hi)

        t = timed(run, (LO, HI, diag[0], diag[1]))
        print(f"{name}: {t*1e3:.2f} ms  ({N/t/1e9:.2f} G elems/s)", flush=True)
    finally:
        ntt._SLAB, ntt._four_step_split = old_slab, old_split
        clear_caches()


CONFIGS = {
    "slab128": dict(slab=128),
    "slab256": dict(slab=256),
    "slab512": dict(slab=512),
    "split11_13": dict(split=(11, 13)),
    "split13_11": dict(split=(13, 11)),
    "split10_14": dict(split=(10, 14)),
    "split13_11_slab256": dict(slab=256, split=(13, 11)),
}

if __name__ == "__main__":
    which = sys.argv[1:] or ["slab256", "split13_11", "split11_13"]
    print("device:", jax.devices()[0], flush=True)
    for w in which:
        run_config(w, **CONFIGS[w])
