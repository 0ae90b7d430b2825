"""Profile the 2^24 four-step NTT piecewise on the real TPU.

Chained-k timing (see DESIGN.md §7): each candidate is run as a k-fold
chained application inside ONE jit with an in-graph scalar checksum;
(t(k_hi) - t(k_lo)) / (k_hi - k_lo) isolates device compute.

Usage: python scripts/prof_ntt.py [piece ...]
Pieces: full local local_map transpose diag fourstep_map
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

from twenty_first_tpu.math import gf, ntt

LOG_N = 24
N = 1 << LOG_N
LOG_M = LOG_N // 2
M = 1 << LOG_M  # 4096

rng = np.random.default_rng(0)
P = (1 << 64) - (1 << 32) + 1
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


def piece_full():
    diag = ntt._four_step_diag_device(LOG_N, False)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(lo, hi, dlo, dhi, k):
        for _ in range(k):
            lo, hi = ntt.four_step_ntt_traceable((lo, hi), LOG_N, False, (dlo, dhi))
        return checksum(lo, hi)

    t = timed(run, (LO, HI, diag[0], diag[1]))
    print(f"full four-step 2^{LOG_N}: {t*1e3:.2f} ms  ({N/t/1e9:.2f} G elems/s)")


def piece_local():
    perm, tw = ntt._device_tables(LOG_M, False)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(lo, hi, k):
        lo = lo.reshape(M, M)
        hi = hi.reshape(M, M)
        for _ in range(k):
            lo, hi = ntt._ntt_core((lo, hi), perm, tw, LOG_M)
        return checksum(lo, hi)

    t = timed(run, (LO, HI))
    print(f"one local pass (4096x4096, log12, unchunked): {t*1e3:.2f} ms")


def piece_local_map():
    perm, tw = ntt._device_tables(LOG_M, False)
    for step in (256, 512, 1024):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(lo, hi, k, step=step):
            lo = lo.reshape(M, M)
            hi = hi.reshape(M, M)
            for _ in range(k):
                slo = lo.reshape(M // step, step, M)
                shi = hi.reshape(M // step, step, M)
                out = jax.lax.map(
                    lambda s: ntt._ntt_core(s, perm, tw, LOG_M), (slo, shi))
                lo = out[0].reshape(M, M)
                hi = out[1].reshape(M, M)
            return checksum(lo, hi)

        t = timed(run, (LO, HI))
        print(f"one local pass lax.map step={step}: {t*1e3:.2f} ms")


def piece_transpose():
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(lo, hi, k):
        lo = lo.reshape(M, M)
        hi = hi.reshape(M, M)
        for _ in range(k):
            lo = lo.T + jnp.uint32(1)
            hi = hi.T + jnp.uint32(1)
        return checksum(lo, hi)

    t = timed(run, (LO, HI))
    print(f"one 4096x4096 transpose (x2 planes): {t*1e3:.2f} ms")


def piece_diag():
    diag = ntt._four_step_diag_device(LOG_N, False)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(lo, hi, dlo, dhi, k):
        lo = lo.reshape(M, M)
        hi = hi.reshape(M, M)
        for _ in range(k):
            lo, hi = gf.mul((lo, hi), (dlo, dhi))
        return checksum(lo, hi)

    t = timed(run, (LO, HI, diag[0], diag[1]))
    print(f"diag twiddle mul: {t*1e3:.2f} ms")


PIECES = {
    "full": piece_full,
    "local": piece_local,
    "local_map": piece_local_map,
    "transpose": piece_transpose,
    "diag": piece_diag,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PIECES)
    print(f"device: {jax.devices()[0]}")
    for name in names:
        t0 = time.time()
        PIECES[name]()
        print(f"  [{name} wall incl compile: {time.time()-t0:.1f}s]")
