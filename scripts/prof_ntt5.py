"""Slab-width A/B + per-pass breakdown at 2^24 (radix-4 lazy core)."""

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

from twenty_first_tpu.math import ntt

P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(0)
print("device:", jax.devices()[0])


def checksum(lo, hi):
    return jnp.sum(lo.astype(jnp.uint32)) ^ jnp.sum(hi.astype(jnp.uint32))


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


log_n = 24
n = 1 << log_n
vals = rng.integers(0, P, size=n, dtype=np.uint64)
LO = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
HI = jnp.asarray((vals >> 32).astype(np.uint32))
diag = ntt._four_step_diag_device(log_n, False)

which = sys.argv[1:] or ["slab", "passes"]

if "slab" in which:
    for slab in (64, 256):
        ntt._SLAB = slab

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(lo, hi, dlo, dhi, k, slab=slab):
            for _ in range(k):
                lo, hi = ntt.four_step_ntt_traceable(
                    (lo, hi), log_n, False, (dlo, dhi))
            return checksum(lo, hi)

        t0 = time.time()
        t = timed(chain, (LO, HI, diag[0], diag[1]))
        print(f"slab={slab}: {t*1e3:.3f} ms -> {n/t/1e9:.2f}G "
              f"[wall {time.time()-t0:.0f}s]")
    ntt._SLAB = 128

if "passes" in which:
    L2 = jnp.asarray(LO.reshape(4096, 4096))
    H2 = jnp.asarray(HI.reshape(4096, 4096))

    @functools.partial(jax.jit, static_argnames=("k",))
    def pass1(lo, hi, dlo, dhi, k):
        for _ in range(k):
            lo, hi = ntt._local_pass((lo, hi), 12, False, diag=(dlo, dhi))
        return checksum(lo, hi)

    @functools.partial(jax.jit, static_argnames=("k",))
    def pass2(lo, hi, k):
        for _ in range(k):
            out = ntt._local_pass((lo, hi), 12, False, transpose_in=True)
            # keep shapes stable for chaining: transpose result back
            lo = jnp.swapaxes(out[0], -1, -2)
            hi = jnp.swapaxes(out[1], -1, -2)
        return checksum(lo, hi)

    t0 = time.time()
    t1 = timed(pass1, (L2, H2, diag[0], diag[1]))
    print(f"pass1 (NTT+diag, slab): {t1*1e3:.3f} ms [wall {time.time()-t0:.0f}s]")
    t0 = time.time()
    t2 = timed(pass2, (L2, H2))
    print(f"pass2 (transpose_in NTT + extra swap): {t2*1e3:.3f} ms "
          f"[wall {time.time()-t0:.0f}s]")
