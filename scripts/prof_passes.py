"""Piecewise four-step profiling: pass1 (diag fused) vs pass2 (transpose_in)
at 2^22 and 2^24, to localize the large-size rate anomaly.

Usage: python scripts/prof_passes.py [log_n ...]
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

from twenty_first_tpu.math import gf, ntt

P = (1 << 64) - (1 << 32) + 1


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


def profile(log_n):
    n = 1 << log_n
    log_n1, log_n2 = ntt._four_step_split(log_n)
    n1, n2 = 1 << log_n1, 1 << log_n2
    rng = np.random.default_rng(0)
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)).reshape(n2, n1)
    hi = jnp.asarray((vals >> 32).astype(np.uint32)).reshape(n2, n1)
    diag = ntt._four_step_diag_device(log_n, False)

    @functools.partial(jax.jit, static_argnames=("k",))
    def pass1(lo, hi, dlo, dhi, k):
        for _ in range(k):
            lo, hi = ntt._local_pass((lo, hi), log_n2, False, diag=(dlo, dhi))
        return checksum(lo, hi)

    @functools.partial(jax.jit, static_argnames=("k",))
    def pass1_nodiag(lo, hi, k):
        for _ in range(k):
            lo, hi = ntt._local_pass((lo, hi), log_n2, False)
        return checksum(lo, hi)

    @functools.partial(jax.jit, static_argnames=("k",))
    def pass2(lo, hi, k):
        for _ in range(k):
            out = ntt._local_pass((lo, hi), log_n1, False, transpose_in=True)
            # keep shapes chainable: out is (n1, n2); feed back transposed-shape
            lo, hi = out[0].reshape(n2, n1), out[1].reshape(n2, n1)
        return checksum(lo, hi)

    t1 = timed(pass1, (lo, hi, diag[0], diag[1]))
    t1n = timed(pass1_nodiag, (lo, hi))
    t2 = timed(pass2, (lo, hi))
    print(f"2^{log_n}: pass1(diag)={t1*1e3:.2f} ms  pass1(nodiag)={t1n*1e3:.2f} ms  "
          f"pass2(transpose_in)={t2*1e3:.2f} ms  sum={1e3*(t1+t2):.2f}",
          flush=True)


if __name__ == "__main__":
    logs = [int(a) for a in sys.argv[1:]] or [22, 24]
    print("device:", jax.devices()[0], flush=True)
    for ln in logs:
        profile(ln)
