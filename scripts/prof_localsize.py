"""Probe: _local_pass throughput vs transform length at fixed 2^24 elements.

If the (4096, 128) slab spills VMEM, shorter transforms over more lanes
should run ~2x faster per element. Finds the best local-transform size for
a multi-factor four-step split.
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

LOG_N = 24
N = 1 << LOG_N
P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(0)
vals = rng.integers(0, P, size=N, dtype=np.uint64)


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


def probe(log_t):
    n_t, n_w = 1 << log_t, 1 << (LOG_N - log_t)
    lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)).reshape(n_t, n_w)
    hi = jnp.asarray((vals >> 32).astype(np.uint32)).reshape(n_t, n_w)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(lo, hi, k):
        for _ in range(k):
            lo, hi = ntt._local_pass((lo, hi), log_t, False)
        return checksum(lo, hi)

    t = timed(run, (lo, hi))
    print(f"transform 2^{log_t} x {n_w} lanes: {t*1e3:6.2f} ms "
          f"({N / t / 1e9:.2f}G elems/s)", flush=True)


if __name__ == "__main__":
    logs = [int(a) for a in sys.argv[1:]] or [12, 11, 10, 9, 8]
    print("device:", jax.devices()[0], flush=True)
    for lt in logs:
        probe(lt)
