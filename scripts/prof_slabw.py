"""Isolate the 2^24 single-pass cost: slab width, bit-reverse gather,
stack layers. Variants (some WRONG VALUES, timing only):
  base        : _local_pass as-is
  slab256/512 : wider slabs
  nogather    : skip the per-slab bit-reverse take
  notrail     : skip the last butterfly layer (cost of one layer)
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


def run_case(name, log_t, slab=128, nogather=False, notrail=False):
    n_t, n_w = 1 << log_t, 1 << (LOG_N - log_t)
    lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)).reshape(n_t, n_w)
    hi = jnp.asarray((vals >> 32).astype(np.uint32)).reshape(n_t, n_w)

    orig_slab = ntt._SLAB
    orig_core = ntt._ntt_core_ax2
    ntt._SLAB = slab

    if nogather or notrail:
        def core(x, log_n, inverse):
            perm, plan = ntt._device_tables_mixed(log_n, inverse)
            lo, hi = x
            if not nogather:
                lo = jnp.take(lo, perm, axis=-2)
                hi = jnp.take(hi, perm, axis=-2)
            n = lo.shape[-2]
            st = (lo, hi)
            use_plan = plan[:-1] if notrail else plan
            for kind, tabs, m, trivial in use_plan:
                if kind == "r2":
                    st = ntt._radix2_first_ax2(st, n)
                elif kind == "r4":
                    st = ntt._radix4_true_ax2(st, tabs, m, n, inverse, trivial=trivial)
                else:
                    st = ntt._radix8_true_ax2(st, tabs, m, n, inverse, trivial=trivial)
            return gf.canon(st)
        ntt._ntt_core_ax2 = core

    try:
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(lo, hi, k):
            for _ in range(k):
                lo, hi = ntt._local_pass((lo, hi), log_t, False)
            return checksum(lo, hi)

        t = timed(run, (lo, hi))
        print(f"{name}: {t*1e3:6.2f} ms ({N / t / 1e9:.2f}G elems/s)", flush=True)
    finally:
        ntt._SLAB = orig_slab
        ntt._ntt_core_ax2 = orig_core


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    run_case("t=2^11 slab=128 base", 11)
    run_case("t=2^11 slab=256     ", 11, slab=256)
    run_case("t=2^11 slab=512     ", 11, slab=512)
    run_case("t=2^11 slab=1024    ", 11, slab=1024)
    run_case("t=2^11 nogather     ", 11, nogather=True)
    run_case("t=2^11 notrail      ", 11, notrail=True)
    run_case("t=2^12 slab=256     ", 12, slab=256)
