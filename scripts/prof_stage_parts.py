"""Decompose the 2^24 local-pass cost: stack-only vs adds-only vs full.

Monkeypatches _radix4_true_ax2 with stripped variants (WRONG VALUES,
timing only) and times the full four-step at 2^24.
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


def make_variant(kind):
    def bf(x, tq, m, n, inverse, trivial):
        lo, hi = x
        batch = lo.shape[:-2]
        w = lo.shape[-1]
        shape = batch + (n // (4 * m), 4, m, w)
        lo = lo.reshape(shape)
        hi = hi.reshape(shape)
        a = (lo[..., 0, :, :], hi[..., 0, :, :])
        b = (lo[..., 1, :, :], hi[..., 1, :, :])
        c = (lo[..., 2, :, :], hi[..., 2, :, :])
        d = (lo[..., 3, :, :], hi[..., 3, :, :])
        if kind == "stack_only":
            y0, y1, y2, y3 = a, c, b, d
        elif kind == "adds_only":
            e0 = gf.add_lazy(a, b)
            e1 = gf.sub_lazy(a, b)
            o0 = gf.add_lazy(c, d)
            o1 = gf.mul_by_i_lazy(gf.sub_lazy(c, d), inverse)
            y0 = gf.add_lazy(e0, o0)
            y2 = gf.sub_lazy(e0, o0)
            y1 = gf.add_lazy(e1, o1)
            y3 = gf.sub_lazy(e1, o1)
        elif kind == "muls_only":
            if trivial:
                y0, y1, y2, y3 = a, c, b, d
            else:
                t, t2, t3 = (ntt._tw_ax2(v) for v in tq)
                y0 = a
                y1 = gf.mul_lazy(c, t)
                y2 = gf.mul_lazy(b, t2)
                y3 = gf.mul_lazy(d, t3)
        out_shape = batch + (n, w)
        return (
            jnp.stack([y0[0], y1[0], y2[0], y3[0]], axis=-3).reshape(out_shape),
            jnp.stack([y0[1], y1[1], y2[1], y3[1]], axis=-3).reshape(out_shape),
        )
    return bf


def run_variant(name):
    diag = ntt._four_step_diag_device(LOG_N, False)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(lo, hi, dlo, dhi, k):
        for _ in range(k):
            lo, hi = ntt.four_step_ntt_traceable((lo, hi), LOG_N, False, (dlo, dhi))
        return checksum(lo, hi)

    t = timed(run, (LO, HI, diag[0], diag[1]))
    print(f"{name}: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["full", "stack_only", "adds_only", "muls_only"]
    print("device:", jax.devices()[0], flush=True)
    orig = ntt._radix4_true_ax2
    for w in which:
        ntt._radix4_true_ax2 = orig if w == "full" else make_variant(w)
        run_variant(w)
    ntt._radix4_true_ax2 = orig
