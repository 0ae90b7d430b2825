"""Pallas v2 experiment: one fused local pass (all butterfly layers of a
(t, tc) block in VMEM) using the radix-4 lazy stage machinery from math/ntt.

Measures per-pass time at 2^24 for several (transform, tile) shapes, with the
bit-reverse hoisted as an XLA row gather. Correctness-checked against
_local_pass per shape.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def make_pass(log_t, tc, roundtrip=False):
    t = 1 << log_t
    twl_np, twh_np, metas = ntt._stage_tw_flat(log_t, False)

    def kernel(lo_ref, hi_ref, twl_ref, twh_ref, olo_ref, ohi_ref):
        twl = twl_ref[...]
        twh = twh_ref[...]
        if roundtrip:
            olo_ref[...] = lo_ref[...]
            ohi_ref[...] = hi_ref[...]
            n = t
            for kind, off, m, trivial in metas:
                st = (olo_ref[...], ohi_ref[...])
                ntab = 3 if kind == "r4" else 7
                tq = None
                if kind != "r2" and not trivial:
                    tq = tuple(
                        (twl[off + j * m: off + (j + 1) * m, :],
                         twh[off + j * m: off + (j + 1) * m, :])
                        for j in range(ntab))
                if kind == "r2":
                    st = ntt._radix2_first_ax2(st, n)
                elif kind == "r4":
                    st = ntt._radix4_true_ax2(st, tq, m, n, False, trivial=trivial)
                else:
                    st = ntt._radix8_true_ax2(st, tq, m, n, False, trivial=trivial)
                olo_ref[...], ohi_ref[...] = st
            olo, ohi = gf.canon((olo_ref[...], ohi_ref[...]))
        else:
            st = (lo_ref[...], hi_ref[...])
            olo, ohi = gf.canon(
                ntt._ntt_stages_ax2_tw(st, log_t, False, twl, twh))
        olo_ref[...] = olo
        ohi_ref[...] = ohi

    spec = pl.BlockSpec((t, tc), lambda i: (0, i))
    tw_spec = pl.BlockSpec(twl_np.shape, lambda i: (0, 0))

    def run_pass(lo, hi):
        # XLA bit-reverse row gather (hoisted out of the kernel)
        perm, _ = ntt._device_tables_mixed(log_t, False)
        lo = jnp.take(lo, perm, axis=0)
        hi = jnp.take(hi, perm, axis=0)
        w = lo.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(w // tc,),
            in_specs=[spec, spec, tw_spec, tw_spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((t, w), jnp.uint32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(lo, hi, jnp.asarray(twl_np), jnp.asarray(twh_np))

    return run_pass


def make_pass_nogrid(log_t, tc):
    """Round-5 verdict item #4: the same fused local pass through the
    GRID-FREE route (outer lax.map over single-(t, tc)-block calls — the
    dispatch pattern that let the lane-dense Tip5 kernel compile and win
    standalone through this tunnel, DESIGN §17). Boundary cost: a
    (t, w) -> (w/tc, t, tc) tile transpose each way (~1 HBM round trip),
    which a production integration would fold into neighbors."""
    t = 1 << log_t
    twl_np, twh_np, metas = ntt._stage_tw_flat(log_t, False)
    tw_l = jnp.asarray(twl_np)
    tw_h = jnp.asarray(twh_np)
    base = make_pass(log_t, tc)  # reuse its kernel via closure rebuild

    # rebuild the same kernel body (non-roundtrip variant)
    def kernel(lo_ref, hi_ref, twl_ref, twh_ref, olo_ref, ohi_ref):
        st = (lo_ref[...], hi_ref[...])
        olo, ohi = gf.canon(
            ntt._ntt_stages_ax2_tw(st, log_t, False, twl_ref[...],
                                   twh_ref[...]))
        olo_ref[...] = olo
        ohi_ref[...] = ohi

    def one(args):
        tlo, thi = args
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((t, tc), jnp.uint32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tlo, thi, tw_l, tw_h)

    def run_pass(lo, hi):
        perm, _ = ntt._device_tables_mixed(log_t, False)
        lo = jnp.take(lo, perm, axis=0)
        hi = jnp.take(hi, perm, axis=0)
        w = lo.shape[1]
        n_tiles = w // tc
        tlo = jnp.moveaxis(lo.reshape(t, n_tiles, tc), 1, 0)
        thi = jnp.moveaxis(hi.reshape(t, n_tiles, tc), 1, 0)
        olo, ohi = jax.lax.map(one, (tlo, thi))
        return (jnp.moveaxis(olo, 0, 1).reshape(t, w),
                jnp.moveaxis(ohi, 0, 1).reshape(t, w))

    del base
    return run_pass


def run_case(name, log_t, tc, roundtrip=False, nogrid=False):
    n_t = 1 << log_t
    n_w = N // n_t
    lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)).reshape(n_t, n_w)
    hi = jnp.asarray((vals >> 32).astype(np.uint32)).reshape(n_t, n_w)
    run_pass = make_pass_nogrid(log_t, tc) if nogrid \
        else make_pass(log_t, tc, roundtrip)

    # correctness vs the XLA local pass (on a slice for speed)
    want = ntt._local_pass((lo[:, :256], hi[:, :256]), log_t, False)
    got = jax.jit(run_pass)(lo[:, :256], hi[:, :256])
    ok = bool(jnp.array_equal(want[0], got[0]) & jnp.array_equal(want[1], got[1]))

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(lo, hi, k):
        for _ in range(k):
            lo, hi = run_pass(lo, hi)
        return checksum(lo, hi)

    t = timed(run, (lo, hi))
    print(f"{name}: {t*1e3:6.2f} ms ({N / t / 1e9:.2f}G elems/s) correct={ok}",
          flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    for spec in sys.argv[1:] or ["12,128", "12,64", "8,512", "8,128", "12,128,rt"]:
        parts = spec.split(",")
        lt, tc = int(parts[0]), int(parts[1])
        rt = len(parts) > 2 and parts[2] == "rt"
        ng = len(parts) > 2 and parts[2] == "ng"
        tag = " rt" if rt else (" ng" if ng else "")
        try:
            run_case(f"t=2^{lt} tc={tc}{tag}", lt, tc, rt, ng)
        except Exception as e:
            print(f"t=2^{lt} tc={tc}{tag}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
