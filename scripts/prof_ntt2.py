"""Measure VMEM-slab formulations of the four-step local DFT-4096."""

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


def main():
    which = sys.argv[1:] or ["n20", "slab", "full_slab"]
    print("device:", jax.devices()[0])

    if "n20" in which:
        vals = rng.integers(0, P, size=1 << 20, dtype=np.uint64)
        LO = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
        HI = jnp.asarray((vals >> 32).astype(np.uint32))
        perm, tw = ntt._device_tables(20, False)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run20(lo, hi, k):
            for _ in range(k):
                lo, hi = ntt._ntt_core((lo, hi), perm, tw, 20)
            return checksum(lo, hi)

        t = timed(run20, (LO, HI))
        print(f"direct NTT 2^20: {t*1e3:.3f} ms ({(1<<20)/t/1e9:.2f} G/s)")

    vals = rng.integers(0, P, size=1 << 24, dtype=np.uint64)
    LO = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32).reshape(4096, 4096))
    HI = jnp.asarray((vals >> 32).astype(np.uint32).reshape(4096, 4096))
    perm, tw = ntt._device_tables(12, False)

    if "slab" in which:
        for slab in (128, 256, 512):
            nslab = 4096 // slab

            @functools.partial(jax.jit, static_argnames=("k",))
            def run_slab(lo, hi, k, slab=slab, nslab=nslab):
                for _ in range(k):
                    slo = lo.reshape(4096, nslab, slab).transpose(1, 0, 2)
                    shi = hi.reshape(4096, nslab, slab).transpose(1, 0, 2)
                    out = jax.lax.map(
                        lambda s: ntt._ntt_core_ax2(s, perm, tw, 12),
                        (slo, shi))
                    lo = out[0].transpose(1, 0, 2).reshape(4096, 4096)
                    hi = out[1].transpose(1, 0, 2).reshape(4096, 4096)
                return checksum(lo, hi)

            t0 = time.time()
            t = timed(run_slab, (LO, HI))
            print(f"local DFT-4096 ax2 lax.map slab={slab}: {t*1e3:.3f} ms "
                  f"[wall {time.time()-t0:.0f}s]")

    if "full_slab" in which:
        # full four-step with slab-mapped locals, diag fused into slab 2
        diag = ntt._four_step_diag_device(24, False)

        def slab_map(lo, hi, slab):
            nslab = 4096 // slab
            slo = lo.reshape(4096, nslab, slab).transpose(1, 0, 2)
            shi = hi.reshape(4096, nslab, slab).transpose(1, 0, 2)
            out = jax.lax.map(
                lambda s: ntt._ntt_core_ax2(s, perm, tw, 12), (slo, shi))
            return (out[0].transpose(1, 0, 2).reshape(4096, 4096),
                    out[1].transpose(1, 0, 2).reshape(4096, 4096))

        @functools.partial(jax.jit, static_argnames=("k", "slab"))
        def run_full(lo, hi, dlo, dhi, k, slab=256):
            for _ in range(k):
                y = slab_map(lo, hi, slab)
                y = gf.mul(y, (dlo, dhi))
                ylo = jnp.swapaxes(y[0], -1, -2)
                yhi = jnp.swapaxes(y[1], -1, -2)
                lo, hi = slab_map(ylo, yhi, slab)
            return checksum(lo, hi)

        for slab in (256, 512):
            t0 = time.time()
            t = timed(functools.partial(run_full, slab=slab),
                      (LO, HI, diag[0], diag[1]))
            print(f"full four-step slab={slab}: {t*1e3:.3f} ms "
                  f"({(1<<24)/t/1e9:.2f} G/s) [wall {time.time()-t0:.0f}s]")


main()
