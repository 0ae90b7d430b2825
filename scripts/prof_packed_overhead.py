"""Decompose the lane-packed commit's non-hash overhead.

ab_packed_merkle measured packed@512 = 41.4 ms vs ~31 ms of kernel-rate
hash work at 2^20 — ~10 ms unexplained. Two candidate sinks:
  (a) fixed per-lax.map-step cost (255 sequential grid-free pallas steps
      per commit at tile=512);
  (b) the XLA inter-layer machinery (strided row slices + 40-lane-offset
      concats of the regroup, carry stacking, XLA tail).

Probe 1 isolates (a): the SAME 2^16-state standalone batch through tiles
512/256/128 — data constant, step count 16/32/64, so the slope of time
vs steps IS the fixed per-step cost u (tile<=512 keeps scoped VMEM legal;
larger tiles OOM the helper's hard 16 MB cap).

Probe 2 isolates (b): the full 2^20 packed commit with the dense kernel
replaced by an IDENTITY kernel of identical block signature — everything
runs except the hashing itself (the XLA tail still hashes; ~0.2 ms).

    python scripts/prof_packed_overhead.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from twenty_first_tpu.math import gf
from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.ops import tip5_packed, tip5_pallas


def timed(fn, args, k_lo=1, k_hi=9, reps=5):
    for k in (k_lo, k_hi):
        int(fn(*args, k))
    ds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(fn(*args, k_lo))
        tl = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(fn(*args, k_hi))
        th = time.perf_counter() - t0
        ds.append((th - tl) / (k_hi - k_lo))
    ds.sort()
    return ds[len(ds) // 2]


def main():
    rng = np.random.default_rng(7)

    # ---- probe 1: per-step cost ------------------------------------------
    b = 1 << 16
    states = rng.integers(0, P, size=(b, 16), dtype=np.uint64)
    slo, shi = (jnp.asarray(v) for v in gf.to_limbs(states))

    for tile in (512, 256, 128):
        @jax.jit
        def chain(a, bb, k, _t=tile):
            ilo, ihi = tip5_packed.pack_states(a, bb)

            def body(i, st):
                return tip5_pallas.permute_packed(st[0], st[1], tile=_t)
            olo, ohi = jax.lax.fori_loop(0, k, body, (ilo, ihi))
            return jnp.sum(olo, dtype=jnp.uint64) + \
                jnp.sum(ohi, dtype=jnp.uint64)

        t0 = time.perf_counter()
        int(chain(slo, shi, 1))
        print(f"compile tile={tile}: {time.perf_counter()-t0:.1f}s",
              flush=True)
        t = timed(chain, (slo, shi))
        steps = (b // 8) // tile
        print(f"tile={tile:4d}: {t*1e3:7.3f} ms/batch  ({steps} steps)",
              flush=True)

    # ---- probe 2: structural overhead (identity kernel) ------------------
    def _ident_kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref,
                      out_lo_ref, out_hi_ref):
        out_lo_ref[...] = lo_ref[...] ^ rc_lo_ref[0]
        out_hi_ref[...] = hi_ref[...] ^ rc_hi_ref[0]

    real_kernel = tip5_pallas._dense_kernel
    n = 1 << 20
    vals = rng.integers(0, P, size=(n, 5), dtype=np.uint64)
    llo, lhi = (jnp.asarray(v) for v in gf.to_limbs(vals))

    import os
    cfgs = [("ident", _ident_kernel), ("real", real_kernel)]
    if os.environ.get("PROBE_ONLY_REAL") == "1":
        cfgs = [("real", real_kernel)]
    tl = int(os.environ.get("PROBE_TILE", "0"))
    lv = int(os.environ.get("PROBE_LEVELS", "0"))
    if tl:
        tip5_packed.TILE = tl
    if lv:
        tip5_packed.MULTI_LEVELS = lv
    print(f"commit config: TILE={tip5_packed.TILE} "
          f"MULTI_LEVELS={tip5_packed.MULTI_LEVELS}", flush=True)
    for name, kern in cfgs:
        tip5_pallas._dense_kernel = kern

        @jax.jit
        def commit_chain(a, bb, k, _n=name):
            def body(i, st):
                lo, hi = st
                r = tip5_packed.reduce_layers_packed((lo, hi), 20)
                lo = (lo ^ jnp.broadcast_to(r[0], lo.shape)) \
                    % np.uint32(0x7FFFFFFF)
                return lo, hi
            lo, hi = jax.lax.fori_loop(0, k, body, (a, bb))
            return jnp.sum(lo, dtype=jnp.uint64) + \
                jnp.sum(hi, dtype=jnp.uint64)

        t0 = time.perf_counter()
        int(commit_chain(llo, lhi, 1))
        print(f"compile commit[{name}]: {time.perf_counter()-t0:.1f}s",
              flush=True)
        t = timed(commit_chain, (llo, lhi), 1, 4)
        print(f"commit[{name}]: {t*1e3:7.2f} ms", flush=True)
    tip5_pallas._dense_kernel = real_kernel


if __name__ == "__main__":
    main()
