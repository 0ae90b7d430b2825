"""A/B: lane-PACKED fused Merkle commit (ops.tip5_packed) vs the XLA path.

Round 4's dense A/B (scripts/ab_dense_merkle.py) paid digest-plane <->
lane-packed transposes at EVERY layer and lost (51.2 vs 45.2 ms at 2^20).
The packed path keeps the whole commit in the strided (8,16) lane packing —
pairing is two 40-lane slices + a concat per layer — so this A/B decides
the round-5 verdict item #1 promotion rule: promote iff it beats the XLA
path inside a 2^20 Merkle commit.

Methodology (bench.py docstring): interleaved k-chains in one process,
median of per-round differences; roots fed back through the chain so
commits serialize and nothing is DCE'd. Roots of both arms are checked
EQUAL on hardware before any timing.

    python scripts/ab_packed_merkle.py [log_n] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from twenty_first_tpu.math import gf
from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.ops import tip5_packed


def _root_xla(lo, hi, layers):
    return tip5_packed._xla_reduce(lo, hi, layers)


def _root_packed(lo, hi, layers):
    return tip5_packed.reduce_layers_packed((lo, hi), layers)


def _chain(root_fn, layers):
    def run(lo, hi, k):
        for _ in range(k):
            rlo, rhi = root_fn(lo, hi, layers)
            lo = lo ^ jnp.broadcast_to(rlo, lo.shape)
            hi = hi ^ jnp.broadcast_to(rhi * jnp.uint32(0), hi.shape)
            lo = lo % np.uint32(0x7FFFFFFF)
            hi = hi % np.uint32(0x7FFFFFFE)
        return jnp.sum(lo, dtype=jnp.uint64) + jnp.sum(hi, dtype=jnp.uint64)

    return run


def main(log_n=20, reps=5):
    rng = np.random.default_rng(0xAB5)
    n = 1 << log_n
    vals = rng.integers(0, P, size=(n, 5), dtype=np.uint64)
    lo, hi = gf.to_limbs(vals)
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)

    # bit-exactness on hardware before any timing
    r_xla = jax.jit(lambda a, b: _root_xla(a, b, log_n))(lo, hi)
    r_pk = jax.jit(lambda a, b: _root_packed(a, b, log_n))(lo, hi)
    rx = np.asarray(r_xla[0]), np.asarray(r_xla[1])
    rp = np.asarray(r_pk[0]), np.asarray(r_pk[1])
    assert (rx[0] == rp[0]).all() and (rx[1] == rp[1]).all(), \
        f"ROOT MISMATCH: xla={rx} packed={rp}"
    print("roots match on hardware", flush=True)

    k_lo, k_hi = 1, 4
    fns = {}
    for name, rf in (("xla", _root_xla), ("packed", _root_packed)):
        f = {}
        for k in (k_lo, k_hi):
            f[k] = jax.jit(lambda a, b, _rf=rf, _k=k:
                           _chain(_rf, log_n)(a, b, _k))
            t0 = time.perf_counter()
            int(f[k](lo, hi))
            print(f"compile+warm {name} k={k}: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
        fns[name] = f

    diffs = {name: [] for name in fns}
    for r in range(reps):
        for name, f in fns.items():
            t0 = time.perf_counter()
            int(f[k_lo](lo, hi))
            tl = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(f[k_hi](lo, hi))
            th = time.perf_counter() - t0
            d = (th - tl) / (k_hi - k_lo)
            diffs[name].append(d)
            print(f"round {r} {name}: {d*1e3:.2f} ms/commit", flush=True)
    for name, ds in diffs.items():
        ds.sort()
        med = ds[len(ds) // 2]
        print(f"{name}: median {med*1e3:.2f} ms per 2^{log_n} commit")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20,
         int(sys.argv[2]) if len(sys.argv) > 2 else 5)
