"""The fused A/B the lane-dense Tip5 decision rule requires.

DESIGN §5 / ops/__init__.py froze the lane-dense Pallas Tip5 kernel with
an explicit promotion rule: promote iff it beats the XLA-fused path
*inside a 2^20 Merkle commit* (its (8, 16)-packed layout needs boundary
transposes into every fused neighbor, so standalone wins may not
survive composition). The tunnel's Mosaic-AOT regression blocked that
measurement for most of round 4; this script runs it when the tunnel
cooperates.

Methodology: interleaved k-chains in one process, median of per-round
differences (the only estimator stable on this shared tunnel — bench.py
docstring). Chains carry the root forward into the next round's leaf
planes so nothing is dead-code-eliminated.

    python scripts/ab_dense_merkle.py [log_n] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from twenty_first_tpu.math import gf
from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.ops import tip5_pallas
from twenty_first_tpu.tip5 import permutation as tip5_dev
from twenty_first_tpu.tip5.constants import RATE, STATE_SIZE


def _pair_states(lo, hi):
    """(b, 5) digest planes -> hash_pair input states (b/2, 16)."""
    b = lo.shape[0] // 2
    plo = lo.reshape(b, 10)
    phi = hi.reshape(b, 10)
    cap_lo = jnp.ones((b, STATE_SIZE - RATE), jnp.uint32)
    cap_hi = jnp.zeros((b, STATE_SIZE - RATE), jnp.uint32)
    return (jnp.concatenate([plo, cap_lo], 1),
            jnp.concatenate([phi, cap_hi], 1))


def _root_xla(lo, hi, layers):
    for _ in range(layers):
        slo, shi = _pair_states(lo, hi)
        out = tip5_dev.permutation((slo, shi))
        lo, hi = out[0][:, :5], out[1][:, :5]
    return lo, hi


def _root_dense(lo, hi, layers, tile):
    # Swap only the bulk layers (b >= 8*tile states — 99.6% of the hash
    # work at 2^20) to the dense kernel; the tiny top layers stay XLA.
    # One tile size = one Mosaic lowering reused across layers.
    for _ in range(layers):
        slo, shi = _pair_states(lo, hi)
        b = slo.shape[0]
        if b % (8 * tile) == 0:
            out = tip5_pallas.permutation_dense_nogrid(slo, shi, tile=tile)
        else:
            out = tip5_dev.permutation((slo, shi))
        lo, hi = out[0][:, :5], out[1][:, :5]
    return lo, hi


def _chain(root_fn, layers, **kw):
    def run(lo, hi, k):
        for _ in range(k):
            rlo, rhi = root_fn(lo, hi, layers, **kw)
            # feed the root back so rounds serialize (no DCE, no overlap)
            lo = lo ^ jnp.broadcast_to(rlo, lo.shape)
            hi = hi ^ jnp.broadcast_to(rhi * jnp.uint32(0), hi.shape)
            lo = lo % np.uint32(0x7FFFFFFF)  # keep values valid-ish; only
            hi = hi % np.uint32(0x7FFFFFFE)  # timing matters, perm accepts lazy
        return jnp.sum(lo, dtype=jnp.uint64) + jnp.sum(hi, dtype=jnp.uint64)

    return run


def main(log_n=20, reps=5):
    rng = np.random.default_rng(0xAB)
    n = 1 << log_n
    vals = rng.integers(0, P, size=(n, 5), dtype=np.uint64)
    lo, hi = gf.to_limbs(vals)
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)

    k_lo, k_hi = 1, 4
    fns = {}
    for name, rf, kw in (("xla", _root_xla, {}),
                         ("dense", _root_dense, {"tile": 512})):
        f = {}
        for k in (k_lo, k_hi):
            f[k] = jax.jit(lambda a, b, _rf=rf, _k=k, _kw=kw:
                           _chain(_rf, log_n, **_kw)(a, b, _k))
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
