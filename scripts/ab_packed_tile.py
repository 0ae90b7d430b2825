"""Tile sweep for the lane-packed Merkle commit (follow-up to
scripts/ab_packed_merkle.py, which measured packed@512 = 41.4 ms vs XLA
45.0 ms at 2^20).

Hypothesis: the remaining gap to the kernel's standalone rate (~31 ms of
hash work) is per-lax.map-step dispatch overhead — tile=512 issues
128+64+...+1 = 255 sequential grid-free pallas steps per commit; tile=2048
issues 63. Sweep tile in {512, 1024, 2048}.

Chains use a fori_loop with DYNAMIC k so each variant compiles ONE
executable (the 40 MB digest-plane carry copy a while-loop adds is ~0.1 ms
against a ~40 ms body — irrelevant here, unlike the NTT headline).

    python scripts/ab_packed_tile.py [log_n] [reps] [tiles...]
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


def _chain(root_fn, layers):
    def run(lo, hi, k):
        def body(i, carry):
            lo, hi = carry
            rlo, rhi = root_fn(lo, hi, layers)
            lo = (lo ^ jnp.broadcast_to(rlo, lo.shape)) % np.uint32(0x7FFFFFFF)
            hi = (hi ^ jnp.broadcast_to(rhi * jnp.uint32(0), hi.shape)) \
                % np.uint32(0x7FFFFFFE)
            return lo, hi
        lo, hi = jax.lax.fori_loop(0, k, body, (lo, hi))
        return jnp.sum(lo, dtype=jnp.uint64) + jnp.sum(hi, dtype=jnp.uint64)

    return jax.jit(run)


def main(log_n=20, reps=5, tiles=(512, 1024, 2048)):
    rng = np.random.default_rng(0xAB5)
    n = 1 << log_n
    vals = rng.integers(0, P, size=(n, 5), dtype=np.uint64)
    lo, hi = gf.to_limbs(vals)
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)

    variants = {"xla": lambda a, b, L: tip5_packed._xla_reduce(a, b, L)}
    for t in tiles:
        variants[f"packed{t}"] = (
            lambda a, b, L, _t=t: tip5_packed.reduce_layers_packed(
                (a, b), L, tile=_t))

    k_lo, k_hi = 1, 4
    fns, root0 = {}, None
    for name, rf in variants.items():
        f = _chain(rf, log_n)
        t0 = time.perf_counter()
        r = int(f(lo, hi, 1))
        print(f"compile+warm {name}: {time.perf_counter()-t0:.1f}s "
              f"checksum={r}", flush=True)
        if root0 is None:
            root0 = r
        else:
            assert r == root0, f"{name} checksum mismatch: {r} != {root0}"
        fns[name] = f

    diffs = {name: [] for name in fns}
    for rr in range(reps):
        for name, f in fns.items():
            t0 = time.perf_counter()
            int(f(lo, hi, k_lo))
            tl = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(f(lo, hi, k_hi))
            th = time.perf_counter() - t0
            d = (th - tl) / (k_hi - k_lo)
            diffs[name].append(d)
            print(f"round {rr} {name}: {d*1e3:.2f} ms/commit", flush=True)
    for name, ds in diffs.items():
        ds.sort()
        print(f"{name}: median {ds[len(ds)//2]*1e3:.2f} ms per 2^{log_n} "
              f"commit")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20,
         int(sys.argv[2]) if len(sys.argv) > 2 else 5,
         tuple(int(t) for t in sys.argv[3:]) or (512, 1024, 2048))
