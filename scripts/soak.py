"""Randomized differential soak: device path vs host-numpy oracle vs
scalar/native implementations, at randomized shapes around the dispatch
boundaries (four-step crossover, slab widths, ragged buckets). Opt-in
developer tool: python scripts/soak.py [seconds]."""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from twenty_first_tpu.math import gf, ntt
from twenty_first_tpu.math import gf_numpy as gfn
from twenty_first_tpu.math.b_field_element import P, BFieldElement
from twenty_first_tpu.tip5 import permutation as perm
from twenty_first_tpu.tip5.tip5 import Tip5
from twenty_first_tpu.math.b_field_element import bfe


def soak(budget_s: float = 120.0, seed: int | None = None) -> int:
    rng = np.random.default_rng(seed)
    t_end = time.monotonic() + budget_s
    rounds = 0
    while time.monotonic() < t_end:
        rounds += 1
        kind = rng.integers(0, 4)
        if kind == 0:  # field ops device vs numpy oracle, random shapes
            shape = tuple(int(s) for s in rng.integers(1, 40, size=rng.integers(1, 3)))
            a = rng.integers(0, P, shape, dtype=np.uint64)
            b = rng.integers(0, P, shape, dtype=np.uint64)
            la, lb = gf.to_limbs(a), gf.to_limbs(b)
            assert np.array_equal(gf.from_limbs(gf.mul(la, lb)), gfn.mul(a, b))
            assert np.array_equal(gf.from_limbs(gf.add(la, lb)), gfn.add(a, b))
            assert np.array_equal(gf.from_limbs(gf.sub(la, lb)), gfn.sub(a, b))
        elif kind == 1:  # NTT around the four-step crossover, batched
            log_n = int(rng.integers(1, 19))
            batch = int(rng.integers(1, 3))
            x = rng.integers(0, P, (batch, 1 << log_n), dtype=np.uint64)
            fwd = ntt.ntt_values(x)
            # oracle: host numpy radix-2
            want = ntt.ntt_host(x)
            assert np.array_equal(fwd, want), ("ntt", log_n)
            back = ntt.ntt_values(fwd, inverse=True)
            assert np.array_equal(back, x), ("intt", log_n)
        elif kind == 2:  # Tip5 batch vs scalar
            batch = int(rng.integers(1, 9))
            states = rng.integers(0, P, (batch, 16), dtype=np.uint64)
            got = np.asarray(perm.permutation_values(states))
            for r in range(batch):
                t = Tip5.init()
                t.state = [bfe(int(v)) for v in states[r]]
                t.permutation()
                assert [s.value() for s in t.state] == [int(v) for v in got[r]], r
        else:  # ragged hash_varlen batch vs scalar
            lens = [int(v) for v in rng.integers(0, 40, size=rng.integers(1, 6))]
            inputs = [[bfe(int(v)) for v in rng.integers(0, P, L, dtype=np.uint64)]
                      for L in lens]
            got = Tip5.hash_varlen_batch(inputs)
            for inp, d in zip(inputs, got):
                assert d == Tip5.hash_varlen(inp)
    return rounds


if __name__ == "__main__":
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    n = soak(budget)
    print(f"soak OK: {n} rounds, no divergence")
