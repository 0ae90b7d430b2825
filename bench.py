"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: Goldilocks NTT 2^24 throughput (elements/s) on one chip — the
BASELINE.json north-star per-chip metric. Extras: Tip5 permutation
throughput (hashes/s), Merkle 2^20-leaf commit time, LDE+commit pipeline.

The reference publishes no absolute numbers (BASELINE.md), so vs_baseline
is reported against a locally-measured CPU oracle where meaningful, else 1.0.
"""

import json
import sys
import time

import numpy as np


def _bench(fn, *args, warmup=2, iters=5):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax

    from twenty_first_tpu.math import gf, ntt
    from twenty_first_tpu.tip5 import permutation as tip5_dev

    rng = np.random.default_rng(0)
    p = (1 << 64) - (1 << 32) + 1
    extras = {}

    # --- headline: NTT 2^24 ------------------------------------------------
    log_n = 24
    n = 1 << log_n
    data = rng.integers(0, p, size=n, dtype=np.uint64)
    lo, hi = gf.to_limbs(data)
    lo, hi = jax.device_put(lo), jax.device_put(hi)
    perm, twiddles = ntt._device_twiddles(log_n, False)
    run = ntt._jitted_ntt(log_n, False)
    t = _bench(run, lo, hi, perm, twiddles)
    ntt_elems_per_s = n / t
    extras["ntt_2^24_s"] = t

    # --- Tip5 permutation throughput --------------------------------------
    batch = 1 << 19
    states = rng.integers(0, p, size=(batch, 16), dtype=np.uint64)
    slo, shi = (jax.device_put(v) for v in gf.to_limbs(states))
    perm = jax.jit(tip5_dev.permutation)
    t_perm = _bench(lambda a, b: perm((a, b)), slo, shi)
    extras["tip5_permutations_per_s"] = batch / t_perm

    # --- Merkle 2^20 commit ------------------------------------------------
    from twenty_first_tpu.parallel.dist_merkle import _reduce_layers

    log_leafs = 20
    leafs = rng.integers(0, p, size=(1 << log_leafs, 5), dtype=np.uint64)
    llo, lhi = (jax.device_put(v) for v in gf.to_limbs(leafs))
    commit = jax.jit(lambda a, b: _reduce_layers((a, b), log_leafs))
    t_merkle = _bench(lambda a, b: commit(a, b), llo, lhi, warmup=1, iters=3)
    extras["merkle_2^20_commit_s"] = t_merkle
    extras["merkle_2^20_hashes_per_s"] = ((1 << log_leafs) - 1) / t_merkle

    extras["device"] = str(jax.devices()[0])

    result = {
        "metric": "ntt_2^24_goldilocks_elems_per_s_per_chip",
        "value": ntt_elems_per_s,
        "unit": "elements/s",
        "vs_baseline": 1.0,
        "extras": extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
