"""Reconcile the Tip5 batch-permutation throughput number (VERDICT r2 weak
#1): BENCH_r02 said 23.9M perms/s (min-of-diffs, k 1..17), DESIGN.md §4
says ~36M (interleaved medians, k 2..18, scripts/tip5_w64_ab.py). Run BOTH
estimators interleaved in one process on real hardware, plus the 2^20
Merkle commit chain, and decompose commit time into permutation count x
measured rate.

Run on the TPU (no JAX_PLATFORMS override).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import numpy as np
import jax, jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from twenty_first_tpu.math import gf
from twenty_first_tpu.tip5 import permutation as tip5_dev
from twenty_first_tpu.parallel import dist_merkle

P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(0)
batch = 1 << 16
states = rng.integers(0, P, size=(batch, 16), dtype=np.uint64)
slo, shi = (jax.device_put(v) for v in gf.to_limbs(states))

print("device:", jax.devices()[0], flush=True)


@functools.partial(jax.jit, static_argnames=("k",))
def perm_chain(a, b, k):
    def body(i, st):
        return tip5_dev.permutation(st)
    o = jax.lax.fori_loop(0, k, body, (a, b))
    return jnp.sum(o[0], dtype=jnp.uint32) + jnp.sum(o[1], dtype=jnp.uint32)


leafs = rng.integers(0, P, size=(1 << 20, 5), dtype=np.uint64)
llo, lhi = (jax.device_put(v) for v in gf.to_limbs(leafs))


@functools.partial(jax.jit, static_argnames=("k",))
def merkle_chain(a, b, k):
    def body(i, acc):
        r = dist_merkle._reduce_layers((a ^ acc[0], b), 20)
        return (acc[0] ^ jnp.sum(r[0], dtype=jnp.uint32),
                acc[1] + jnp.sum(r[1], dtype=jnp.uint32))
    o = jax.lax.fori_loop(0, k, body,
                          (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32)))
    return o[0] + o[1]


# compile all variants
for k in (1, 2, 17, 18):
    int(perm_chain(slo, shi, k=k))
for k in (1, 5):
    int(merkle_chain(llo, lhi, k=k))

rounds = 8
res = {"perm_218": [], "perm_117": [], "merkle": []}
for r in range(rounds):
    t0 = time.perf_counter(); int(perm_chain(slo, shi, k=2)); tl = time.perf_counter() - t0
    t0 = time.perf_counter(); int(perm_chain(slo, shi, k=18)); th = time.perf_counter() - t0
    res["perm_218"].append((th - tl) / 16)
    t0 = time.perf_counter(); int(perm_chain(slo, shi, k=1)); tl = time.perf_counter() - t0
    t0 = time.perf_counter(); int(perm_chain(slo, shi, k=17)); th = time.perf_counter() - t0
    res["perm_117"].append((th - tl) / 16)
    t0 = time.perf_counter(); int(merkle_chain(llo, lhi, k=1)); tl = time.perf_counter() - t0
    t0 = time.perf_counter(); int(merkle_chain(llo, lhi, k=5)); th = time.perf_counter() - t0
    res["merkle"].append((th - tl) / 4)

for name, vals in res.items():
    vals.sort()
    mn, med = vals[0], vals[len(vals) // 2]
    if name.startswith("perm"):
        print(f"{name}: med {med*1e3:.3f} ms -> {batch/med/1e6:.1f}M perms/s"
              f"  (min {mn*1e3:.3f} -> {batch/mn/1e6:.1f}M)", flush=True)
    else:
        perms = (1 << 20) - 1
        print(f"merkle 2^20 commit: med {med*1e3:.2f} ms  min {mn*1e3:.2f}"
              f" -> implied {perms/med/1e6:.1f}M perms/s in-graph", flush=True)

med_perm = sorted(res["perm_218"])[rounds // 2]
med_merkle = sorted(res["merkle"])[rounds // 2]
print(f"decomposition: commit {med_merkle*1e3:.2f} ms vs "
      f"{(1 << 20) - 1} perms x {med_perm/batch*1e9:.2f} ns/perm = "
      f"{((1 << 20) - 1) * med_perm / batch * 1e3:.2f} ms "
      f"(overhead {med_merkle / (((1 << 20) - 1) * med_perm / batch) - 1:+.1%})",
      flush=True)
