"""Decompose the 2^22-row LDE+commit pipeline (VERDICT r2 item 7): where
does trace_lde_commit's time go vs the sum of its parts? Stages timed as
separate chained graphs, interleaved medians:

  a. iNTT(2^20 x 8) + scale + pad + NTT(2^22 x 8)   (the LDE half)
  b. leaf hashing: one permutation per row, 2^22 rows (incl. the
     transpose/concat state assembly)
  c. Merkle reduction over 2^22 leaf digests
  d. the full fused pipeline

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
from twenty_first_tpu.math import ntt as ntt_mod
from twenty_first_tpu.math import gf_numpy as gfn
from twenty_first_tpu.tip5 import permutation as tip5_dev
from twenty_first_tpu.tip5.constants import STATE_SIZE
from twenty_first_tpu.parallel import dist_merkle
from twenty_first_tpu.parallel.pipeline import trace_lde_commit
from twenty_first_tpu.math.b_field_element import GENERATOR

P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(0)
print("device:", jax.devices()[0], flush=True)

w, n = 8, 1 << 20
big_n = n * 4
tr = rng.integers(0, P, size=(w, n), dtype=np.uint64)
tlo, thi = (jax.device_put(v) for v in gf.to_limbs(tr))

pw = gfn.powers(GENERATOR, n)
pw_lo = jnp.asarray((pw & np.uint64(0xFFFF_FFFF)).astype(np.uint32))
pw_hi = jnp.asarray((pw >> np.uint64(32)).astype(np.uint32))

evals_host = rng.integers(0, P, size=(w, big_n), dtype=np.uint64)
elo, ehi = (jax.device_put(v) for v in gf.to_limbs(evals_host))
leafs_host = rng.integers(0, P, size=(big_n, 5), dtype=np.uint64)
llo, lhi = (jax.device_put(v) for v in gf.to_limbs(leafs_host))


from twenty_first_tpu.parallel.pipeline import lde_commit_diags

INV_D, FWD_D = lde_commit_diags(n, 4)
# diag tables ride as chain ARGUMENTS (compile-payload rule)
DIAG_ARGS = (INV_D[0], INV_D[1], FWD_D[0], FWD_D[1])


def lde_half(lo, hi, il, ih, fl, fh):
    coeff = ntt_mod.ntt_limbs_traceable((lo, hi), inverse=True,
                                        four_step_diag=(il, ih))
    scaled = gf.mul(coeff, (pw_lo[None, :], pw_hi[None, :]))
    pad = ((0, 0), (0, big_n - n))
    padded = (jnp.pad(scaled[0], pad), jnp.pad(scaled[1], pad))
    return ntt_mod.ntt_limbs_traceable(padded, four_step_diag=(fl, fh))


def leaf_half(lo, hi):
    rows_lo = jnp.transpose(lo)
    rows_hi = jnp.transpose(hi)
    state_lo = jnp.concatenate(
        [rows_lo, jnp.zeros((big_n, 10 - w), jnp.uint32),
         jnp.ones((big_n, STATE_SIZE - 10), jnp.uint32)], axis=1)
    state_hi = jnp.concatenate(
        [rows_hi, jnp.zeros((big_n, STATE_SIZE - w), jnp.uint32)], axis=1)
    perm = tip5_dev.permutation((state_lo, state_hi))
    return perm[0][:, :5], perm[1][:, :5]


STAGES = {
    "a_lde": (lde_half, (tlo, thi) + DIAG_ARGS),
    "b_leafhash": (leaf_half, (elo, ehi)),
    "c_merkle": (lambda lo, hi: dist_merkle._reduce_layers((lo, hi), 22),
                 (llo, lhi)),
    "d_full": (lambda lo, hi, il, ih, fl, fh: trace_lde_commit(
        (lo, hi), expansion=4, ntt_diags=((il, ih), (fl, fh))),
        (tlo, thi) + DIAG_ARGS),
}


def chain(fn):
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(a, b, *extra, k):
        def body(i, acc):
            r = fn(a ^ acc[0], b, *extra)
            return (acc[0] ^ jnp.sum(r[0], dtype=jnp.uint32),
                    acc[1] + jnp.sum(r[1], dtype=jnp.uint32))
        o = jax.lax.fori_loop(
            0, k, body, (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32)))
        return o[0] + o[1]
    return run

chains = {name: (chain(fn), args) for name, (fn, args) in STAGES.items()}
for name, (run, args) in chains.items():
    for k in (1, 3):
        int(run(*args, k=k))
    print(f"{name}: compiled", flush=True)

res = {name: [] for name in chains}
for r in range(8):
    for name, (run, args) in chains.items():
        t0 = time.perf_counter(); int(run(*args, k=1)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(*args, k=3)); th = time.perf_counter() - t0
        res[name].append((th - tl) / 2)

total_parts = 0.0
for name, vals in res.items():
    vals.sort()
    med = vals[len(vals) // 2]
    if name != "d_full":
        total_parts += med
    print(f"{name}: med {med*1e3:8.2f} ms  (min {vals[0]*1e3:8.2f})", flush=True)
full = sorted(res["d_full"])[4]
print(f"sum of parts {total_parts*1e3:.2f} ms vs fused {full*1e3:.2f} ms "
      f"({full/total_parts:+.2f}x)", flush=True)
