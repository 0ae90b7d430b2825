"""Drill into prof_lde_decomp's a_lde stage (226 ms at (8, 2^22) where
~25 ms of NTT should suffice): time the batched forward NTT, the batched
iNTT, and the scale+pad glue separately, plus a column-looped variant.

Run on the TPU.
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
from twenty_first_tpu.math.b_field_element import GENERATOR

P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(0)
print("device:", jax.devices()[0], flush=True)

w, n = 8, 1 << 20
big_n = n * 4
small = rng.integers(0, P, size=(w, n), dtype=np.uint64)
big = rng.integers(0, P, size=(w, big_n), dtype=np.uint64)
slo, shi = (jax.device_put(v) for v in gf.to_limbs(small))
blo, bhi = (jax.device_put(v) for v in gf.to_limbs(big))

pw = gfn.powers(GENERATOR, n)
pw_lo = jnp.asarray((pw & np.uint64(0xFFFF_FFFF)).astype(np.uint32))
pw_hi = jnp.asarray((pw >> np.uint64(32)).astype(np.uint32))


def fwd_big(lo, hi):
    return ntt_mod.ntt_limbs_traceable((lo, hi))


def inv_small(lo, hi):
    return ntt_mod.ntt_limbs_traceable((lo, hi), inverse=True)


def scale_pad(lo, hi):
    scaled = gf.mul((lo, hi), (pw_lo[None, :], pw_hi[None, :]))
    pad = ((0, 0), (0, big_n - n))
    return jnp.pad(scaled[0], pad), jnp.pad(scaled[1], pad)


STAGES = {
    "fwd_8x2^22": (fwd_big, (blo, bhi)),
    "inv_8x2^20": (inv_small, (slo, shi)),
    "scale_pad": (scale_pad, (slo, shi)),
}


def chain(fn):
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(a, b, k):
        def body(i, acc):
            r = fn(a ^ acc[0], b)
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

for name, vals in res.items():
    vals.sort()
    print(f"{name}: med {vals[4]*1e3:8.2f} ms  (min {vals[0]*1e3:8.2f})",
          flush=True)
