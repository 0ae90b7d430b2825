"""Interleaved A/B on the Tip5 batched permutation: u32 muls vs packed-u64
muls (gf dispatch flag), wide k-spread chained timing."""
import sys, os
sys.path.insert(0, "/root/repo")
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from twenty_first_tpu.math import gf

P = (1 << 64) - (1 << 32) + 1
batch = 1 << 16
rng = np.random.default_rng(0)
states = rng.integers(0, P, size=(batch, 16), dtype=np.uint64)
slo, shi = (jax.device_put(v) for v in gf.to_limbs(states))


def build(w64):
    import twenty_first_tpu.math.gf as gfmod
    gfmod._MUL_W64 = w64
    from twenty_first_tpu.tip5 import permutation as tip5_dev

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(a, b, k):
        def body(i, st):
            return tip5_dev.permutation(st)
        o = jax.lax.fori_loop(0, k, body, (a, b))
        return jnp.sum(o[0], dtype=jnp.uint32) + jnp.sum(o[1], dtype=jnp.uint32)

    for k in (2, 18):
        int(run(slo, shi, k=k))
    gfmod._MUL_W64 = True
    return run


variants = {"u32": build(False), "w64": build(True)}
results = {k: [] for k in variants}
for rnd in range(8):
    for name, run in variants.items():
        t0 = time.perf_counter(); int(run(slo, shi, k=2)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(slo, shi, k=18)); t2 = time.perf_counter() - t0
        results[name].append((t2 - t1) / 16)

for name, vals in results.items():
    vals.sort()
    best, med = vals[0], vals[len(vals) // 2]
    print(f"tip5 {name}: min {best*1e3:.3f} ms/perm-batch  med {med*1e3:.3f} "
          f"-> {batch/med/1e6:.1f}M perms/s (med), {batch/best/1e6:.1f}M (min)",
          flush=True)
