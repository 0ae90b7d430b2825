import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from twenty_first_tpu.math import gf

P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(0)
N = 1 << 24
vals = rng.integers(0, P, size=N, dtype=np.uint64)
n1 = 1 << 12
LO = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)).reshape(n1, n1)
HI = jnp.asarray((vals >> 32).astype(np.uint32)).reshape(n1, n1)

def timed(fn, args, k_lo=1, k_hi=5, reps=3):
    for k in (k_lo, k_hi): int(fn(*args, k=k))
    lows, highs = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); int(fn(*args, k=k_lo)); lows.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); int(fn(*args, k=k_hi)); highs.append(time.perf_counter()-t0)
    return (min(highs)-min(lows))/(k_hi-k_lo)

def checksum(lo, hi):
    return (jnp.sum(lo.astype(jnp.uint64)) + jnp.sum(hi.astype(jnp.uint64))).astype(jnp.uint64)

M = 64  # mid-size layer granularity

def layer_interleave(lo, hi):
    # (n, w) -> butterfly-shaped slices + interleaving stack (stride M)
    sh = (n1 // (4 * M), 4, M, n1)
    lo4 = lo.reshape(sh); hi4 = hi.reshape(sh)
    parts = [(lo4[:, q], hi4[:, q]) for q in range(4)]
    y = [gf.add_lazy(parts[0], parts[1]), gf.sub_lazy(parts[0], parts[1]),
         gf.add_lazy(parts[2], parts[3]), gf.sub_lazy(parts[2], parts[3])]
    olo = jnp.stack([p[0] for p in y], axis=1).reshape(n1, n1)
    ohi = jnp.stack([p[1] for p in y], axis=1).reshape(n1, n1)
    return olo, ohi

def layer_block(lo, hi):
    # same slices, but outputs concatenated contiguously (quarters)
    sh = (n1 // (4 * M), 4, M, n1)
    lo4 = lo.reshape(sh); hi4 = hi.reshape(sh)
    parts = [(lo4[:, q], hi4[:, q]) for q in range(4)]
    y = [gf.add_lazy(parts[0], parts[1]), gf.sub_lazy(parts[0], parts[1]),
         gf.add_lazy(parts[2], parts[3]), gf.sub_lazy(parts[2], parts[3])]
    olo = jnp.concatenate([p[0] for p in y], axis=0).reshape(n1, n1)
    ohi = jnp.concatenate([p[1] for p in y], axis=0).reshape(n1, n1)
    return olo, ohi

def layer_elemwise(lo, hi):
    # pure elementwise same ALU, no reorder (lower bound)
    a = gf.add_lazy((lo, hi), (hi, lo))
    return a

def make(fn):
    @functools.partial(jax.jit, static_argnames=("k",))
    def run(lo, hi, k):
        for _ in range(k):
            lo, hi = fn(lo, hi)
        return checksum(lo, hi)
    return run

print("device:", jax.devices()[0], flush=True)
for name, fn in [("interleave-stack layer", layer_interleave),
                 ("block-concat layer    ", layer_block),
                 ("elementwise-only layer", layer_elemwise)]:
    t = timed(make(fn), (LO, HI))
    print(f"{name}: {t*1e3:6.3f} ms", flush=True)
