import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from twenty_first_tpu.math import ntt, gf

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

print("device:", jax.devices()[0], flush=True)

# full unslabbed pass: gather + stages, full 4096-lane width
@functools.partial(jax.jit, static_argnames=("k",))
def run_noslab(lo, hi, k):
    for _ in range(k):
        lo, hi = ntt._ntt_core_ax2((lo, hi), 12, False)
    return checksum(lo, hi)

# unslabbed, stages only (no bit-rev gather)
@functools.partial(jax.jit, static_argnames=("k",))
def run_noslab_nogather(lo, hi, k):
    for _ in range(k):
        lo, hi = gf.canon(ntt._ntt_stages_ax2((lo, hi), 12, False))
    return checksum(lo, hi)

# slabbed (current)
@functools.partial(jax.jit, static_argnames=("k",))
def run_slab(lo, hi, k):
    for _ in range(k):
        lo, hi = ntt._local_pass((lo, hi), 12, False)
    return checksum(lo, hi)

for name, fn in [("unslabbed pass (gather+stages)", run_noslab),
                 ("unslabbed stages only         ", run_noslab_nogather),
                 ("slab-mapped pass (current)    ", run_slab)]:
    t = timed(fn, (LO, HI))
    print(f"{name}: {t*1e3:6.2f} ms", flush=True)
