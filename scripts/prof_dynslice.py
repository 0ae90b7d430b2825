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
SLAB = 128

def timed(fn, args, k_lo=1, k_hi=5, reps=3):
    for k in (k_lo, k_hi): int(fn(*args, k=k))
    lows, highs = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); int(fn(*args, k=k_lo)); lows.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); int(fn(*args, k=k_hi)); highs.append(time.perf_counter()-t0)
    return (min(highs)-min(lows))/(k_hi-k_lo)

def checksum(a, b):
    return (jnp.sum(a.astype(jnp.uint64)) + jnp.sum(b.astype(jnp.uint64))).astype(jnp.uint64)

print("device:", jax.devices()[0], flush=True)

def pass_dynslice(lo, hi, log_len):
    n = lo.shape[-2]
    w = lo.shape[-1]
    nslab = w // SLAB

    def body(carry, i):
        olo, ohi = carry
        sl = jax.lax.dynamic_slice(lo, (0, i * SLAB), (n, SLAB))
        sh = jax.lax.dynamic_slice(hi, (0, i * SLAB), (n, SLAB))
        rl, rh = ntt._ntt_core_ax2((sl, sh), log_len, False)
        olo = jax.lax.dynamic_update_slice(olo, rl, (0, i * SLAB))
        ohi = jax.lax.dynamic_update_slice(ohi, rh, (0, i * SLAB))
        return (olo, ohi), 0

    init = (jnp.zeros_like(lo), jnp.zeros_like(hi))
    (olo, ohi), _ = jax.lax.scan(body, init, jnp.arange(nslab))
    return olo, ohi

@functools.partial(jax.jit, static_argnames=("k",))
def run_dyn(lo, hi, k):
    for _ in range(k):
        lo, hi = pass_dynslice(lo, hi, 12)
    return checksum(lo, hi)

@functools.partial(jax.jit, static_argnames=("k",))
def run_map(lo, hi, k):
    for _ in range(k):
        lo, hi = ntt._local_pass((lo, hi), 12, False)
    return checksum(lo, hi)

want = jax.jit(lambda a, b: ntt._local_pass((a, b), 12, False))(LO, HI)
got = jax.jit(lambda a, b: pass_dynslice(a, b, 12))(LO, HI)
print("dynslice correct:", bool(jnp.array_equal(want[0], got[0]) & jnp.array_equal(want[1], got[1])), flush=True)
t = timed(run_map, (LO, HI)); print(f"lax.map pass:     {t*1e3:6.2f} ms", flush=True)
t = timed(run_dyn, (LO, HI)); print(f"dynslice pass:    {t*1e3:6.2f} ms", flush=True)
