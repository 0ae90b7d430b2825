import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from twenty_first_tpu.math import ntt, gf

P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(0)
LOG_N = 24
N = 1 << LOG_N
vals = rng.integers(0, P, size=N, dtype=np.uint64)

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
LOG_T = 12
n1 = 1 << LOG_T
lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)).reshape(n1, n1)
hi = jnp.asarray((vals >> 32).astype(np.uint32)).reshape(n1, n1)

# current pass2 (transpose_in slab path)
@functools.partial(jax.jit, static_argnames=("k",))
def run_cur(lo, hi, k):
    for _ in range(k):
        out = ntt._local_pass((lo, hi), LOG_T, False, transpose_in=True)
        lo, hi = out[0].reshape(n1, n1), out[1].reshape(n1, n1)
    return checksum(lo, hi)

# variant: explicit XLA transpose + bit-rev row gather fused, then stages-only pass
perm, _ = ntt._device_tables_mixed(LOG_T, False)

def stages_only_pass(x, log_len):
    def core(st, log_n, inverse):
        return gf.canon(ntt._ntt_stages_ax2(st, log_n, inverse))
    orig = ntt._ntt_core_ax2
    ntt._ntt_core_ax2 = core
    try:
        return ntt._local_pass(x, log_len, False)
    finally:
        ntt._ntt_core_ax2 = orig

@functools.partial(jax.jit, static_argnames=("k",))
def run_x(lo, hi, k):
    for _ in range(k):
        tl = jnp.take(jnp.swapaxes(lo, -1, -2), perm, axis=-2)
        th = jnp.take(jnp.swapaxes(hi, -1, -2), perm, axis=-2)
        lo, hi = stages_only_pass((tl, th), LOG_T)
    return checksum(lo, hi)

# variant: transpose only (no gather fusion), standard pass w/ in-slab gather
@functools.partial(jax.jit, static_argnames=("k",))
def run_t(lo, hi, k):
    for _ in range(k):
        tl = jnp.swapaxes(lo, -1, -2)
        th = jnp.swapaxes(hi, -1, -2)
        lo, hi = ntt._local_pass((tl, th), LOG_T, False)
    return checksum(lo, hi)

for name, fn in [("pass2 transpose_in (current)", run_cur),
                 ("pass2 = XLA transpose+gather, stages-only", run_x),
                 ("pass2 = XLA transpose, normal pass", run_t)]:
    t = timed(fn, (lo, hi))
    print(f"{name}: {t*1e3:6.2f} ms", flush=True)
